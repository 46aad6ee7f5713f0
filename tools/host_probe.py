"""Quick host-health probe for bracketing measurements.

The sandbox host exhibits multi-minute degradation windows (documented
round 5: identical code 2-50x slower minutes apart). Every recorded
measurement should be bracketed by this probe so a bad window cannot
silently write the record.

Reports:
- single_s: one-process numpy sort+cumsum kernel wall time
- conc16_mean_s / inflation_16: the same kernel from 16 concurrent
  processes (mean) and its inflation vs single — a clean window shows
  < ~2.5x on this 32-vCPU box (memory-bus sharing only); degraded
  windows show 4-10x
- spark_floor_s (--spark): wall time of spark.range(1000).count() on a
  warm local[32] session — tens of ms clean, 0.3-1.2s degraded (r5)

    python tools/host_probe.py [--spark] [--json-out FILE]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _kernel(_):
    import numpy as np

    a = np.random.RandomState(0).rand(4_000_000)
    t0 = time.time()
    for _ in range(5):
        b = np.sort(a)
        b.cumsum().sum()
    return time.time() - t0


def probe(spark_floor: bool = False) -> dict:
    import numpy as np

    t1 = _kernel(0)
    with mp.Pool(16) as p:
        t16 = p.map(_kernel, range(16))
    out = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "single_s": round(t1, 3),
        "conc16_mean_s": round(float(np.mean(t16)), 3),
        "inflation_16": round(float(np.mean(t16)) / t1, 3),
    }
    if spark_floor:
        from ir_base_spark.session import get_spark

        spark = get_spark(app_name="host-probe", cores=32)
        spark.range(1000).count()  # warm
        t0 = time.time()
        spark.range(1000).count()
        out["spark_floor_s"] = round(time.time() - t0, 3)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spark", action="store_true")
    ap.add_argument("--json-out")
    args = ap.parse_args()
    res = probe(spark_floor=args.spark)
    line = json.dumps(res)
    print(line)
    if args.json_out:
        with open(args.json_out, "a") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
