"""Per-query timing harness (guide §1.4 noop-sink isolation).

    python bench_extra.py [name ...]       # default: all bench entries
    SPARK_GRAFT_REPEATS=N                  # repeat each, report min

Same methodology as bench.py (noop sink, same session config) but
runs only the named entries — for before/after isolation during
optimization.  bench.py stays the driver's frozen harness.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "2"))

    from ir_base_spark.session import get_spark

    spark = get_spark(app_name="bench-extra", cores=cpus, shuffle_partitions=cpus)

    import __spark_entry__ as E

    qs = E.queries()
    names = sys.argv[1:] or list(qs)
    out: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        ts = []
        for _ in range(repeats):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
        out[name] = ts
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({n: {"min": min(t), "samples": t} for n, t in out.items()}))


if __name__ == "__main__":
    main()
