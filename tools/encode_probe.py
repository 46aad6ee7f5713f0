"""Block-encode phase profiler: build postings once (persistent root),
then time encode_shards_from_postings alone at several core counts with
per-phase task-time breakdown (read/map/sort/encode/write).

    python tools/encode_probe.py --input /tmp/..._n960000_s42 \
        [--root /dev/shm/sg_encode_probe] [--cores 16] [--partitions 32]

Run each core count as a separate invocation (fresh JVM per measurement).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--root", default="/dev/shm/sg_encode_probe")
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()

    from ir_base_spark.index.blocks import encode_shards_from_postings
    from ir_base_spark.index.manifest import finalize_lite, resumable_build
    from ir_base_spark.session import get_spark

    local_dir = f"/dev/shm/sg-spark-probe-{args.cores}"
    os.makedirs(local_dir, exist_ok=True)
    spark = get_spark(
        app_name=f"encode-probe-{args.cores}",
        cores=args.cores,
        shuffle_partitions=args.cores * 4,
        extra_conf={"spark.local.dir": local_dir},
    )
    root = args.root
    if not os.path.isdir(os.path.join(root, "postings")):
        t = spark.read.parquet(args.input)
        os.makedirs(root, exist_ok=True)
        os.makedirs(os.path.join(root, "manifest"), exist_ok=True)
        t0 = time.time()
        resumable_build(
            spark, t, root, num_partitions=args.partitions,
            wave_size=max(1, args.partitions // 2),
        )
        finalize_lite(spark, root)
        print(f"build+finalize: {time.time() - t0:.1f}s", file=sys.stderr)

    for i in range(args.repeat):
        shutil.rmtree(os.path.join(root, "blocks"), ignore_errors=True)
        t0 = time.time()
        rep = encode_shards_from_postings(spark, root)
        wall = time.time() - t0
        print(json.dumps({
            "cores": args.cores,
            "repeat": i,
            "wall_sec": round(wall, 3),
            **rep,
        }))
    spark.stop()


if __name__ == "__main__":
    main()
