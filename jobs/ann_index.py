"""Persisted ANN index: build the LSH bucket table ONCE per snapshot and
save it bucketed-by-write, then serve multi-query ANN from bucket-pruned
scans.

    python jobs/ann_index.py build --embeddings <parquet> --table ann_idx
    python jobs/ann_index.py query --table ann_idx --query-ids 0,1,2 --k 10

At 100 TB the bucket table is the materialization of
ops/similarity.ann_bucket_table: ``bucketBy(B, "bucket")`` (or an
Iceberg identity partition on bucket) means a query batch's probe
buckets prune the scan to the touched buckets only — the corpus is
never rescanned or rehashed at query time. The query path pushes the
probe-bucket set down as a LITERAL ``bucket IN (...)`` filter (the
probe set is tiny by construction: (n_planes+1) buckets per query), so
Spark's bucket pruning engages (``SelectedBucketsCount`` in the scan
node) — asserted in tests/test_ann_index.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def build_ann_index(
    spark: SparkSession,
    embeddings: DataFrame,
    table: str,
    n_buckets: int = 64,
    n_planes: int = 8,
    dim: int = 32,
) -> None:
    """Materialize the bucket table as a bucketed table (one shuffle by
    bucket at write time; every later query batch reads only its probe
    buckets)."""
    from ir_base_spark.ops.similarity import ann_bucket_table

    # a previous crashed build can leave an orphaned managed-table
    # location behind (the in-memory catalog forgot the table but the
    # directory survives); clear both so overwrite is idempotent
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table.lower())
    if os.path.isdir(loc):
        import shutil

        shutil.rmtree(loc, ignore_errors=True)

    bt = ann_bucket_table(embeddings, n_planes=n_planes, dim=dim)
    (
        bt.repartition(n_buckets, "bucket")
        .write.bucketBy(n_buckets, "bucket")
        .sortBy("bucket")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def probe_buckets(
    spark: SparkSession, table: str, query_vec_ids: list[int], n_planes: int = 8
) -> list[int]:
    """The query batch's distinct probe-bucket set (own bucket +
    Hamming-1 neighbors per query) — collected driver-side; by contract
    this is <= |queries|·(n_planes+1) ints, so the driver cost is
    bounded and the result folds into a literal IN filter that Spark's
    bucket pruning understands."""
    qb = (
        spark.table(table)
        .filter(F.col("vec_id").isin(list(query_vec_ids)))
        .select("vec_id", "bucket")
        .collect()
    )
    out: set[int] = set()
    for row in qb:
        b = int(row["bucket"])
        out.add(b)
        for i in range(n_planes):
            out.add(b ^ (1 << i))
    return sorted(out)


def query_ann_index(
    spark: SparkSession,
    table: str,
    query_vec_ids: list[int],
    k: int = 10,
    n_planes: int = 8,
) -> DataFrame:
    """Bucket-pruned ANN batch query over the persisted table.

    The scan carries ``bucket IN (<literal probe set>)`` — bucket
    pruning selects only the probe buckets' files — and the candidate
    join + exact cosine re-rank run on that pruned slice via
    ops/similarity.ann_lsh_topk_batch.
    """
    from ir_base_spark.ops.similarity import ann_lsh_topk_batch

    # Spark's auto-bucketed-scan heuristic turns bucketed reads OFF for
    # plans without a bucketed join/agg — which also forfeits bucket
    # PRUNING on the probe filter. Pin it on — but scoped to a CHILD
    # session (shared SparkContext + catalog, isolated SQL conf), so the
    # caller's session keeps its scan behavior for unrelated queries. A
    # set/restore on the shared session would not even work: the conf is
    # read at execution time, after this function returns its lazy plan.
    child = spark.newSession()
    child.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
    )
    probes = probe_buckets(spark, table, query_vec_ids, n_planes=n_planes)
    pruned = child.table(table).filter(F.col("bucket").isin(probes))
    return ann_lsh_topk_batch(
        embeddings=None,
        query_vec_ids=query_vec_ids,
        k=k,
        n_planes=n_planes,
        bucket_table=pruned,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["build", "query"])
    ap.add_argument("--embeddings")
    ap.add_argument("--table", default="ann_idx")
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--n-planes", type=int, default=8)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--query-ids", default="0")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from ir_base_spark.session import get_spark

    spark = get_spark(app_name=f"ann-index-{args.mode}")
    if args.mode == "build":
        emb = spark.read.parquet(args.embeddings)
        build_ann_index(
            spark, emb, args.table, n_buckets=args.n_buckets,
            n_planes=args.n_planes, dim=args.dim,
        )
        print(json.dumps({"table": args.table, "rows": spark.table(args.table).count()}))
    else:
        ids = [int(x) for x in args.query_ids.split(",")]
        out = query_ann_index(
            spark, args.table, ids, k=args.k, n_planes=args.n_planes
        )
        rows = out.collect()
        print(json.dumps({"queries": len(ids), "result_rows": len(rows)}))
    spark.stop()


if __name__ == "__main__":
    main()
