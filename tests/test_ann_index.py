"""Persisted ANN bucket table: bucketed write + bucket-pruned query.

Asserts the claim in ops/similarity.ann_bucket_table's docstring is
real: the saved table is bucketed, and a query batch's probe-set filter
prunes the scan to the probe buckets (SelectedBucketsCount in the plan).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(11)
    rows = []
    base = rng.standard_normal(32).astype("float32")
    for i in range(200):
        noise = rng.standard_normal(32).astype("float32")
        alpha = max(0.0, 1.0 - i / 100.0)
        v = (alpha * base + (1 - alpha) * noise).astype("float32")
        rows.append((i, v.tolist()))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"]),
        schema="vec_id long, embedding array<float>",
    )


def test_ann_index_build_query_and_bucket_pruning(spark, emb, tmp_path):
    import sys

    sys.path.insert(0, "jobs")
    from ann_index import build_ann_index, probe_buckets, query_ann_index

    from ir_base_spark.ops.similarity import ann_lsh_topk_batch

    table = "ann_idx_test"
    build_ann_index(spark, emb, table, n_buckets=16, n_planes=8, dim=32)

    # the catalog records the bucketing spec
    cols = spark.sql(f"DESCRIBE EXTENDED {table}").collect()
    desc = {r["col_name"]: r["data_type"] for r in cols}
    assert "Num Buckets" in desc and int(desc["Num Buckets"]) == 16
    assert "bucket" in desc.get("Bucket Columns", "")

    # probe set is tiny and literal -> bucket pruning engages in the scan
    # (autoBucketedScan would disable bucketed reads for a bare filter
    # plan; the query path pins it off — do the same here)
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
    )
    probes = probe_buckets(spark, table, [0, 1, 2], n_planes=8)
    assert len(probes) <= 3 * 9
    from pyspark.sql import functions as F

    pruned = spark.table(table).filter(F.col("bucket").isin(probes))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "SelectedBucketsCount" in plan, plan[:2000]
    sel = [ln for ln in plan.splitlines() if "SelectedBucketsCount" in ln]
    # strictly fewer buckets than the table has -> real pruning
    assert "16 out of 16" not in sel[0]

    # end-to-end: pruned-table results == direct bucket-table results
    got = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["sim6"])
        for r in query_ann_index(spark, table, [0, 1, 2], k=5).collect()
    }
    want = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["sim6"])
        for r in ann_lsh_topk_batch(emb, [0, 1, 2], k=5, dim=32).collect()
    }
    assert got == want and len(got) > 0
    spark.sql(f"DROP TABLE IF EXISTS {table}")
