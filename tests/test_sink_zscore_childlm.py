"""Round-3 ops: ranked-list sink golden file, z-score normalization,
parent-child LM child ranking."""

from __future__ import annotations

import glob
import math
import os

import pytest


def test_write_ranked_list_golden(spark, tmp_path):
    from ir_base_spark.sources.ranked_sink import write_ranked_list

    df = spark.createDataFrame(
        [
            ("q2", 7, 0.5),
            ("q1", 3, 1.25),
            ("q1", 10, 2.0),
            ("q1", 2, 1.25),   # score tie with doc 3 -> numeric id order
            ("q2", 1, -0.75),
        ],
        "query_id string, doc_id long, score double",
    )
    path = str(tmp_path / "ranked")
    write_ranked_list(df, path, single_file=True)
    files = sorted(glob.glob(os.path.join(path, "part-*")))
    assert len(files) == 1
    lines = open(files[0]).read().splitlines()
    # reference line shape (printTopChild4Stn): key, count, item:score...
    assert lines == [
        "q1\t3\t10:2.000000\t2:1.250000\t3:1.250000",
        "q2\t2\t7:0.500000\t1:-0.750000",
    ]


def test_zscore_features_semantics(spark):
    from ir_base_spark.ops.l2r import zscore_features

    df = spark.createDataFrame(
        [(0, 1.0, 5.0), (1, 2.0, 5.0), (2, 3.0, 5.0), (3, 6.0, 5.0)],
        "id long, x double, c double",
    )
    got = {r["id"]: (r["x_z"], r["c_z"]) for r in
           zscore_features(df, ["x", "c"]).collect()}
    xs = [1.0, 2.0, 3.0, 6.0]
    mean = sum(xs) / 4
    std = math.sqrt(sum(v * v for v in xs) / 4 - mean * mean)
    for i, v in enumerate(xs):
        assert got[i][0] == pytest.approx((v - mean) / std, rel=1e-12)
        assert got[i][1] == 0.0  # constant column -> 0, not NaN


def test_child_ranking_lm_restricts_to_parent_and_ranks(spark):
    from ir_base_spark.ops.textops import child_ranking_lm

    children = spark.createDataFrame(
        [
            (0, 1, "spark join window spark"),
            (0, 2, "window filter scan"),
            (0, 3, "unrelated tokens entirely different"),
            (1, 4, "spark join window"),  # other parent: never ranked for 0
        ],
        "parent_id long, child_id long, text string",
    )
    stn = spark.createDataFrame(
        [(0, "spark window"), (1, "spark")],
        "parent_id long, stn_text string",
    )
    out = child_ranking_lm(children, stn, mu=1000.0).collect()
    by_parent: dict = {}
    for r in out:
        by_parent.setdefault(r["parent_id"], []).append(
            (r["rank"], r["child_id"], r["score6"])
        )
    # candidate restriction: parent 0 ranks exactly its own 3 children
    assert sorted(c for _, c, _ in by_parent[0]) == [1, 2, 3]
    assert sorted(c for _, c, _ in by_parent[1]) == [4]
    ranked0 = sorted(by_parent[0])
    # child 1 contains both stn terms (twice 'spark') -> best likelihood;
    # child 3 shares nothing -> worst
    assert ranked0[0][1] == 1 and ranked0[-1][1] == 3
    # scores descend with rank
    assert ranked0[0][2] >= ranked0[1][2] >= ranked0[2][2]
