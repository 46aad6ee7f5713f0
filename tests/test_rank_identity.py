"""End-to-end rank identity: Spark engine vs single-node oracle.

The north-rule correctness gate (BASELINE.md): identical top-k
(query_id, rank, conv_id, turn_idx) and |Δscore| < 1e-9 on the full
reference query set, plus the per-turn text-equality invariant under
stable (conv_id, turn_idx) ordering.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ir_base_spark.index.build import build_index
from ir_base_spark.oracle import build_oracle_index, search_all
from ir_base_spark.query.dataframe_bm25 import analyze_query_terms, topk_search

TOL = 1e-9


def _oracle_docs(transcripts_pdf):
    return [
        ((r.conv_id, int(r.turn_idx)), r.text)
        for r in transcripts_pdf.itertuples()
    ]


def _compare(spark_rows, oracle_rows):
    o = {(r[0], r[1]): (r[2], r[3], r[4]) for r in oracle_rows}
    s = {(r["query_id"], r["rank"]): (r["conv_id"], r["turn_idx"], r["score"])
         for r in spark_rows}
    assert set(o.keys()) == set(s.keys()), (
        f"result-set shape differs: oracle={len(o)} spark={len(s)}"
    )
    for key in o:
        oc, ot, osc = o[key]
        sc, st, ssc = s[key]
        assert abs(osc - ssc) < TOL, f"{key}: score {osc} vs {ssc}"
        assert (oc, ot) == (sc, st), f"{key}: doc ({oc},{ot}) vs ({sc},{st})"


@pytest.mark.parametrize("norm", [0, 2])
def test_rank_identity_bm25(spark, fixture_small, norm):
    t = fixture_small.transcripts
    q = fixture_small.queries

    oracle_idx = build_oracle_index(_oracle_docs(t), norm=norm)
    expected = search_all(
        oracle_idx, list(zip(q["query_id"], q["query_text"], q["k"]))
    )

    sdf = spark.createDataFrame(t)
    index = build_index(spark, sdf, norm=norm)
    assert index.n_docs == oracle_idx.n_docs
    assert abs(index.avg_doc_len - oracle_idx.avg_doc_len) < 1e-12

    qt = analyze_query_terms(spark, q)
    got = topk_search(index, qt).collect()
    _compare(got, expected)


def test_dictionary_identity(spark, fixture_small):
    t = fixture_small.transcripts
    oracle_idx = build_oracle_index(_oracle_docs(t))
    sdf = spark.createDataFrame(t)
    index = build_index(spark, sdf)

    got = {
        r["term"]: (r["term_id"], r["df"], r["ttf"])
        for r in index.terms.collect()
    }
    assert set(got) == set(oracle_idx.term_ids)
    for term, tid in oracle_idx.term_ids.items():
        gtid, gdf, gttf = got[term]
        assert gtid == tid, f"{term}: id {gtid} vs {tid}"
        assert gdf == oracle_idx.df[term]
        assert gttf == oracle_idx.ttf[term]


def test_per_turn_text_equality(spark, fixture_small):
    """Per-row invariant (BASELINE.json:15): the engine's view of the
    corpus, read back under stable (conv_id, turn_idx) ordering, is
    text-equal to the source."""
    t = fixture_small.transcripts
    sdf = spark.createDataFrame(t)
    back = (
        sdf.select("conv_id", "turn_idx", "text")
        .orderBy("conv_id", "turn_idx")
        .collect()
    )
    src = t.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(back) == len(src)
    for row, (_, srow) in zip(back, src.iterrows()):
        assert row["conv_id"] == srow["conv_id"]
        assert int(row["turn_idx"]) == int(srow["turn_idx"])
        assert row["text"] == srow["text"]


def test_min_df_pruning_identity(spark, fixture_small):
    t = fixture_small.transcripts
    q = fixture_small.queries.head(10)
    oracle_idx = build_oracle_index(_oracle_docs(t), min_df=3, max_df=500)
    expected = search_all(
        oracle_idx, list(zip(q["query_id"], q["query_text"], q["k"]))
    )
    sdf = spark.createDataFrame(t)
    index = build_index(spark, sdf, min_df=3, max_df=500)
    assert index.n_docs == oracle_idx.n_docs
    assert abs(index.avg_doc_len - oracle_idx.avg_doc_len) < 1e-12
    qt = analyze_query_terms(spark, q)
    got = topk_search(index, qt).collect()
    _compare(got, expected)
