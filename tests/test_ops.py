"""Behavioral tests for the dedup / similarity ops without SQL oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def _docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest near the river bank"
    )
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("quick", "swift")),  # near dup of 0
        (3, base.replace("quick", "swift").replace("lazy", "sleepy")),
        (4, "completely different text about spark query engines and "
            "columnar storage formats with vectorized execution"),
        (5, "another unrelated document mentioning inverted indexes, "
            "posting lists, and block max wand pruning at scale"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_exact(spark):
    from ir_base_spark.ops.textops import dedup_exact

    got = dedup_exact(_docs(spark)).collect()
    assert len(got) == 1
    assert got[0]["n_dups"] == 2
    assert got[0]["keep_doc_id"] == 0


def test_minhash_approximates_jaccard(spark):
    from ir_base_spark.ops.textops import (
        _shingles,
        minhash_signatures,
    )

    docs = _docs(spark)
    sigs = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs, num_hashes=64).collect()}
    sh = {
        r["doc_id"]: set(r["shingles"])
        for r in docs.select(
            "doc_id", _shingles(F.col("text"), 3).alias("shingles")
        ).collect()
    }

    def jac(a, b):
        return len(sh[a] & sh[b]) / len(sh[a] | sh[b])

    def est(a, b):
        return float(np.mean(np.array(sigs[a]) == np.array(sigs[b])))

    # identical docs -> identical signatures
    assert sigs[0] == sigs[1]
    # estimates within 0.2 of true jaccard for near/far pairs
    for a, b in [(0, 2), (0, 3), (0, 4), (2, 3)]:
        assert abs(est(a, b) - jac(a, b)) < 0.2, (a, b, est(a, b), jac(a, b))
    # ordering: near-dup pair scores far above unrelated pair
    assert est(0, 2) > est(0, 4) + 0.3


def test_minhash_lsh_finds_near_dups(spark):
    from ir_base_spark.ops.textops import minhash_lsh_candidates

    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_candidates(_docs(spark), num_hashes=32, bands=8).collect()
    }
    assert (0, 1) in pairs  # exact dup always collides
    assert (0, 2) in pairs or (2, 3) in pairs  # near dups collide
    assert (0, 4) not in pairs and (0, 5) not in pairs  # unrelated don't


def test_simhash_distance_orders_similarity(spark):
    from ir_base_spark.ops.textops import simhash64

    h = {r["doc_id"]: r["simhash"] for r in simhash64(_docs(spark)).collect()}

    def ham(a, b):
        return bin((h[a] ^ h[b]) & ((1 << 64) - 1)).count("1")

    assert ham(0, 1) == 0  # identical text -> identical simhash
    assert ham(0, 2) < ham(0, 4)  # near dup closer than unrelated
    assert ham(0, 3) < ham(0, 5)


def test_ann_lsh_subset_of_bruteforce_ordering(spark):
    from ir_base_spark.ops.similarity import ann_lsh_topk, cosine_topk

    rng = np.random.default_rng(3)
    base = rng.standard_normal(32).astype("float32")
    rows = []
    for i in range(60):
        noise = rng.standard_normal(32).astype("float32")
        alpha = 1.0 - (i / 60.0)
        v = (alpha * base + (1 - alpha) * noise).astype("float32")
        rows.append((i, v.tolist(), int(i % 3)))
    emb = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]),
        schema="vec_id long, embedding array<float>, label int",
    )
    brute = [r["vec_id"] for r in cosine_topk(emb, 0, k=10).collect()]
    approx = [r["vec_id"] for r in ann_lsh_topk(emb, 0, k=10, n_planes=6).collect()]
    # approximate recall: at least half of true top-10 retrieved
    assert len(set(brute) & set(approx)) >= 5


def test_dedup_near_end_to_end(spark):
    from ir_base_spark.ops.textops import dedup_near

    got = {r["doc_id"]: (r["is_dup"], r["dup_of"])
           for r in dedup_near(_docs(spark), threshold=0.6).collect()}
    assert len(got) == 6
    assert got[1] == (1, 0)        # exact dup removed, keeps min id
    assert got[0][0] == 0          # survivor
    assert got[2][0] == 1 and got[2][1] == 0   # near dup of 0
    assert got[4][0] == 0 and got[5][0] == 0   # unrelated survive


def test_minhash_lsh_anchor_emission_is_linear_in_cluster_size(spark):
    """A duplicate cluster of m docs must emit O(m) candidate pairs
    (min-anchor emission), not the O(m²) all-pairs blowup — the scale
    contract of minhash_lsh_candidates/dedup_near."""
    from ir_base_spark.ops.textops import dedup_near, minhash_lsh_candidates

    m = 100
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest near the river bank"
    )
    rows = [(i, base) for i in range(m)]  # one m-doc exact-dup cluster
    rows += [(m, "unrelated text about columnar storage formats"),
             (m + 1, "posting lists and block max wand pruning at scale")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    cand = minhash_lsh_candidates(docs).collect()
    # identical docs share every bucket: anchor emission = exactly the
    # (0, other) pairs once each — m-1 rows, not m*(m-1)/2
    assert len(cand) == m - 1
    assert {(r["doc_a"], r["doc_b"]) for r in cand} == {
        (0, i) for i in range(1, m)
    }

    quad = minhash_lsh_candidates(docs, all_pairs=True).count()
    assert quad == m * (m - 1) // 2  # the exhaustive variant, on request

    got = {r["doc_id"]: (r["is_dup"], r["dup_of"])
           for r in dedup_near(docs, threshold=0.6).collect()}
    assert got[0] == (0, None)                      # anchor survives
    assert all(got[i] == (1, 0) for i in range(1, m))  # cluster collapses
    assert got[m][0] == 0 and got[m + 1][0] == 0    # unrelated survive


def test_micro_prf_and_confusion(spark):
    from ir_base_spark.evaluate import confusion_matrix, micro_prf

    preds = spark.createDataFrame(
        [(0, 0), (0, 0), (0, 1), (1, 1), (1, 0), (2, 2), (0, 2), (3, 1)],
        "pred_label int, true_label int",
    )
    cm = {(r["pred_label"], r["true_label"]): r["n"]
          for r in confusion_matrix(preds).collect()}
    assert cm[(0, 0)] == 2 and cm[(1, 1)] == 1 and cm[(3, 1)] == 1
    prf = {r["label"]: (r["precision"], r["recall"], r["f1"])
           for r in micro_prf(preds).collect()}
    # class 0: predicted 4 times, correct 2; true 3 times
    assert prf[0][0] == 0.5 and abs(prf[0][1] - 2 / 3) < 1e-6
    # class 3: predicted once, never true -> P=0, R=0 (zero guard), F1=0
    assert prf[3] == (0.0, 0.0, 0.0)
    # class 2: P=1/2... predicted once correct once -> P=1.0; true twice -> R=0.5
    assert prf[2][0] == 1.0 and prf[2][1] == 0.5


def test_ranking_pairs_semantics(spark):
    from ir_base_spark.ops.l2r import ranking_pairs

    ranked = spark.createDataFrame(
        [("q1", 10, 2), ("q1", 11, 0), ("q1", 12, 2), ("q2", 10, 1), ("q2", 11, 3)],
        "query_id string, doc_id long, label long",
    )
    pairs = {(r["query_id"], r["better_doc"], r["worse_doc"])
             for r in ranking_pairs(ranked).collect()}
    # q1: (10,11) and (12,11); 10 vs 12 tie -> no pair. q2: 11 beats 10.
    assert pairs == {("q1", 10, 11), ("q1", 12, 11), ("q2", 11, 10)}
