"""Embedding-space dedup + IVF ANN (ops/similarity.py)."""

from __future__ import annotations

import numpy as np
import pytest

from ir_base_spark.ops.similarity import (
    ann_ivf_topk,
    cosine_topk,
    dedup_embedding,
)


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.RandomState(11)
    vecs = {i: rng.randn(16) for i in range(12)}
    # planted near-dups: scaled copies have cosine exactly 1.0
    vecs[12] = vecs[0] * 1.7
    vecs[13] = vecs[3] * 0.4
    vecs[14] = vecs[0] * 0.9
    rows = [(i, [float(x) for x in v]) for i, v in sorted(vecs.items())]
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")


def test_dedup_embedding_finds_planted_dups(emb_df):
    out = {
        r["vec_id"]: (r["is_dup"], r["dup_of"])
        for r in dedup_embedding(
            emb_df, threshold=0.999, bands=4, planes_per_band=4, dim=16
        ).collect()
    }
    assert len(out) == 15
    # scaled copies collide in every band (identical projection signs)
    # and verify at cosine 1.0; min-id survivor keeps the original
    assert out[12] == (1, 0)
    assert out[13] == (1, 3)
    assert out[14] == (1, 0)
    assert out[0] == (0, None)
    assert out[3] == (0, None)
    # non-dup vectors survive
    assert sum(d for d, _a in out.values()) == 3


def test_ann_ivf_full_probe_equals_bruteforce(emb_df):
    """nprobe = n_clusters searches every list — the result must equal
    exact brute-force cosine top-k."""
    ivf = ann_ivf_topk(
        emb_df, query_vec_id=0, k=5, n_clusters=3, iterations=1, nprobe=3
    ).collect()
    bf = cosine_topk(emb_df, query_vec_id=0, k=5).collect()
    assert [tuple(r) for r in ivf] == [tuple(r) for r in bf]


def test_ann_ivf_subset_of_bruteforce(emb_df):
    """With nprobe < n_clusters the results are a subset of the corpus
    ranked consistently (rank/sim6 descending, no query echo)."""
    rows = ann_ivf_topk(
        emb_df, query_vec_id=0, k=5, n_clusters=3, iterations=1, nprobe=1
    ).collect()
    assert rows
    sims = [r["sim6"] for r in rows]
    assert sims == sorted(sims, reverse=True)
    assert all(r["vec_id"] != 0 for r in rows)
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
