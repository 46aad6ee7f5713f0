"""L2R metric learning (learned-similarity Gaussian Fields) vs a pure
Python/numpy replica.

The replica re-implements the documented chain independently —
genRankingFV over TF vectors, population z-score with the std>0 guard
and the 6-dp pin, s = round6(exp(w · z)), per-side (s desc, nid asc)
top-k edges, Jacobi propagation — so a bug in the DataFrame
formulation (ops/metric_learning.py) can't hide in a shared helper.

Reference chain being modeled:
L2RMetricLearning.getSimilarity
(/root/reference/src/Classifier/metricLearning/L2RMetricLearning.java:87-99)
overriding GaussianFields.getSimilarity, with genRankingFV
(:347-383) and normalize (:298-329).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from ir_base_spark.ops.l2r import ranking_features
from ir_base_spark.ops.metric_learning import (
    FV_COLS,
    l2r_metric_gaussian_fields,
)

K, KP, ITERS = 2, 2, 2
ALPHA, BETA, ETA = 1.0, 0.1, 0.1
WEIGHTS = [0.3, 0.0, -0.2, 0.1, 0.5, 0.0, 0.0, 0.0, -0.1, 0.2]

VOCAB = [
    "quark", "boson", "lepton", "gluon", "hadron",
    "meson", "photon", "tachyon", "baryon", "neutrino",
]


def _r6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def _make_docs(n=16, seed=7):
    rng = np.random.default_rng(seed)
    texts, groups = [], []
    for i in range(n):
        words = rng.choice(VOCAB, size=int(rng.integers(4, 12)))
        texts.append(" ".join(words))
        groups.append(int(i % 3))
    labels = {i: groups[i] for i in range(n) if i % 4 == 0}
    return texts, groups, labels


def _replica(texts, groups, labels):
    n = len(texts)
    toks = [t.split() for t in texts]
    tf = [{} for _ in range(n)]
    for i, ts in enumerate(toks):
        for w in ts:
            tf[i][w] = tf[i].get(w, 0) + 1.0
    df = {}
    for i in range(n):
        for w in tf[i]:
            df[w] = df.get(w, 0) + 1.0
    dlen = [sum(tf[i].values()) for i in range(n)]
    l2 = [math.sqrt(sum(v * v for v in tf[i].values())) for i in range(n)]
    nterms = [len(tf[i]) for i in range(n)]
    aidf = [
        sum(math.log((n + 1.0) / df[w]) for w in tf[i]) / nterms[i]
        for i in range(n)
    ]
    u_ids = sorted(i for i in range(n) if i not in labels)

    rows = {}
    for q in u_ids:
        for d in range(n):
            if d == q:
                continue
            common = set(tf[q]) & set(tf[d])
            if not common:
                continue
            dot = sum(tf[q][w] * tf[d][w] for w in common)
            rows[(q, d)] = [
                _r6(dot / (l2[d] * l2[q])),
                0.0,
                1 if groups[d] == groups[q] else 0,
                _r6(abs(dlen[q] - dlen[d]) / dlen[q]),
                _r6(len(common) / (nterms[d] + nterms[q] - len(common))),
                0.0,
                0.0,
                0.0,
                0.0,  # stopword_prop: vocab has no stopwords
                _r6(aidf[d]),
            ]

    # population z-score with std>0 guard, z pinned to 6 dp
    mat = np.array(list(rows.values()), dtype=float)
    mean = mat.mean(axis=0)
    std = np.sqrt(np.maximum((mat * mat).mean(axis=0) - mean * mean, 0.0))
    scores = {}
    for (q, d), fv in rows.items():
        dot = 0.0
        for j, w in enumerate(WEIGHTS):
            z = (fv[j] - mean[j]) / std[j] if std[j] > 0 else 0.0
            dot += w * _r6(z)
        scores[(q, d)] = _r6(math.exp(dot))

    SL, WL, cpred, uu_edges = {}, {}, {}, {}
    for u in u_ids:
        ln = sorted(
            (d for d in labels if (u, d) in scores),
            key=lambda d: (-scores[(u, d)], d),
        )[:K]
        if not ln:
            continue
        SL[u] = sum(scores[(u, d)] * labels[d] for d in ln)
        WL[u] = sum(scores[(u, d)] for d in ln)
        cpred[u] = SL[u] / WL[u]
        un = sorted(
            (d for d in u_ids if (u, d) in scores),
            key=lambda d: (-scores[(u, d)], d),
        )[:KP]
        uu_edges[u] = [(d, scores[(u, d)]) for d in un]

    pred = dict(cpred)
    for _ in range(ITERS):
        new = {}
        for u in cpred:
            su = sum(w * pred[d] for d, w in uu_edges[u] if d in pred)
            wu = sum(w for d, w in uu_edges[u] if d in pred)
            new[u] = (
                ETA * (ALPHA * SL[u] + BETA * su)
                / (ALPHA * WL[u] + BETA * wu)
                + (1.0 - ETA) * cpred[u]
            )
        pred = new
    n_classes = int(max(labels.values())) + 1
    out = {}
    for u, p in pred.items():
        p6 = _r6(p)
        lab = min(max(int(math.ceil(p6 - 0.5)), 0), n_classes - 1)
        out[u] = (p6, lab)
    return out


def test_l2r_metric_gaussian_fields_matches_replica(spark):
    texts, groups, labels = _make_docs()
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    gdf = spark.createDataFrame(
        [(i, g) for i, g in enumerate(groups)], "doc_id long, label int"
    )
    ldf = spark.createDataFrame(
        [(i, y) for i, y in sorted(labels.items())], "doc_id long, label int"
    )
    got = {
        r["vec_id"]: (r["pred6"], r["pred_label"])
        for r in l2r_metric_gaussian_fields(
            docs, gdf, ldf,
            weights=WEIGHTS, k=K, k_prime=KP,
            alpha=ALPHA, beta=BETA, eta=ETA, iterations=ITERS,
        ).collect()
    }
    want = _replica(texts, groups, labels)
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == pytest.approx(want[u][0], abs=2e-6), u
        assert got[u][1] == want[u][1], u


def test_l2r_metric_gaussian_fields_unlabeled_cap(spark, monkeypatch):
    """The unlabeled set drives a driver collect + broadcast query side;
    the contract is enforced with an actionable error, not assumed
    (r5 verdict task 6 / What's-wrong item 2)."""
    import ir_base_spark.ops.metric_learning as ML

    texts, groups, labels = _make_docs()
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    gdf = spark.createDataFrame(
        [(i, g) for i, g in enumerate(groups)], "doc_id long, label int"
    )
    ldf = spark.createDataFrame(
        [(i, y) for i, y in sorted(labels.items())], "doc_id long, label int"
    )
    monkeypatch.setattr(ML, "MAX_UNLABELED", 1)
    with pytest.raises(ValueError, match="unlabeled set exceeds"):
        ML.l2r_metric_gaussian_fields(
            docs, gdf, ldf, weights=WEIGHTS, k=K, k_prime=KP,
            alpha=ALPHA, beta=BETA, eta=ETA, iterations=ITERS,
        )


def test_ranking_features_meta_dims(spark):
    """The doc_meta seam: topical (symmetric KL / n_topics), senti
    (|Δ|), POS/aspect (cosine) dims vs direct formula evaluation."""
    texts, groups, _ = _make_docs(n=8, seed=3)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    gdf = spark.createDataFrame(
        [(i, g) for i, g in enumerate(groups)], "doc_id long, label int"
    )
    rng = np.random.default_rng(5)
    topic = rng.dirichlet(np.ones(4), size=8)
    senti = rng.uniform(-1, 1, size=8)
    pos = rng.integers(0, 5, size=(8, 4)).astype(float)
    asp = rng.integers(0, 3, size=(8, 3)).astype(float)
    meta = spark.createDataFrame(
        [
            (
                i,
                [float(x) for x in topic[i]],
                float(senti[i]),
                [float(x) for x in pos[i]],
                [float(x) for x in asp[i]],
            )
            for i in range(8)
        ],
        "doc_id long, topic_vct array<double>, senti_score double, "
        "pos_vct array<double>, asp_vct array<double>",
    )
    out = ranking_features(docs, gdf, [0, 1], doc_meta=meta).collect()
    assert out, "no candidate pairs"

    def klsym(p, q):
        s = sum(
            (pi - qi) * math.log(pi / qi)
            for pi, qi in zip(p, q)
            if pi != 0.0 and qi != 0.0
        )
        return _r6(s / len(p))

    def cos(a, b):
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        if na == 0.0 or nb == 0.0:
            return 0.0
        return _r6(sum(x * y for x, y in zip(a, b)) / na / nb)

    for r in out:
        q, d = r["query_doc"], r["doc_id"]
        assert r["topical_sim"] == pytest.approx(
            klsym(topic[q], topic[d]), abs=2e-6
        ), (q, d)
        assert r["senti_diff"] == pytest.approx(
            _r6(abs(senti[q] - senti[d])), abs=2e-6
        ), (q, d)
        assert r["pos_sim"] == pytest.approx(cos(pos[q], pos[d]), abs=2e-6), (q, d)
        assert r["aspect_sim"] == pytest.approx(cos(asp[q], asp[d]), abs=2e-6), (q, d)


def test_meta_columns_order(spark):
    """FV_COLS must match ranking_features' output column order (the
    weight vector is positional in the reference)."""
    assert FV_COLS == [
        "bow_cos", "topical_sim", "same_label", "len_diff", "jaccard",
        "senti_diff", "pos_sim", "aspect_sim", "stopword_prop", "avg_idf",
    ]
