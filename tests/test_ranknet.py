"""RankNet distributed trainer vs a single-node numpy replica."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _numpy_ranknet(X, lambda_=1.0, lr=0.5, iters=12, shrinkage=0.9):
    n, d = X.shape
    beta = np.zeros(d)
    for t in range(iters):
        m = X @ beta
        g = ((-1.0 / (1.0 + np.exp(m)))[:, None] * X).sum(axis=0)
        mu = lr * (shrinkage ** t)
        beta = beta - mu * (g / n + lambda_ * beta)
    return beta


def test_ranknet_matches_numpy_and_learns(spark):
    from ir_base_spark.ops.ranknet import (
        pair_feature_diffs,
        ranknet_misorder,
        ranknet_train,
    )

    rng = np.random.default_rng(7)
    d = 4
    true_w = np.array([2.0, -1.0, 0.5, 0.0])
    n_docs = 40
    feats = rng.standard_normal((n_docs, d))
    score = feats @ true_w
    label = (score > np.median(score)).astype(int)

    fcols = [f"f{i}" for i in range(d)]
    fpdf = pd.DataFrame(feats, columns=fcols)
    fpdf.insert(0, "doc_id", range(n_docs))
    fpdf.insert(0, "query_id", "q0")
    fdf = spark.createDataFrame(fpdf)

    rows = [
        ("q0", a, b) if label[a] > label[b] else ("q0", b, a)
        for a in range(n_docs)
        for b in range(a + 1, n_docs)
        if label[a] != label[b]
    ]
    pairs = spark.createDataFrame(
        rows, "query_id string, better_doc long, worse_doc long"
    )
    diffs = pair_feature_diffs(pairs, fdf, fcols)

    beta = ranknet_train(diffs, fcols, lambda_=0.1, lr=0.5, iters=12)

    # numpy replica over the same diff matrix
    dpdf = diffs.toPandas().sort_values(["better_doc", "worse_doc"])
    X = dpdf[fcols].to_numpy()
    expect = _numpy_ranknet(X, lambda_=0.1, lr=0.5, iters=12)
    assert np.allclose(np.array(beta), expect, atol=1e-9), (beta, expect)

    # the model learns: far fewer misordered pairs than the zero model
    before = ranknet_misorder(diffs, fcols, [0.0] * d)  # margin 0 => all
    after = ranknet_misorder(diffs, fcols, beta)
    assert before == len(rows)
    assert after < 0.2 * before
    # learned direction correlates with the generating weights
    cos = float(
        np.dot(beta, true_w) / (np.linalg.norm(beta) * np.linalg.norm(true_w))
    )
    assert cos > 0.9
