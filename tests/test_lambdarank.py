"""LambdaRank and RankSVM distributed trainers vs single-node numpy
replicas (the test_ranknet pattern), plus learning-quality assertions."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _numpy_lambdarank(
    feats, labels, pairs, rate=0.5, lambda_=1.0, lr=0.5, iters=8,
    shrinkage=0.9,
):
    """feats: (n_docs, d); labels: (n_docs,); pairs: [(better, worse)]
    within one query. Replicates ops/lambdarank.lambdarank_train
    including the difference-of-running-harmonic-sums association."""
    n_docs, d = feats.shape
    beta = np.zeros(d)
    p_rel = float((labels > 0).sum())
    n = len(pairs)
    X = np.array([feats[a] - feats[b] for a, b in pairs])
    for t in range(iters):
        s = feats @ beta
        # rank by (score desc, doc_id asc); positions 1-based
        order = sorted(range(n_docs), key=lambda i: (-s[i], i))
        pos = np.empty(n_docs, dtype=np.int64)
        pos[order] = np.arange(1, n_docs + 1)
        cumh_sorted = np.cumsum(1.0 / np.arange(1, n_docs + 1))
        cumh = cumh_sorted[pos - 1]
        g = np.zeros(d)
        for k, (a, b) in enumerate(pairs):
            delta = rate + abs(cumh[a] - cumh[b]) / p_rel
            m = s[a] - s[b]
            g += (-delta / (1.0 + np.exp(m))) * X[k]
        mu = lr * (shrinkage ** t)
        beta = beta - mu * (g / (2.0 * n) + lambda_ * beta)
    return beta


def _numpy_ranksvm(X, lambda_=1.0, lr=0.5, iters=12, shrinkage=0.9):
    n, d = X.shape
    beta = np.zeros(d)
    for t in range(iters):
        m = X @ beta
        act = np.where(m < 1.0, -1.0, 0.0)
        g = (act[:, None] * X).sum(axis=0)
        mu = lr * (shrinkage ** t)
        beta = beta - mu * (g / n + lambda_ * beta)
    return beta


def _fixture(spark, rng_seed=7, n_docs=40, d=4):
    rng = np.random.default_rng(rng_seed)
    true_w = np.array([2.0, -1.0, 0.5, 0.0])
    feats = rng.standard_normal((n_docs, d))
    score = feats @ true_w
    label = (score > np.median(score)).astype(int)
    fcols = [f"f{i}" for i in range(d)]
    fpdf = pd.DataFrame(feats, columns=fcols)
    fpdf.insert(0, "label", label)
    fpdf.insert(0, "doc_id", range(n_docs))
    fpdf.insert(0, "query_id", "q0")
    fdf = spark.createDataFrame(fpdf)
    pair_list = [
        (a, b) if label[a] > label[b] else (b, a)
        for a in range(n_docs)
        for b in range(a + 1, n_docs)
        if label[a] != label[b]
    ]
    pairs = spark.createDataFrame(
        [("q0", a, b) for a, b in pair_list],
        "query_id string, better_doc long, worse_doc long",
    )
    return feats, label, pair_list, fcols, fdf, pairs, true_w


def test_lambdarank_matches_numpy_and_learns(spark):
    from ir_base_spark.ops.lambdarank import lambdarank_train
    from ir_base_spark.ops.ranknet import pair_feature_diffs, ranknet_misorder

    feats, label, pair_list, fcols, fdf, pairs, true_w = _fixture(spark)
    diffs = pair_feature_diffs(pairs, fdf, fcols)
    beta = lambdarank_train(
        fdf, diffs, fcols, lambda_=0.1, lr=0.5, iters=8
    )
    expect = _numpy_lambdarank(
        feats, label, pair_list, lambda_=0.1, lr=0.5, iters=8
    )
    assert np.allclose(np.array(beta), expect, atol=1e-9), (beta, expect)

    after = ranknet_misorder(diffs, fcols, beta)
    assert after < 0.2 * len(pair_list)
    # top-weighted deltas tilt the direction vs the generator, so the
    # bar is looser than RankNet's
    cos = float(
        np.dot(beta, true_w) / (np.linalg.norm(beta) * np.linalg.norm(true_w))
    )
    assert cos > 0.8


def test_lambdarank_delta_weighting_differs_from_ranknet(spark):
    """The |ΔMAP| factor must actually change the trajectory: with the
    same hyperparameters, LambdaRank and RankNet weights differ."""
    from ir_base_spark.ops.lambdarank import lambdarank_train
    from ir_base_spark.ops.ranknet import pair_feature_diffs, ranknet_train

    _feats, _label, _pair_list, fcols, fdf, pairs, _ = _fixture(spark)
    diffs = pair_feature_diffs(pairs, fdf, fcols)
    b_lr = lambdarank_train(fdf, diffs, fcols, lambda_=0.1, lr=0.5, iters=5)
    b_rn = ranknet_train(diffs, fcols, lambda_=0.1, lr=0.5, iters=5)
    assert not np.allclose(b_lr, b_rn, atol=1e-6)


def test_ranksvm_matches_numpy_and_learns(spark):
    from ir_base_spark.ops.lambdarank import ranksvm_train
    from ir_base_spark.ops.ranknet import pair_feature_diffs, ranknet_misorder

    feats, label, pair_list, fcols, fdf, pairs, true_w = _fixture(spark)
    diffs = pair_feature_diffs(pairs, fdf, fcols)
    beta = ranksvm_train(diffs, fcols, lambda_=0.1, lr=0.5, iters=12)
    dpdf = diffs.toPandas().sort_values(["better_doc", "worse_doc"])
    X = dpdf[fcols].to_numpy()
    expect = _numpy_ranksvm(X, lambda_=0.1, lr=0.5, iters=12)
    assert np.allclose(np.array(beta), expect, atol=1e-9), (beta, expect)

    after = ranknet_misorder(diffs, fcols, beta)
    assert after < 0.2 * len(pair_list)
    cos = float(
        np.dot(beta, true_w) / (np.linalg.norm(beta) * np.linalg.norm(true_w))
    )
    assert cos > 0.9


def _numpy_lambdarank_parallel(
    feats, labels, qids, pairs, workers=4, rate=0.5, lambda_=1.0,
    lr=0.5, iters=6, shrinkage=0.9,
):
    """Single-node replica of lambdarank_parallel_train: md5-hash query
    partitioning, one delta-weighted step per partition per outer
    iteration, pinned-order uniform averaging. ``qids`` maps doc index
    -> query id; pairs are (better, worse) doc indices within a query.
    """
    import hashlib

    n_docs, d = feats.shape
    part_of = {
        q: int(hashlib.md5(q.encode()).hexdigest()[:8], 16) % workers
        for q in set(qids)
    }
    lam_w = lambda_ / workers
    beta = np.zeros(d)
    groups = {}
    for i, q in enumerate(qids):
        groups.setdefault(q, []).append(i)
    for t in range(iters):
        s = feats @ beta
        cumh = np.empty(n_docs)
        p_rel = {}
        for q, docs in groups.items():
            order = sorted(docs, key=lambda i: (-s[i], i))
            hs = np.cumsum(1.0 / np.arange(1, len(docs) + 1))
            for pos, i in enumerate(order):
                cumh[i] = hs[pos]
            p_rel[q] = float(sum(labels[i] > 0 for i in docs))
        g = {p: np.zeros(d) for p in range(workers)}
        n_p = {p: 0 for p in range(workers)}
        for a, b in pairs:
            q = qids[a]
            p = part_of[q]
            delta = rate + abs(cumh[a] - cumh[b]) / p_rel[q]
            m = s[a] - s[b]
            g[p] += (-delta / (1.0 + np.exp(m))) * (feats[a] - feats[b])
            n_p[p] += 1
        mu = lr * (shrinkage ** t)
        new_beta = np.zeros(d)
        for i in range(d):
            acc = 0.0
            for p in range(workers):
                if n_p[p]:
                    stepped = beta[i] - mu * (
                        g[p][i] / (2.0 * n_p[p]) + lam_w * beta[i]
                    )
                else:
                    stepped = beta[i] - mu * (lam_w * beta[i])
                acc = acc + stepped
            new_beta[i] = acc / workers
        beta = new_beta
    return beta


def test_lambdarank_parallel_matches_numpy(spark):
    from ir_base_spark.ops.lambdarank import lambdarank_parallel_train
    from ir_base_spark.ops.ranknet import pair_feature_diffs

    rng = np.random.default_rng(11)
    d, n_docs, n_queries = 4, 48, 6
    true_w = np.array([2.0, -1.0, 0.5, 0.0])
    feats = rng.standard_normal((n_docs, d))
    score = feats @ true_w
    label = (score > np.median(score)).astype(int)
    qids = [f"q{i % n_queries}" for i in range(n_docs)]

    fcols = [f"f{i}" for i in range(d)]
    fpdf = pd.DataFrame(feats, columns=fcols)
    fpdf.insert(0, "label", label)
    fpdf.insert(0, "doc_id", range(n_docs))
    fpdf.insert(0, "query_id", qids)
    fdf = spark.createDataFrame(fpdf)
    pair_list = [
        (a, b) if label[a] > label[b] else (b, a)
        for a in range(n_docs)
        for b in range(a + 1, n_docs)
        if qids[a] == qids[b] and label[a] != label[b]
    ]
    pairs = spark.createDataFrame(
        [(qids[a], a, b) for a, b in pair_list],
        "query_id string, better_doc long, worse_doc long",
    )
    diffs = pair_feature_diffs(pairs, fdf, fcols)
    beta = lambdarank_parallel_train(
        fdf, diffs, fcols, workers=4, lambda_=0.1, lr=0.5, iters=6
    )
    expect = _numpy_lambdarank_parallel(
        feats, label, qids, pair_list, workers=4, lambda_=0.1,
        lr=0.5, iters=6,
    )
    assert np.allclose(np.array(beta), expect, atol=1e-9), (beta, expect)
    # averaging across partitions still learns the generating direction
    cos = float(
        np.dot(beta, true_w) / (np.linalg.norm(beta) * np.linalg.norm(true_w))
    )
    assert cos > 0.7
