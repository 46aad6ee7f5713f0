"""Variational LDA vs an independent numpy replica (same seeded-hash
init, fixed-iteration schedule, from-spec digamma Newton for alpha)."""

from __future__ import annotations

import hashlib
import math

import numpy as np

from ir_base_spark.ops.lda import (
    lda_variational_train,
    newton_alpha,
    py_digamma,
    py_trigamma,
)


def _h01(s: str) -> float:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) / 2**32


def _replica(rows, K, alpha0, beta, em_iters, var_iters, newton_steps):
    docs = sorted({d for d, _w, _v in rows})
    vocab = sorted({w for _d, w, _v in rows})
    di = {d: i for i, d in enumerate(docs)}
    wi = {w: i for i, w in enumerate(vocab)}
    pairs = [(di[d], wi[w], v, d, w) for d, w, v in rows]
    D, V = len(docs), len(vocab)

    phi = np.zeros((len(pairs), K))
    for p, (_i, _j, _v, d, w) in enumerate(pairs):
        raw = np.array([alpha0 + _h01(f"{d}#{w}#{k}") for k in range(K)])
        phi[p] = raw / raw.sum()

    def gamma_of(phi, alpha):
        g = np.tile(alpha, (D, 1)).astype(float)
        for p, (i, _j, v, _d, _w) in enumerate(pairs):
            g[i] += phi[p] * v
        return g

    def logphi_of(phi):
        s = np.full((V, K), beta - 1.0)
        for p, (_i, j, v, _d, _w) in enumerate(pairs):
            s[j] += phi[p] * v
        return np.log(s / s.sum(axis=0, keepdims=True))

    def alpha_update(gamma, alpha):
        stat = [0.0] * K
        for i in range(D):
            dsum = py_digamma(float(gamma[i].sum()))
            for k in range(K):
                stat[k] += py_digamma(float(gamma[i, k])) - dsum
        return newton_alpha(alpha, stat, D, newton_steps)

    alpha = [alpha0] * K
    gamma = gamma_of(phi, alpha)
    lp = logphi_of(phi)
    alpha = alpha_update(gamma, alpha)

    for _ in range(em_iters):
        for _t in range(var_iters):
            for p, (i, j, _v, _d, _w) in enumerate(pairs):
                x = np.array(
                    [lp[j, k] + py_digamma(float(gamma[i, k])) for k in range(K)]
                )
                m = x.max()
                ls = m + math.log(np.exp(x - m).sum())
                phi[p] = np.exp(x - ls)
            gamma = gamma_of(phi, alpha)
        lp = logphi_of(phi)
        alpha = alpha_update(gamma, alpha)
    return docs, vocab, gamma, lp, alpha


def test_lda_matches_replica(spark):
    rng = np.random.default_rng(17)
    words = [f"w{j}" for j in range(20)]
    rows = []
    for d in range(25):
        for w in rng.choice(20, size=6, replace=False):
            rows.append((d, words[w], float(rng.integers(1, 4))))
    df = spark.createDataFrame(rows, "doc_id long, term string, tf double")
    K = 3
    gamma_df, lp_df, alpha = lda_variational_train(
        df, n_topics=K, alpha0=1.0, beta=1.5, em_iters=2, var_iters=2,
        newton_steps=2,
    )
    docs, vocab, gamma, lp, alpha_w = _replica(
        rows, K, 1.0, 1.5, 2, 2, 2
    )
    got_g = {
        r["doc_id"]: [r[f"g_{k}"] for k in range(K)] for r in gamma_df.collect()
    }
    assert set(got_g) == set(docs)
    for i, d in enumerate(docs):
        np.testing.assert_allclose(got_g[d], gamma[i], rtol=0, atol=1e-8)
    got_lp = {
        r["term"]: [r[f"lp_{k}"] for k in range(K)] for r in lp_df.collect()
    }
    for j, w in enumerate(vocab):
        np.testing.assert_allclose(got_lp[w], lp[j], rtol=0, atol=1e-8)
    np.testing.assert_allclose(alpha, alpha_w, rtol=0, atol=1e-10)
    # trigamma sanity: positive and decreasing on the alpha range
    assert py_trigamma(1.0) > py_trigamma(2.0) > 0
