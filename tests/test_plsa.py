"""pLSA EM vs an independent numpy replica (same seeded-hash init,
same formulas, per-element comparison after 2 iterations)."""

from __future__ import annotations

import hashlib

import numpy as np

from ir_base_spark.ops.plsa import plsa_train


def _h01(s: str) -> float:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) / 2**32


def _replica(rows, K, alpha, beta, lam, iters):
    docs = sorted({d for d, _w, _v in rows})
    vocab = sorted({w for _d, w, _v in rows})
    di = {d: i for i, d in enumerate(docs)}
    wi = {w: i for i, w in enumerate(vocab)}
    tf = np.zeros((len(docs), len(vocab)))
    for d, w, v in rows:
        tf[di[d], wi[w]] += v
    bg_raw = (beta - 1.0) + tf.sum(axis=0)
    bg = bg_raw / bg_raw.sum()
    theta = np.array(
        [
            [(alpha - 1.0) + _h01(f"{d}#t{k}") for k in range(K)]
            for d in docs
        ]
    )
    theta = theta / theta.sum(axis=1, keepdims=True)
    phi = np.array(
        [
            [(beta - 1.0) + _h01(f"{w}#p{k}") for k in range(K)]
            for w in vocab
        ]
    ).T  # (K, V)
    phi = phi / phi.sum(axis=1, keepdims=True)
    mask = tf > 0
    for _ in range(iters):
        s = theta @ phi  # (D, V)
        prop_b = lam * bg / (lam * bg + (1.0 - lam) * s)
        t_new = np.full((len(docs), K), alpha - 1.0)
        p_new = np.full((K, len(vocab)), beta - 1.0)
        for k in range(K):
            e = np.where(
                mask,
                tf * (1.0 - prop_b) * theta[:, [k]] * phi[k][None, :] / s,
                0.0,
            )
            t_new[:, k] += e.sum(axis=1)
            p_new[k] += e.sum(axis=0)
        theta = t_new / t_new.sum(axis=1, keepdims=True)
        phi = p_new / p_new.sum(axis=1, keepdims=True)
    return docs, vocab, theta, phi


def test_plsa_matches_replica(spark):
    rng = np.random.default_rng(5)
    rows = []
    words = [f"w{j}" for j in range(25)]
    for d in range(30):
        for w in rng.choice(25, size=8, replace=False):
            rows.append((d, words[w], float(rng.integers(1, 5))))
    df = spark.createDataFrame(rows, "doc_id long, term string, tf double")
    K, alpha, beta, lam, iters = 3, 2.0, 1.5, 0.3, 2
    theta_df, phi_df = plsa_train(
        df, n_topics=K, alpha=alpha, beta=beta, lam=lam, iterations=iters
    )
    docs, vocab, theta, phi = _replica(rows, K, alpha, beta, lam, iters)
    got_t = {r["doc_id"]: [r[f"t_{k}"] for k in range(K)] for r in theta_df.collect()}
    assert set(got_t) == set(docs)
    for i, d in enumerate(docs):
        np.testing.assert_allclose(got_t[d], theta[i], rtol=0, atol=1e-9)
        assert abs(sum(got_t[d]) - 1.0) < 1e-9
    got_p = {r["term"]: [r[f"p_{k}"] for k in range(K)] for r in phi_df.collect()}
    assert set(got_p) == set(vocab)
    for j, w in enumerate(vocab):
        np.testing.assert_allclose(got_p[w], phi[:, j], rtol=0, atol=1e-9)
    for k in range(K):
        assert abs(sum(got_p[w][k] for w in vocab) - 1.0) < 1e-9
