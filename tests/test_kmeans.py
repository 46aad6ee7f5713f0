"""Deterministic cosine KMeans vs a numpy replica."""

from __future__ import annotations

import numpy as np

from ir_base_spark.ops.kmeans import kmeans_cosine


def _replica(ids, vecs, k, iters):
    order = np.argsort(ids)
    cent = np.array([vecs[order[c]] for c in range(k)], dtype=float)

    def assign(c_arr):
        out = {}
        cn = np.linalg.norm(c_arr, axis=1)
        for i, d in enumerate(ids):
            xn = np.linalg.norm(vecs[i])
            dists = np.round(1.0 - (vecs[i] @ c_arr.T) / xn / cn, 9)
            c = int(np.argmin(dists))  # argmin keeps first min = smaller c
            out[d] = (c, float(dists[c]))
        return out

    for _ in range(iters):
        a = assign(cent)
        new = cent.copy()
        for c in range(k):
            members = [vecs[i] for i, d in enumerate(ids) if a[d][0] == c]
            if members:
                new[c] = np.mean(members, axis=0)
        cent = new
    return assign(cent)


def test_kmeans_matches_replica(spark):
    rng = np.random.default_rng(21)
    n, dim, k = 80, 8, 4
    vecs = rng.normal(size=(n, dim))
    ids = list(range(n))
    rows = [(i, [float(x) for x in vecs[i]]) for i in ids]
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    got = {
        r["id"]: (r["cluster"], r["dist9"])
        for r in kmeans_cosine(df, k=k, iterations=2).collect()
    }
    want = _replica(ids, vecs, k, 2)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0], d
        assert abs(got[d][1] - want[d][1]) < 1e-8, d
