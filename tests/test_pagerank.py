"""Per-group PageRank instance weighting vs a numpy replica."""

from __future__ import annotations

import numpy as np

from ir_base_spark.ops.pagerank import pagerank_instance_weights


def _replica(groups, top_k, alpha, iters):
    out = {}
    for g, (ids, vecs) in groups.items():
        n = len(ids)
        sims = np.round(vecs @ vecs.T, 6)
        T = np.zeros((n, n))
        for i in range(n):
            order = sorted(
                (j for j in range(n) if j != i),
                key=lambda j: (-sims[i, j], ids[j]),
            )[:top_k]
            e = np.exp(sims[i, order])
            T[i, order] = e / e.sum()
        r = np.full(n, 1.0 / np.sqrt(n))
        for _ in range(iters):
            r2 = alpha / n + (1 - alpha) * (T.T @ r)
            r = r2 / np.sqrt((r2 * r2).sum())
        for i, doc in enumerate(ids):
            out[(g, doc)] = (round(r[i], 6), round(1.0 + 10 * r[i], 6))
    return out


def test_pagerank_matches_replica(spark):
    rng = np.random.default_rng(9)
    rows = []
    groups = {}
    did = 0
    for g, size in [("a", 15), ("b", 20), ("c", 5)]:  # c below min size
        ids, vecs = [], []
        for _ in range(size):
            v = rng.normal(size=6)
            rows.append((g, did, [float(x) for x in v]))
            ids.append(did)
            vecs.append(v)
            did += 1
        if size > 10:
            groups[g] = (ids, np.array(vecs))
    df = spark.createDataFrame(rows, "grp string, id long, vec array<double>")
    got = {
        (r["grp"], r["id"]): (r["rank6"], r["weight6"])
        for r in pagerank_instance_weights(
            df, top_k=4, alpha=0.15, iterations=3, min_group_size=10
        ).collect()
    }
    want = _replica(groups, top_k=4, alpha=0.15, iters=3)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k][0] - want[k][0]) < 5e-6, k
        assert abs(got[k][1] - want[k][1]) < 5e-5, k
