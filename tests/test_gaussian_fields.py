"""Gaussian Fields random-walk label propagation vs a numpy replica.

The replica mirrors the op's documented semantics (Jacobi updates,
fixed iterations, labeled-kNN prior, cosine-round-6 edge weights,
(sim desc, id asc) neighbor tie-break) independently, so a bug in the
DataFrame formulation can't hide in a shared helper.
"""

from __future__ import annotations

import numpy as np
import pytest

from ir_base_spark.ops.gaussian_fields import gaussian_fields_random_walk


def _make_vectors(n=40, dim=8, n_classes=3, seed=11):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, dim))
    labels = [int(i % n_classes) if i % 5 == 0 else None for i in range(n)]
    return vecs, labels


def _replica(vecs, labels, k, kp, alpha, beta, eta, iters, sim_weighted):
    n = len(labels)
    norm = np.linalg.norm(vecs, axis=1)
    cos = (vecs @ vecs.T) / np.outer(norm, norm)
    cos6 = np.round(cos, 6)
    L = [i for i in range(n) if labels[i] is not None]
    U = [i for i in range(n) if labels[i] is None]
    SL, WL, cpred = {}, {}, {}
    uu_edges = {}
    for u in U:
        ln = sorted(L, key=lambda j: (-cos6[u, j], j))[:k]
        w = [cos6[u, j] if sim_weighted else 1.0 for j in ln]
        SL[u] = sum(wi * labels[j] for wi, j in zip(w, ln))
        WL[u] = sum(w)
        cpred[u] = SL[u] / WL[u]
        un = sorted(
            (j for j in U if j != u), key=lambda j: (-cos6[u, j], j)
        )[:kp]
        uu_edges[u] = [
            (j, cos6[u, j] if sim_weighted else 1.0) for j in un
        ]
    pred = dict(cpred)
    for _ in range(iters):
        new = {}
        for u in U:
            su = sum(w * pred[j] for j, w in uu_edges[u])
            wu = sum(w for _j, w in uu_edges[u])
            new[u] = (
                eta * (alpha * SL[u] + beta * su)
                / (alpha * WL[u] + beta * wu)
                + (1.0 - eta) * cpred[u]
            )
        pred = new
    n_classes = int(max(labels[i] for i in L)) + 1
    out = {}
    for u in U:
        p6 = round(pred[u], 6)
        lab = min(max(int(np.ceil(p6 - 0.5)), 0), n_classes - 1)
        out[u] = (p6, lab)
    return out


@pytest.mark.parametrize("sim_weighted", [True, False])
def test_gaussian_fields_matches_replica(spark, sim_weighted):
    vecs, labels = _make_vectors()
    rows = [
        (i, [float(x) for x in vecs[i]], labels[i])
        for i in range(len(labels))
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    got = {
        r["vec_id"]: (r["pred6"], r["pred_label"])
        for r in gaussian_fields_random_walk(
            df, k=3, k_prime=4, iterations=3, sim_weighted=sim_weighted
        ).collect()
    }
    want = _replica(
        vecs, labels, k=3, kp=4, alpha=1.0, beta=0.1, eta=0.1, iters=3,
        sim_weighted=sim_weighted,
    )
    assert set(got) == set(want)
    for u in want:
        assert got[u][1] == want[u][1], (u, got[u], want[u])
        assert abs(got[u][0] - want[u][0]) < 5e-7, (u, got[u], want[u])


def test_labeled_rows_excluded_and_pinned(spark):
    """Labeled rows never appear in the output (their predictions are
    pinned to the label by construction)."""
    vecs, labels = _make_vectors(n=20)
    rows = [
        (i, [float(x) for x in vecs[i]], labels[i])
        for i in range(len(labels))
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = gaussian_fields_random_walk(df, k=2, k_prime=2, iterations=1)
    ids = {r["vec_id"] for r in out.collect()}
    assert ids == {i for i, l in enumerate(labels) if l is None}
