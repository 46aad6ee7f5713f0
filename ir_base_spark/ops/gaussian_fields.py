"""Gaussian Fields semi-supervised label propagation (random-walk form).

Deterministic Spark analog of the reference's transductive predictor
(/root/reference/src/Classifier/semisupervised/GaussianFields.java:22,
GaussianFieldsByRandomWalk.java:62-95 randomWalkByWeightedSum): every
unlabeled node links to its top-k labeled and top-k' unlabeled
neighbors by similarity, then predictions relax iteratively as

    pred_i <- eta * (alpha*Σ_L w_ij·y_j + beta*Σ_U w_ij·pred_j)
                    / (alpha*Σ_L w_ij + beta*Σ_U w_ij)
              + (1-eta) * cpred_i

(the simFlag=true branch weights by similarity; simFlag=false uses
w=1 — both supported). Deviations from the reference, made so the op
is deterministic and distributable, each documented here:

- Jacobi, not Gauss-Seidel: the reference sweeps nodes in index order
  updating m_pred IN PLACE, so node i reads already-updated neighbors
  j<i — an order the executor count would change. We update all nodes
  synchronously from the previous iteration's predictions; both
  iterate toward the same harmonic fixed point.
- Fixed iteration count, not the Σ|Δpred|/U < delta convergence test
  (GaussianFieldsByRandomWalk.java:160-169): a pinned number of
  iterations gives a bit-reproducible answer the SQL oracle can unroll.
- The "multiple learner" prior (NB/LR/SVM classifierPred) is replaced
  by the labeled-neighbor weighted average — the quantity the
  reference itself computes as _Node.weightAvgInLabeledNeighbors()
  (_Node.java:50) and evaluates as the `lPred` baseline
  (GaussianFields.java:233). Any per-doc prior column works at scale;
  this default keeps the op self-contained and oracle-able.
- The labeled subset is the caller's choice (null label = unlabeled),
  not a Random.nextDouble() < ratio draw (GaussianFields.java:118).

Scale shape: neighbor search is the expensive part. The default here
is the brute-force cosine top-k (the oracle baseline, exact); at
100 TB swap the candidate generation for the LSH-bucketed ANN path
(ops/similarity.ann_lsh_topk_batch / jobs/ann_index.py) — the edge
lists, the static labeled aggregates, and the per-iteration
join+groupBy (shuffle keyed on the small U-node id set) are unchanged.
Edges are computed once and cached; each iteration is ONE join of the
UU edge list against the previous predictions plus one aggregation —
no per-row Python anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import _dot, _norm

# GEMM-path gate: dst rows x dim elements the driver will broadcast
# (2e8 doubles ~ 1.6 GB). Beyond this, candidate generation should be
# the ANN path anyway (module docstring); the expression fallback keeps
# the exact semantics available.
_BROADCAST_ELEMS_CAP = 200_000_000


def _cos6(a, b):
    """Cosine similarity rounded to 6 dp — edge weights are pinned to
    decimals so Spark and the SQL oracle rank and weigh identically."""
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), 6)


def _topk_edges_expr(
    src: DataFrame, dst: DataFrame, k: int, self_exclude: bool
) -> DataFrame:
    """Pure-expression form: broadcast nested-loop pairs + window rank.

    Exact but O(|src|*|dst|) codegen array-cosines — the fallback when
    the dst side exceeds the driver-broadcast cap."""
    pair = src.select(
        F.col("id").alias("uid"), F.col("vec").alias("uvec")
    ).crossJoin(
        F.broadcast(
            dst.select(
                F.col("id").alias("nid"),
                F.col("vec").alias("nvec"),
                F.col("y").alias("ny"),
            )
        )
    )
    if self_exclude:
        pair = pair.filter(F.col("uid") != F.col("nid"))
    sim = pair.select(
        "uid", "nid", "ny", _cos6(F.col("uvec"), F.col("nvec")).alias("s")
    )
    w = Window.partitionBy("uid").orderBy(F.col("s").desc(), F.col("nid").asc())
    return sim.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    ).drop("rn")


def _topk_edges(
    src: DataFrame, dst: DataFrame, k: int, self_exclude: bool
) -> DataFrame:
    """(uid, nid, ny, s): per-src top-k dst by (sim6 desc, nid asc).

    Brute-force exact top-k, done the way a 100 TB brute-force baseline
    should be: the dst side is collected once, broadcast as a dense
    float64 matrix, and each Arrow batch of src rows scores ALL dst in
    one numpy GEMM — thousands of fused multiply-adds per cycle instead
    of one codegen array-cosine per (src, dst) pair. Selection happens
    kernel-side so only |src| x k edge rows ever leave the worker.
    Semantics match `_topk_edges_expr` (double-cast dot, round-6dp
    weights, nid-asc tie order); dst sides too large to broadcast fall
    back to the expression form (at that scale use the ANN candidate
    path instead — module docstring).
    """
    n_dst = dst.count()
    if n_dst == 0:
        return _topk_edges_expr(src, dst, k, self_exclude)
    first_vec = dst.select("vec").head()[0]
    dim = len(first_vec) if first_vec is not None else 0
    if dim == 0 or n_dst * dim > _BROADCAST_ELEMS_CAP:
        return _topk_edges_expr(src, dst, k, self_exclude)

    dpdf = dst.select("id", "vec", "y").toPandas()
    nid = dpdf["id"].to_numpy(np.int64)
    order = np.argsort(nid, kind="stable")  # nid asc == tie order
    nid = nid[order]
    D = np.asarray([np.asarray(v, np.float64) for v in dpdf["vec"]], np.float64)[
        order
    ]
    ny = dpdf["y"].to_numpy(np.float64)[order]  # NaN where null
    dnorm = np.sqrt(np.einsum("ij,ij->i", D, D))
    bc = src.sparkSession.sparkContext.broadcast((nid, D, ny, dnorm))
    kk = int(min(k, n_dst))
    sentinel = np.iinfo(np.int64).max

    def gen(batches):
        b_nid, b_D, b_ny, b_dn = bc.value
        n = b_nid.shape[0]
        for pdf in batches:
            if not len(pdf):
                continue
            uid = pdf["id"].to_numpy(np.int64)
            Uv = np.asarray(
                [np.asarray(v, np.float64) for v in pdf["vec"]], np.float64
            )
            un = np.sqrt(np.einsum("ij,ij->i", Uv, Uv))
            sim = (Uv @ b_D.T) / (un[:, None] * b_dn[None, :])
            # Spark round(x, 6) = HALF_UP away from zero; s6 holds the
            # integer-valued scaled weight (|cos|<=1 -> |s6|<=1e6)
            s6 = np.sign(sim) * np.floor(np.abs(sim) * 1e6 + 0.5)
            # composite sort key: (s desc, nid asc) with nid asc ==
            # column index asc (b_nid sorted); all values fit int64
            key = (1_000_000 - s6.astype(np.int64)) * np.int64(n) + np.arange(
                n, dtype=np.int64
            )
            if self_exclude:
                pos = np.searchsorted(b_nid, uid)
                rows = np.nonzero(
                    (pos < n) & (b_nid[np.minimum(pos, n - 1)] == uid)
                )[0]
                key[rows, np.minimum(pos[rows], n - 1)] = sentinel
            if kk < n:
                cand = np.argpartition(key, kk - 1, axis=1)[:, :kk]
            else:
                cand = np.broadcast_to(
                    np.arange(n, dtype=np.int64), (key.shape[0], n)
                ).copy()
            ckey = np.take_along_axis(key, cand, axis=1)
            csort = np.argsort(ckey, axis=1, kind="stable")
            sel = np.take_along_axis(cand, csort, axis=1)
            skey = np.take_along_axis(ckey, csort, axis=1)
            valid = skey != sentinel
            ridx = np.repeat(np.arange(sel.shape[0]), sel.shape[1]).reshape(
                sel.shape
            )[valid]
            jsel = sel[valid]
            ny_sel = b_ny[jsel]
            out = pd.DataFrame(
                {
                    "uid": uid[ridx],
                    "nid": b_nid[jsel],
                    "ny": pd.Series(ny_sel).where(~np.isnan(ny_sel), None),
                    "s": s6[ridx, jsel] / 1e6,
                }
            )
            yield out

    return src.select("id", "vec").mapInPandas(
        gen, schema="uid long, nid long, ny double, s double"
    )


def gaussian_fields_random_walk(
    vectors: DataFrame,
    k: int = 4,
    k_prime: int = 4,
    alpha: float = 1.0,
    beta: float = 0.1,
    eta: float = 0.1,
    iterations: int = 3,
    sim_weighted: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    ul_edges: DataFrame | None = None,
    uu_edges: DataFrame | None = None,
) -> DataFrame:
    """Label propagation over (id, vector, label-or-null) rows.

    Rows with a non-null ``label_col`` are the labeled anchor set L
    (their predictions are pinned to the label, as in the reference
    where labeled _Node.m_pred is constructed equal to y and never
    rewritten); null-labeled rows are U and get predictions.

    ``ul_edges`` / ``uu_edges`` are the getSimilarity override seam
    (GaussianFields.java:160-163 overridden by
    L2RMetricLearning.java:87-99): pass precomputed candidate edges
    (uid, nid, ny, s) — scored by ANY similarity, e.g. the learned
    L2R metric (ops/metric_learning.py) or an ANN candidate pass —
    and the propagation runs over them unchanged; both default to the
    built-in top-k cosine graph. When both are supplied ``vec_col``
    is not read (the vectors frame only provides ids + labels).

    Returns (vec_id, pred6, pred_label): the relaxed real-valued
    prediction rounded to 6 dp and its nearest-class decode
    (argmin_c |c - pred|, ties to the smaller class —
    GaussianFields.getLabel, GaussianFields.java:447-458).
    """
    edges_injected = ul_edges is not None and uu_edges is not None
    sel = [
        F.col(id_col).alias("id"),
        F.col(label_col).cast("double").alias("y"),
    ]
    if not edges_injected:
        sel.insert(1, F.col(vec_col).alias("vec"))
    V = vectors.select(*sel)
    L = V.filter(F.col("y").isNotNull())
    U = V.filter(F.col("y").isNull())
    n_classes = L.agg(F.max("y")).collect()[0][0]
    n_classes = int(n_classes) + 1 if n_classes is not None else 2

    wexpr = F.col("s") if sim_weighted else F.lit(1.0)
    ul = ul_edges if ul_edges is not None else _topk_edges(
        U, L, k, self_exclude=False
    )
    agg_l = (
        ul.groupBy("uid")
        .agg(
            F.sum(wexpr * F.col("ny")).alias("SL"),
            F.sum(wexpr).alias("WL"),
        )
        .withColumn("cpred", F.col("SL") / F.col("WL"))
        .cache()
    )
    uu = (
        uu_edges if uu_edges is not None
        else _topk_edges(U, U, k_prime, self_exclude=True)
    ).select("uid", "nid", wexpr.alias("w")).cache()

    # pred^0 = the prior (reference: random walk starts from the
    # multiple learner's prediction)
    pred = agg_l.select(F.col("uid").alias("id"), F.col("cpred").alias("pred"))
    for _ in range(iterations):
        su = (
            uu.join(pred, uu["nid"] == pred["id"])
            .groupBy("uid")
            .agg(
                F.sum(F.col("w") * F.col("pred")).alias("SU"),
                F.sum("w").alias("WU"),
            )
        )
        pred = (
            agg_l.join(su, "uid", "left")
            .select(
                F.col("uid").alias("id"),
                (
                    F.lit(eta)
                    * (
                        F.lit(alpha) * F.col("SL")
                        + F.lit(beta) * F.coalesce(F.col("SU"), F.lit(0.0))
                    )
                    / (
                        F.lit(alpha) * F.col("WL")
                        + F.lit(beta) * F.coalesce(F.col("WU"), F.lit(0.0))
                    )
                    + F.lit(1.0 - eta) * F.col("cpred")
                ).alias("pred"),
            )
        )

    out = pred.select(
        F.col("id").alias(id_col),
        F.round(F.col("pred"), 6).alias("pred6"),
    )
    # getLabel: argmin_c |c-pred|, first (smaller) class wins ties —
    # ceil(pred-0.5) maps [c-0.5, c+0.5] -> c with the c+0.5 boundary
    # going DOWN, then clamp to the class range
    return out.withColumn(
        "pred_label",
        F.least(
            F.greatest(
                F.ceil(F.col("pred6") - F.lit(0.5)).cast("int"), F.lit(0)
            ),
            F.lit(n_classes - 1),
        ),
    )
