"""LambdaRank (metric-weighted pairwise L2R) and RankSVM — Spark-native
deterministic batch training.

LambdaRank (/root/reference/src/Ranker/LambdaRank.java:92-126) weights
each pairwise logistic gradient by a |ΔMAP|-style factor from the
CURRENT ranking: per query, docs are sorted by score, and a swap of the
docs at positions i < j changes MAP by at most
(Σ_{pos=i+1..j} 1/pos) / P with P = #relevant
(MAP_Evaluator.updateDeltas,
/root/reference/src/Ranker/evaluator/MAP_Evaluator.java:37-60); the
Evaluator returns rate + that partial harmonic sum
(Evaluator.delta, evaluator/Evaluator.java:44-67, rate = 0.5). The
pairwise gradient contribution is then
    g += σ(s_worse − s_better) · Δ · (fv(worse) − fv(better))
— RankNet's gradient scaled by Δ (the two per-doc accumulations of
LambdaRank.gradientUpdate collapse to this pairwise form).

Spark-first re-expression: deterministic FULL-BATCH descent. Each
iteration is (a) a scan-side score column over the per-doc feature
table, (b) ONE window pass per query computing rank position and the
running harmonic sum H_pos (both under the pinned (score desc, doc_id
asc) order), (c) a join of the static pair-diff table against the
ranked frame on (query, doc) twice, (d) one 10-double gradient
aggregate. Features, pairs and diffs never leave the executors; only
the gradient row does. At 10^12 pairs this is a map-side partial
aggregate + tiny reduce per iteration, like ops/ranknet.py.

Deliberate deviations, pinned for reproducibility (documented exactly
like ranknet.py): β₀ = 0, deterministic step μ_t = lr·shrinkage^t
(reference: random init + Math.random() step), score ties broken by
doc_id asc (reference sort leaves ties unspecified), and the harmonic
factor H_j − H_i is evaluated as a difference of two running sums
(identical float association in Spark, DuckDB and the numpy replica;
the reference accumulates the sub-range directly — same value up to
ulps). The mini-batch pair normalizer pSize counts every unordered
pair twice (once from each doc's view, LambdaRank.java:104-118), so
the full-batch mean divides by 2·n_pairs.

RankSVM: the reference trains L2R_L1LOSS_SVC_DUAL liblinear on the
same pair-difference vectors (_Query.extractPairs4RankSVM,
/root/reference/src/structures/_Query.java:58-81;
L2RMetricLearning.java:124-133). Re-expressed as deterministic primal
full-batch subgradient on hinge loss max(0, 1 − βᵀx) over diffs
oriented better−worse (the reference's alternating-sign emission is a
dual-solver class-balance artifact, not part of the objective):
g = mean over pairs of −x·1[βᵀx < 1] + λβ.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot_expr(feature_cols: list[str], beta: list[float]):
    """βᵀfv as a left-associated literal sum (the ranknet._margin_expr
    convention — the SQL oracle unrolls the same order)."""
    terms = [F.col(c) * F.lit(b) for c, b in zip(feature_cols, beta)]
    return reduce(lambda a, t: a + t, terms)


def lambdarank_train(
    features: DataFrame,
    pair_diffs: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rate: float = 0.5,
    lambda_: float = 1.0,
    lr: float = 0.5,
    iters: int = 8,
    shrinkage: float = 0.9,
) -> list[float]:
    """Full-batch LambdaRank (OT_MAP) on per-doc ``features`` (query,
    doc, label, feature cols) and the static ``pair_diffs`` table from
    ranknet.pair_feature_diffs (query_id, better_doc, worse_doc, x
    columns named after feature_cols). Returns β.
    """
    base = features.select(
        F.col(query_col).alias("query_id"),
        F.col(doc_col).alias("doc_id"),
        F.col(label_col).alias("label"),
        *feature_cols,
    ).cache()
    # P (#relevant) per query is ranking-independent: compute once.
    # P == 0 would mean no label-different pairs either, so no pair of
    # that query survives the join — the reference's stateful
    # previous-query fallback never has to be modeled.
    pstats = base.groupBy("query_id").agg(
        F.sum((F.col("label") > 0).cast("double")).alias("p_rel")
    )
    diffs = pair_diffs.cache()
    n = diffs.count()
    if n == 0:
        diffs.unpersist()
        base.unpersist()
        return [0.0] * len(feature_cols)

    beta = [0.0] * len(feature_cols)
    w_rank = Window.partitionBy("query_id")
    for t in range(iters):
        s = _dot_expr(feature_cols, beta)
        scored = base.withColumn("_s", s).withColumn(
            "_pos",
            F.row_number().over(
                w_rank.orderBy(F.col("_s").desc(), F.col("doc_id").asc())
            ),
        )
        ranked = scored.withColumn(
            "_cumh",
            F.sum(F.lit(1.0) / F.col("_pos")).over(
                w_rank.orderBy("_pos").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        ).select("query_id", "doc_id", "_s", "_cumh")
        rb = ranked.select(
            "query_id",
            F.col("doc_id").alias("better_doc"),
            F.col("_s").alias("_s_b"),
            F.col("_cumh").alias("_h_b"),
        )
        rw = ranked.select(
            "query_id",
            F.col("doc_id").alias("worse_doc"),
            F.col("_s").alias("_s_w"),
            F.col("_cumh").alias("_h_w"),
        )
        j = (
            diffs.join(rb, ["query_id", "better_doc"])
            .join(rw, ["query_id", "worse_doc"])
            .join(F.broadcast(pstats), "query_id")
        )
        delta = F.lit(rate) + F.abs(
            F.col("_h_b") - F.col("_h_w")
        ) / F.col("p_rel")
        m = F.col("_s_b") - F.col("_s_w")
        coef = -delta / (F.lit(1.0) + F.exp(m))
        row = j.agg(
            *[F.sum(coef * F.col(c)).alias(f"g_{c}") for c in feature_cols]
        ).collect()[0]
        mu = lr * (shrinkage ** t)
        # pSize counts each unordered pair from both docs' views → 2n
        beta = [
            b - mu * (float(row[f"g_{c}"] or 0.0) / (2.0 * n) + lambda_ * b)
            for b, c in zip(beta, feature_cols)
        ]
    diffs.unpersist()
    base.unpersist()
    return beta


def partition_col(query_col: str = "query_id", workers: int = 4):
    """Deterministic query→worker assignment for the parallel trainer:
    the first 8 hex digits of md5(query_id) mod ``workers`` — portable
    (identical in Spark, DuckDB, and hashlib), replacing the
    reference's Random.nextInt allocation
    (LambdaRankParallel.allocateQueries,
    /root/reference/src/Ranker/LambdaRankParallel.java:35-48) so a
    distributed rerun reproduces the same partitioning."""
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.col(query_col).cast("string")), 1, 8), 16, 10
        ).cast("long"),
        F.lit(workers),
    )


def lambdarank_parallel_train(
    features: DataFrame,
    pair_diffs: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    workers: int = 4,
    rate: float = 0.5,
    lambda_: float = 1.0,
    lr: float = 0.5,
    iters: int = 8,
    shrinkage: float = 0.9,
) -> list[float]:
    """Deterministic analog of LambdaRankParallel: per outer iteration,
    every worker partition takes ONE full-batch LambdaRank step over
    ITS queries from the shared weights, and the stepped weight vectors
    are averaged uniformly — the reference's train/average cycle
    (LambdaRankParallel.train,
    /root/reference/src/Ranker/LambdaRankParallel.java:112-126, averaging
    `:122-125` with weight 1/W; each worker runs with λ/W,
    `initWorkers` `:50-56`).

    Pinned for reproducibility like the other trainers: hash
    partitioning instead of Random.nextInt re-allocation each
    iteration, one deterministic step per worker per outer iteration
    instead of an SGD pass, β₀ = 0, μ_t = lr·shrinkage^t, and the
    average evaluated in ascending partition order.

    Spark shape: identical to lambdarank_train except the gradient
    aggregation is grouped by the (tiny) worker-partition key — W rows
    of 10 sums + a pair count come back per iteration instead of 1.
    """
    base = features.select(
        F.col(query_col).alias("query_id"),
        F.col(doc_col).alias("doc_id"),
        F.col(label_col).alias("label"),
        *feature_cols,
    ).cache()
    pstats = base.groupBy("query_id").agg(
        F.sum((F.col("label") > 0).cast("double")).alias("p_rel")
    )
    diffs = pair_diffs.withColumn(
        "_part", partition_col("query_id", workers)
    ).cache()
    n = diffs.count()
    if n == 0:
        diffs.unpersist()
        base.unpersist()
        return [0.0] * len(feature_cols)

    lam_w = lambda_ / workers
    beta = [0.0] * len(feature_cols)
    w_rank = Window.partitionBy("query_id")
    for t in range(iters):
        s = _dot_expr(feature_cols, beta)
        scored = base.withColumn("_s", s).withColumn(
            "_pos",
            F.row_number().over(
                w_rank.orderBy(F.col("_s").desc(), F.col("doc_id").asc())
            ),
        )
        ranked = scored.withColumn(
            "_cumh",
            F.sum(F.lit(1.0) / F.col("_pos")).over(
                w_rank.orderBy("_pos").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        ).select("query_id", "doc_id", "_s", "_cumh")
        rb = ranked.select(
            "query_id",
            F.col("doc_id").alias("better_doc"),
            F.col("_s").alias("_s_b"),
            F.col("_cumh").alias("_h_b"),
        )
        rw = ranked.select(
            "query_id",
            F.col("doc_id").alias("worse_doc"),
            F.col("_s").alias("_s_w"),
            F.col("_cumh").alias("_h_w"),
        )
        j = (
            diffs.join(rb, ["query_id", "better_doc"])
            .join(rw, ["query_id", "worse_doc"])
            .join(F.broadcast(pstats), "query_id")
        )
        delta = F.lit(rate) + F.abs(
            F.col("_h_b") - F.col("_h_w")
        ) / F.col("p_rel")
        m = F.col("_s_b") - F.col("_s_w")
        coef = -delta / (F.lit(1.0) + F.exp(m))
        rows = (
            j.groupBy("_part")
            .agg(
                F.count(F.lit(1)).alias("_n_p"),
                *[
                    F.sum(coef * F.col(c)).alias(f"g_{c}")
                    for c in feature_cols
                ],
            )
            .collect()
        )
        by_part = {int(r["_part"]): r for r in rows}
        mu = lr * (shrinkage ** t)
        new_beta = []
        for i, c in enumerate(feature_cols):
            acc = 0.0
            for p in range(workers):  # pinned ascending-partition order
                r = by_part.get(p)
                if r is None:
                    stepped = beta[i] - mu * (lam_w * beta[i])
                else:
                    g = float(r[f"g_{c}"] or 0.0)
                    n_p = float(r["_n_p"])
                    stepped = beta[i] - mu * (
                        g / (2.0 * n_p) + lam_w * beta[i]
                    )
                acc = acc + stepped
            new_beta.append(acc / workers)
        beta = new_beta
    diffs.unpersist()
    base.unpersist()
    return beta


def ranksvm_train(
    pair_diffs: DataFrame,
    feature_cols: list[str],
    lambda_: float = 1.0,
    lr: float = 0.5,
    iters: int = 12,
    shrinkage: float = 0.9,
) -> list[float]:
    """Deterministic full-batch subgradient RankSVM over better−worse
    pair diffs: per iteration g = mean(−x·1[βᵀx < 1]) + λβ,
    β ← β − μ_t·g. Same plan shape as ranknet_train: one scan-side
    margin expression + one 10-double aggregate per iteration."""
    pair_diffs = pair_diffs.cache()
    n = pair_diffs.count()
    if n == 0:
        pair_diffs.unpersist()
        return [0.0] * len(feature_cols)
    beta = [0.0] * len(feature_cols)
    for t in range(iters):
        m = _dot_expr(feature_cols, beta)
        act = F.when(m < 1.0, F.lit(-1.0)).otherwise(F.lit(0.0))
        row = pair_diffs.agg(
            *[F.sum(act * F.col(c)).alias(f"g_{c}") for c in feature_cols]
        ).collect()[0]
        mu = lr * (shrinkage ** t)
        beta = [
            b - mu * (float(row[f"g_{c}"] or 0.0) / n + lambda_ * b)
            for b, c in zip(beta, feature_cols)
        ]
    pair_diffs.unpersist()
    return beta
