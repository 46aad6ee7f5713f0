"""Ranking evaluation operators: MAP and NDCG@k over result DataFrames.

Reference: /root/reference/src/Ranker/evaluator/MAP_Evaluator.java:63-77
(average precision over the sorted list) and NDCG_Evaluator.java:22-84
(gain 2^y−1, discount 1/ln(rank+1), iDCG from the label-sorted list).
Inputs are ranked results (query_id, rank, label) — declarative window +
aggregate plans, one shuffle on query_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def average_precision(results: DataFrame, label_col: str = "label") -> DataFrame:
    """(query_id, ap): AP = mean over relevant hits of precision@hit.

    ``results`` columns: query_id, rank (1-based, unique per query),
    label (0/1 relevance).
    """
    w = Window.partitionBy("query_id").orderBy("rank").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    hits = results.withColumn("cum_rel", F.sum(label_col).over(w))
    prec_at_hit = F.when(
        F.col(label_col) > 0, F.col("cum_rel") / F.col("rank")
    )
    return hits.groupBy("query_id").agg(
        F.coalesce(F.avg(prec_at_hit), F.lit(0.0)).alias("ap")
    )


def mean_average_precision(results: DataFrame, label_col: str = "label") -> float:
    row = (
        average_precision(results, label_col)
        .agg(F.avg("ap").alias("map"))
        .collect()[0]
    )
    return float(row["map"] or 0.0)


def confusion_matrix(
    preds: DataFrame,
    pred_col: str = "pred_label",
    true_col: str = "true_label",
) -> DataFrame:
    """(pred_label, true_label, n): the k×k micro confusion matrix —
    _PerformanceStat.addOnePredResult accumulation
    (/root/reference/src/structures/_PerformanceStat.java:38-40,84-86).
    Zero cells are omitted (sparse); one shuffle on the label pair."""
    return (
        preds.groupBy(
            F.col(pred_col).alias("pred_label"),
            F.col(true_col).alias("true_label"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def micro_prf(
    preds: DataFrame,
    pred_col: str = "pred_label",
    true_col: str = "true_label",
) -> DataFrame:
    """(label, precision, recall, f1): per-class micro P/R/F1 with the
    reference's zero guards — P=0 when the class is never predicted,
    R=0 when it never occurs, F1=0 when P+R=0
    (_PerformanceStat.calculatePRF, :54-78; reported by
    BaseClassifier.calcMicroPerfStat, src/Classifier/BaseClassifier.java:
    164-190).

    Precision_i = M[i][i] / Σ_j M[i][j] (row = predicted),
    Recall_i    = M[i][i] / Σ_j M[j][i] (column = true).
    """
    cm = confusion_matrix(preds, pred_col, true_col)
    pp = cm.groupBy(F.col("pred_label").alias("label")).agg(
        F.sum("n").alias("pp")
    )
    tp_col = cm.groupBy(F.col("true_label").alias("label")).agg(
        F.sum("n").alias("tp_total")
    )
    diag = cm.filter(F.col("pred_label") == F.col("true_label")).select(
        F.col("pred_label").alias("label"), F.col("n").alias("tp")
    )
    j = (
        pp.join(tp_col, "label", "full_outer")
        .join(diag, "label", "left")
        .fillna(0, subset=["pp", "tp_total", "tp"])
    )
    prec = F.when(F.col("pp") > 0, F.col("tp") / F.col("pp")).otherwise(0.0)
    rec = F.when(F.col("tp_total") > 0, F.col("tp") / F.col("tp_total")).otherwise(0.0)
    j = j.withColumn("precision", prec).withColumn("recall", rec)
    f1 = F.when(
        F.col("precision") + F.col("recall") > 0,
        2.0 * F.col("precision") * F.col("recall")
        / (F.col("precision") + F.col("recall")),
    ).otherwise(0.0)
    r6 = lambda c: F.floor(c * 1000000.0 + 0.5) / 1000000.0  # noqa: E731
    return j.select(
        "label",
        r6(F.col("precision")).alias("precision"),
        r6(F.col("recall")).alias("recall"),
        r6(f1).alias("f1"),
    )


def ndcg_at_k(results: DataFrame, k: int = 10, label_col: str = "label") -> DataFrame:
    """(query_id, ndcg): graded-relevance NDCG@k per the reference
    formula (natural log discount)."""
    w_ideal = Window.partitionBy("query_id").orderBy(
        F.col(label_col).desc(), F.col("rank").asc()
    )
    r = results.withColumn("irank", F.row_number().over(w_ideal))
    gain = F.pow(F.lit(2.0), F.col(label_col)) - 1.0
    dcg = F.sum(
        F.when(F.col("rank") <= k, gain / F.log(F.col("rank") + 1.0)).otherwise(0.0)
    )
    idcg = F.sum(
        F.when(F.col("irank") <= k, gain / F.log(F.col("irank") + 1.0)).otherwise(0.0)
    )
    return r.groupBy("query_id").agg(
        F.when(idcg > 0, dcg / idcg).otherwise(F.lit(0.0)).alias("ndcg")
    )
