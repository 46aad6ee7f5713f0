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
