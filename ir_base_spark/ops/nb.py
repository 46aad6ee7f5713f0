"""Naive Bayes over the token stream — the one reference classifier that
is pure aggregation, hence first-class here (the SGD/liblinear zoo stays
MLlib-mapped per SURVEY §2.11).

Reference: /root/reference/src/Classifier/supervised/NaiveBayes.java
- train (:70-88): pY[c] = ln(n_c + δY);
  Pxy[c][w] = ln(δXY + tfsum(w,c)) − ln(Σ_w tfsum(w,c) + V·δXY),
  V = dictionary size; ``presence`` mode counts 1 per (doc, term).
- predict (:91-99): argmax_c (pY[c] + Σ_{w∈d} tf(w,d)·Pxy[c][w]);
  Utils.argmax keeps the SMALLEST class on exact ties.

Plan shape at scale: training is two groupBy aggregations (class
priors; (label, term) tf sums) — one shuffle each, map-side partial.
Prediction joins the doc token stream with the (small, dictionary-sized)
conditional table — broadcast — and the unseen-(term,class) default
ln(δXY) − ln(tot_c + V·δXY) is applied via coalesce, so the full V×C
grid is never materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import token_counts


def naive_bayes_train(
    documents: DataFrame,
    labels: DataFrame,
    delta_y: float = 0.1,
    delta_xy: float = 0.1,
    presence: bool = False,
):
    """→ (priors, cond, n_terms): priors(label, log_prior);
    cond(label, term, logp) for OBSERVED (label, term) pairs; the
    per-class unseen default is ln(δXY) − ln(tot_c + V·δXY) (derivable
    from priors.tot_c). delta defaults are the reference's 0.1/0.1."""
    tf = token_counts(documents).withColumn(
        "tf", F.lit(1.0) if presence else F.col("tf").cast("double")
    )
    n_terms = tf.select("term").distinct().count()
    lab = labels.select("doc_id", "label")
    cw = (
        tf.join(lab, "doc_id")
        .groupBy("label", "term")
        .agg(F.sum("tf").alias("cnt"))
    )
    tot = cw.groupBy("label").agg(F.sum("cnt").alias("tot"))
    priors = (
        lab.groupBy("label")
        .agg(F.count(F.lit(1)).cast("double").alias("n_c"))
        .join(tot, "label", "left")
        .fillna(0.0, subset=["tot"])
        .select(
            "label",
            F.log(F.col("n_c") + delta_y).alias("log_prior"),
            "tot",
        )
    )
    denom = F.log(F.col("tot") + float(n_terms) * delta_xy)
    cond = cw.join(tot, "label").select(
        "label",
        "term",
        (F.log(F.lit(delta_xy) + F.col("cnt")) - denom).alias("logp"),
    )
    return priors, cond, n_terms


def naive_bayes_predict(
    documents: DataFrame,
    labels: DataFrame,
    delta_y: float = 0.1,
    delta_xy: float = 0.1,
    presence: bool = False,
) -> DataFrame:
    """(doc_id, pred_label, score6): train on (documents, labels), then
    classify every document (the reference's in-sample predict shape).

    score6 is the 6-dp floor-rounded winning log score; argmax runs on
    the ROUNDED score with the reference's smallest-label tie-break so
    the SQL oracle agrees bit-for-bit at the decision boundary.
    """
    priors, cond, n_terms = naive_bayes_train(
        documents, labels, delta_y=delta_y, delta_xy=delta_xy, presence=presence
    )
    tf = token_counts(documents).withColumn(
        "tf", F.lit(1.0) if presence else F.col("tf").cast("double")
    )
    # doc terms × classes; unseen (term, class) falls back to the
    # per-class default via coalesce — no V×C grid
    default_logp = F.log(F.lit(delta_xy)) - F.log(
        F.col("tot") + float(n_terms) * delta_xy
    )
    per_class = (
        tf.crossJoin(F.broadcast(priors.select("label", "log_prior", "tot")))
        .join(F.broadcast(cond), ["label", "term"], "left")
        .withColumn("logp", F.coalesce(F.col("logp"), default_logp))
        .groupBy("doc_id", "label")
        .agg(
            (F.first("log_prior") + F.sum(F.col("tf") * F.col("logp"))).alias(
                "score"
            )
        )
    )
    score6 = F.floor(F.col("score") * 1000000.0 + 0.5) / 1000000.0
    best = (
        per_class.withColumn("score6", score6)
        .groupBy("doc_id")
        .agg(
            F.max(
                F.struct(F.col("score6"), (-F.col("label")).alias("nl"))
            ).alias("b")
        )
    )
    return best.select(
        "doc_id",
        (-F.col("b.nl")).cast("int").alias("pred_label"),
        F.col("b.score6").alias("score6"),
    )
