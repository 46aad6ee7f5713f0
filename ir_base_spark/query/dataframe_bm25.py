"""M1 query path: BM25 top-k with pure DataFrame operations.

Query = sparse dot product of the raw-TF query vector against the
weighted doc vectors (/root/reference/src/utils/Utils.java:380-399),
executed the inverted-index way (SURVEY §2.3 "All-pairs similarity"):

  candidates = postings semi-joined on the query's term_ids (broadcast),
  score     = Σ qw·weight per doc, accumulated in ascending-term_id
              order (canonical float order — bit-stable vs the oracle),
  top-k     = per-query window row_number() <= k, ordered by
              score desc, then (conv_id, turn_idx) asc — the formalized
              MyPriorityQueue tie contract
              (/root/reference/src/structures/MyPriorityQueue.java:40-52).

Plan shape: the query-terms side is tiny and broadcast; the postings join
filters on term_id at the scan (partition/predicate pushdown when the
weights table is stored term-partitioned); the only shuffle is the
per-(query, doc) aggregation keyed by doc — no cross join ever happens.
This path is the rank-identity anchor; wand.py is the scale path over
compressed blocks.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..text.analyze import term_counts


def analyze_query_terms(
    spark: SparkSession,
    queries: pd.DataFrame,
    ngrams: int = 1,
    analyzer: str = "reference",
) -> DataFrame:
    """queries(query_id, query_text, k) → DF(query_id, term, qw, k).

    Query analysis runs on the driver (query sets are small) through the
    SAME analysis chain as documents — raw TF as query-side weights
    (SURVEY §2.5).
    """
    rows = []
    for qid, text, k in zip(
        queries["query_id"], queries["query_text"], queries["k"]
    ):
        for term, tf in sorted(
            term_counts(text or "", ngrams=ngrams, analyzer=analyzer).items()
        ):
            rows.append((qid, term, float(tf), int(k)))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["query_id", "term", "qw", "k"]),
        schema="query_id string, term string, qw double, k int",
    )


def score_all(index, query_terms: DataFrame) -> DataFrame:
    """→ DF(query_id, conv_id, turn_idx, k, score): every candidate doc
    (>= 1 matching term) with its full BM25 dot-product score."""
    qt = query_terms.join(
        F.broadcast(index.terms.select("term", "term_id")), "term", "inner"
    ).select("query_id", "term_id", "qw", "k")

    contrib = index.weights.join(F.broadcast(qt), "term_id").select(
        "query_id",
        "conv_id",
        "turn_idx",
        "k",
        F.struct(F.col("term_id"), (F.col("qw") * F.col("weight")).alias("c")).alias(
            "tc"
        ),
    )

    # deterministic accumulation: sort matched terms by term_id, then fold
    return contrib.groupBy("query_id", "conv_id", "turn_idx", "k").agg(
        F.aggregate(
            F.array_sort(F.collect_list("tc")),
            F.lit(0.0),
            lambda acc, x: acc + x["c"],
        ).alias("score")
    )


def topk_search(
    index,
    query_terms: DataFrame,
) -> DataFrame:
    """→ DF(query_id, rank, conv_id, turn_idx, score), ranks 1..k."""
    scores = score_all(index, query_terms)

    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("conv_id").asc(), F.col("turn_idx").asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "conv_id", "turn_idx", "score")
    )
