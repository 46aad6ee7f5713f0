"""Learning-to-rank data preparation: pair generation + ranking features
and micro P/R/F1 — the part of the reference's L2R pipeline users touch
daily (the SGD learners themselves stay out of v0 scope per SURVEY §2.10).

- ranking_pairs: per-query (better, worse) preference pairs by label —
  _Query.createRankingPairs (/root/reference/src/structures/_Query.java:
  25-44): every unordered doc pair with differing labels yields exactly
  one pair. The self-join is per-query quadratic BY DEFINITION of the
  task; at scale the query group is a bounded candidate list (top-k per
  query), so the shuffle key is query_id and the blowup is k² per query,
  never corpus-wide.

- ranking_features: the query-doc feature vector of
  L2RMetricLearning.genRankingFV (/root/reference/src/Classifier/
  metricLearning/L2RMetricLearning.java:347-383). The in-scope dims are
  computed exactly (BoW cosine, same-group flag, length diff, index
  jaccard, stopword proportion, avgIDF); the four dims whose subsystems
  are out of v0 scope (topical, sentiwordnet, POS, aspect — reference
  features 2/6/7/8) are emitted as 0.0 to keep the 10-dim shape, exactly
  as the reference emits 0 when those components are disabled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import text_stats, token_counts


def ranking_pairs(
    ranked: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    label_col: str = "label",
) -> DataFrame:
    """(query_id, better_doc, worse_doc): one row per unordered doc pair
    within a query whose labels differ (higher label = better).

    One shuffle on query_id; the join condition doc_a < doc_b emits each
    unordered pair once, then better/worse resolve by label comparison.
    """
    a = ranked.select(
        F.col(query_col).alias("query_id"),
        F.col(doc_col).alias("doc_a"),
        F.col(label_col).alias("label_a"),
    )
    b = ranked.select(
        F.col(query_col).alias("query_id"),
        F.col(doc_col).alias("doc_b"),
        F.col(label_col).alias("label_b"),
    )
    pairs = a.join(b, "query_id").filter(
        (F.col("doc_a") < F.col("doc_b"))
        & (F.col("label_a") != F.col("label_b"))
    )
    return pairs.select(
        "query_id",
        F.when(F.col("label_a") > F.col("label_b"), F.col("doc_a"))
        .otherwise(F.col("doc_b"))
        .alias("better_doc"),
        F.when(F.col("label_a") > F.col("label_b"), F.col("doc_b"))
        .otherwise(F.col("doc_a"))
        .alias("worse_doc"),
    )


def _r6(c):
    return F.floor(c * 1000000.0 + 0.5) / 1000000.0


def _vct_cos6(a, b):
    """Utils.cosine(double[], double[]) (Utils.java): dot/|a|/|b| with
    either zero norm -> 0, rounded to 6 dp (division order preserved)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return F.when((na == F.lit(0.0)) | (nb == F.lit(0.0)), F.lit(0.0)).otherwise(
        _r6(dot / na / nb)
    )


def _klsym6(p, q):
    """getTopicalSim (GaussianFields.java:145-150): symmetric KL
    Utils.KLsymmetric — sum over dims where BOTH are nonzero of
    (p_i - q_i) * ln(p_i / q_i) — divided by the topic count, 6 dp."""
    s = F.aggregate(
        F.zip_with(
            p,
            q,
            lambda x, y: F.when(
                (x != F.lit(0.0)) & (y != F.lit(0.0)), (x - y) * F.log(x / y)
            ).otherwise(F.lit(0.0)),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return _r6(s / F.size(p))


def ranking_features(
    documents: DataFrame,
    labels: DataFrame,
    query_doc_ids: list[int],
    max_doc_id: int | None = None,
    doc_meta: DataFrame | None = None,
) -> DataFrame:
    """(query_doc, doc_id, f0..f9): genRankingFV over the documents table.

    f0 BoW cosine (TF vectors), f1 topical sim,
    f2 same label (sameProduct analog), f3 |len_q-len_d|/len_q,
    f4 jaccard over term SETS (Utils.jaccard on sparse indices),
    f5 |senti_q - senti_d|, f6 POS-vector cosine, f7 aspect-vector
    cosine, f8 stopword proportion of d, f9 avgIDF of d
    (Analyzer.java:211-212 ln((N+1)/DF) averaged over d's terms).

    Dims 1/5/6/7 come from ``doc_meta``, an optional per-doc table
    (doc_id plus any of: topic_vct array<double> — a pLSA/LDA doc-topic
    distribution (ops/plsa.py / ops/lda.py), senti_score double
    (ops/senti.py), pos_vct array<double> (ops/textops.pos_projection
    counts), asp_vct array<double> (ops/aspect.py assignment counts)).
    Each dim falls back to 0.0 when its column (or the doc's meta row)
    is absent — exactly the reference's behavior with the subsystem
    disabled (genRankingFV, L2RMetricLearning.java:347-383; null
    m_topics -> 0, GaussianFields.java:146).

    Plan shape: queries are a handful of docs -> their TF vectors
    broadcast; candidate side aggregates once per (query, doc). All
    column algebra, one shuffle keyed (query_doc, doc_id); doc_meta
    adds one broadcast (query side) and one keyed join (candidate
    side), no Python.
    """
    docs = documents
    if max_doc_id is not None:
        docs = docs.filter(F.col("doc_id") < max_doc_id)
    tf = token_counts(docs).withColumn("tf", F.col("tf").cast("double"))
    tf = tf.cache()

    n_docs = docs.count()
    dfx = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    stats = tf.groupBy("doc_id").agg(
        F.sum("tf").alias("dlen"),
        F.sqrt(F.sum(F.col("tf") * F.col("tf"))).alias("l2"),
        F.count(F.lit(1)).alias("nterms"),
    )
    avg_idf = (
        tf.join(F.broadcast(dfx), "term")
        .groupBy("doc_id")
        .agg(
            F.avg(F.log(F.lit(float(n_docs) + 1.0) / F.col("df"))).alias("avg_idf")
        )
    )
    stop_prop = text_stats(docs).select("doc_id", "stopword_ratio")

    qtf = tf.filter(F.col("doc_id").isin(query_doc_ids)).select(
        F.col("doc_id").alias("query_doc"),
        "term",
        F.col("tf").alias("qtf"),
    )
    qstats = stats.filter(F.col("doc_id").isin(query_doc_ids)).select(
        F.col("doc_id").alias("query_doc"),
        F.col("dlen").alias("q_dlen"),
        F.col("l2").alias("q_l2"),
        F.col("nterms").alias("q_nterms"),
    )
    qlab = labels.filter(F.col("doc_id").isin(query_doc_ids)).select(
        F.col("doc_id").alias("query_doc"), F.col("label").alias("q_label")
    )

    # sparse dot + index intersection per (query, doc) in one aggregate
    inter = (
        tf.join(F.broadcast(qtf), "term")
        .filter(F.col("doc_id") != F.col("query_doc"))
        .groupBy("query_doc", "doc_id")
        .agg(
            F.sum(F.col("tf") * F.col("qtf")).alias("dot"),
            F.count(F.lit(1)).alias("n_common"),
        )
    )
    out = (
        inter.join(F.broadcast(qstats), "query_doc")
        .join(F.broadcast(qlab), "query_doc")
        .join(stats, "doc_id")
        .join(avg_idf, "doc_id")
        .join(stop_prop, "doc_id")
        .join(labels, "doc_id")
    )

    meta_cols = set(doc_meta.columns) - {"doc_id"} if doc_meta is not None else set()
    topical = senti = pos = aspect = F.lit(0.0)
    if meta_cols:
        dmeta = doc_meta.select(
            "doc_id", *[F.col(c).alias(f"d_{c}") for c in sorted(meta_cols)]
        )
        qmeta = doc_meta.filter(F.col("doc_id").isin(query_doc_ids)).select(
            F.col("doc_id").alias("query_doc"),
            *[F.col(c).alias(f"q_{c}") for c in sorted(meta_cols)],
        )
        out = out.join(dmeta, "doc_id", "left").join(
            F.broadcast(qmeta), "query_doc", "left"
        )
        if "topic_vct" in meta_cols:
            topical = F.coalesce(
                _klsym6(F.col("q_topic_vct"), F.col("d_topic_vct")), F.lit(0.0)
            )
        if "senti_score" in meta_cols:
            senti = F.coalesce(
                _r6(F.abs(F.col("q_senti_score") - F.col("d_senti_score"))),
                F.lit(0.0),
            )
        if "pos_vct" in meta_cols:
            pos = F.coalesce(
                _vct_cos6(F.col("q_pos_vct"), F.col("d_pos_vct")), F.lit(0.0)
            )
        if "asp_vct" in meta_cols:
            aspect = F.coalesce(
                _vct_cos6(F.col("q_asp_vct"), F.col("d_asp_vct")), F.lit(0.0)
            )

    r6 = _r6
    return out.select(
        "query_doc",
        "doc_id",
        r6(F.col("dot") / (F.col("l2") * F.col("q_l2"))).alias("bow_cos"),
        topical.alias("topical_sim"),
        (F.col("label") == F.col("q_label")).cast("int").alias("same_label"),
        r6(
            F.abs(F.col("q_dlen") - F.col("dlen")) / F.col("q_dlen")
        ).alias("len_diff"),
        r6(
            F.col("n_common")
            / (F.col("nterms") + F.col("q_nterms") - F.col("n_common"))
        ).alias("jaccard"),
        senti.alias("senti_diff"),
        pos.alias("pos_sim"),
        aspect.alias("aspect_sim"),
        F.col("stopword_ratio").alias("stopword_prop"),
        r6(F.col("avg_idf")).alias("avg_idf"),
    )


def zscore_features(
    features: DataFrame,
    cols: list[str],
    suffix: str = "_z",
) -> DataFrame:
    """Per-column z-score standardization of a feature table — the
    reference's ranking-feature normalization before L2R training
    (L2RMetricLearning.normalize,
    /root/reference/src/Classifier/metricLearning/
    L2RMetricLearning.java:298-329): x' = (x - mean) / std with the
    POPULATION std sqrt(E[x²] - E[x]²), exactly the reference's
    accumulate-then-divide moments.

    Constant columns (std == 0 — e.g. the disabled feature dims the
    reference emits as all-zero) map to 0.0 instead of the reference's
    silent 0/0 → NaN, so downstream aggregations stay finite. The
    variance term E[x²] − E[x]² is clamped at 0 before the sqrt:
    catastrophic cancellation on a constant column (e.g. all 0.1) can
    leave a tiny NEGATIVE float, and sqrt(negative) = NaN, which Spark
    treats as > 0 — without the clamp such a column would emit NaN
    z-scores instead of the documented 0.0.

    Plan shape: ONE aggregate over the feature table produces the
    2·|cols| moment scalars; they come back as a broadcast literal row
    (crossJoin of a 1-row frame), so the normalization pass is pure
    scan-side column algebra — no shuffle, no second pass keyed by row.
    """
    aggs = []
    for c in cols:
        aggs.append(F.avg(F.col(c)).alias(f"_m_{c}"))
        aggs.append(F.avg(F.col(c) * F.col(c)).alias(f"_s_{c}"))
    stats = features.agg(*aggs)
    out = features.crossJoin(F.broadcast(stats))
    keep = [c for c in features.columns]
    zcols = []
    for c in cols:
        mean = F.col(f"_m_{c}")
        std = F.sqrt(F.greatest(F.col(f"_s_{c}") - mean * mean, F.lit(0.0)))
        zcols.append(
            F.when(std > 0, (F.col(c) - mean) / std)
            .otherwise(F.lit(0.0))
            .alias(f"{c}{suffix}")
        )
    return out.select(*keep, *zcols)
