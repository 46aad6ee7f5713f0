"""L2R metric learning: learned ranking-feature similarity + its
Gaussian Fields composition.

Spark analog of the reference's L2RMetricLearning
(/root/reference/src/Classifier/metricLearning/L2RMetricLearning.java):
a learning-to-rank model (LambdaRank@MAP or RankSVM — both exist here,
ops/lambdarank.py) is trained over the 10-dim pairwise ranking feature
vector (genRankingFV, L2RMetricLearning.java:347-383 = ops/l2r.
ranking_features), and the trained weights then DEFINE the similarity
used by the semi-supervised Gaussian Fields predictor:

    sim(di, dj) = exp( w · normalize(genRankingFV(di, dj)) )

(L2RMetricLearning.getSimilarity, :87-99; normalize is the z-score of
:298-329 = ops/l2r.zscore_features). This module wires that override
chain: `l2r_metric_scores` scores candidate pairs with the learned
metric (once, shared z-moments), `_topk_per_uid` keeps k per node per
side, and `l2r_metric_gaussian_fields` feeds those edges into
gaussian_fields_random_walk via its ul_edges/uu_edges seam.

Deviations (documented; same policy as ops/gaussian_fields.py):
- weights are an input (train them with lambdarank_weights /
  ranksvm_weights, or pin constants) rather than retrained inside the
  op — the reference trains once in train() then scores many pairs.
- sims are rounded to 6 dp so Spark and the SQL oracle rank and weigh
  identically (the same pin as _cos6 edge weights).
- candidate pairs are those sharing >= 1 term (ranking_features'
  sparse-intersection join). The reference scores ALL U x (L+U) pairs
  (PairwiseSimCalculator.java); pairs with no common term have
  bow_cos = jaccard = 0 and in an inverted-index candidate generation
  — the only shape that survives 100 TB — they are simply never
  generated. At scale the candidate pass is the ANN/index route; the
  edge schema is unchanged.

Scale shape: one shuffle keyed (query_doc, doc_id) for the FV build
(ops/l2r.ranking_features), ONE aggregate for the z-moments (broadcast
back as literals), a window top-k per uid, then the bounded
per-iteration join+agg of the propagation. No per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .gaussian_fields import gaussian_fields_random_walk
from .l2r import _r6, ranking_features, zscore_features

FV_COLS = [
    "bow_cos",
    "topical_sim",
    "same_label",
    "len_diff",
    "jaccard",
    "senti_diff",
    "pos_sim",
    "aspect_sim",
    "stopword_prop",
    "avg_idf",
]

# the reference's own learned LambdaRank@MAP weights, kept in its
# source as per-dim comments (L2RMetricLearning.java:347-383) — the
# pinned default for demos/tests; production callers pass weights from
# lambdarank_weights / ranksvm_weights
REFERENCE_WEIGHTS = [
    0.04104, -0.28595, -0.01331, 0.00045, 0.05490,
    -0.09206, 0.02567, -0.03405, -0.05709, 0.05842,
]

# The unlabeled set U is collected to the driver and broadcast as the
# feature build's query side ("queries are a handful of docs"
# contract, l2r.py). Enforced, not assumed — see
# l2r_metric_gaussian_fields.
MAX_UNLABELED = 100_000


def l2r_metric_scores(feats: DataFrame, weights: list[float]) -> DataFrame:
    """(uid, nid, s): every candidate pair scored by the learned metric.

    feats = ranking_features output (query_doc, doc_id, f0..f9).
    s = round6(exp(sum_i w_i * zscore(f_i))) — z-moments come from the
    WHOLE feats table (the reference normalizes with the stats of the
    full pair cache, L2RMetricLearning.java:200-210,298-329), so score
    this ONCE and split/top-k afterwards. The z-values are pinned to
    6 dp before the dot — the same oracle convention as the LambdaRank
    family trainers (ranking_features_z), so Spark and the SQL oracle
    score, rank, and weigh edges identically.
    """
    fz = zscore_features(feats, FV_COLS)
    dot = None
    for w, c in zip(weights, FV_COLS):
        t = F.lit(float(w)) * F.round(F.col(f"{c}_z"), 6)
        dot = t if dot is None else dot + t
    return fz.select(
        F.col("query_doc").alias("uid"),
        F.col("doc_id").alias("nid"),
        _r6(F.exp(dot)).alias("s"),
    )


def _topk_per_uid(scored: DataFrame, k: int) -> DataFrame:
    """Top-k rows per uid by (s desc, nid asc) — the same tie pin as
    the cosine edge builder."""
    win = Window.partitionBy("uid").orderBy(F.col("s").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def l2r_metric_gaussian_fields(
    documents: DataFrame,
    groups: DataFrame,
    labeled: DataFrame,
    weights: list[float] | None = None,
    doc_meta: DataFrame | None = None,
    k: int = 3,
    k_prime: int = 3,
    alpha: float = 1.0,
    beta: float = 0.1,
    eta: float = 0.1,
    iterations: int = 2,
    max_doc_id: int | None = None,
) -> DataFrame:
    """Gaussian Fields prediction under the learned L2R metric — the
    full L2RMetricLearning pipeline shape (train() -> getSimilarity()
    -> GaussianFields predict).

    documents: (doc_id, text, ...); groups: (doc_id, label) — the
    sameProduct-analog attribute available for EVERY doc (reference:
    product id, _Doc.sameProduct); labeled: (doc_id, label) rows for
    the anchor set L — every other doc is U and gets a prediction.
    weights: the 10 learned weights (default: the reference's own
    LambdaRank@MAP constants). doc_meta: optional per-doc
    topic/senti/POS/aspect table (see ranking_features).

    The unlabeled id list drives the FV build's query side and is
    collected to the driver — bounded by the same "queries are a
    handful of docs" contract as ranking_features (at 100 TB the pair
    candidates come from the ANN/index route instead).
    """
    if weights is None:
        weights = REFERENCE_WEIGHTS
    docs = documents
    if max_doc_id is not None:
        docs = docs.filter(F.col("doc_id") < max_doc_id)
    lab = labeled.select(
        F.col("doc_id").alias("id"), F.col("label").cast("double").alias("y")
    )
    unl = docs.select("doc_id").join(
        lab, docs["doc_id"] == lab["id"], "left_anti"
    )
    # Enforce the driver-residency contract instead of assuming it
    # (jobs/query.py::enforce_query_cap pattern): the unlabeled ids
    # drive ranking_features' broadcast query side, so a corpus-sized U
    # would silently collect the corpus to the driver. At real scale
    # the U-side pair candidates come from the ANN/index route
    # (gaussian_fields.py:34-42 seam), not from this FV build.
    n_u = unl.limit(MAX_UNLABELED + 1).count()
    if n_u > MAX_UNLABELED:
        raise ValueError(
            f"l2r_metric_gaussian_fields: unlabeled set exceeds "
            f"{MAX_UNLABELED} docs; the L2R feature build broadcasts "
            f"unlabeled ids as query vectors and is sized for bounded "
            f"query sets. Use the ANN candidate seam "
            f"(gaussian_fields ul_edges/uu_edges injection) for "
            f"corpus-sized U."
        )
    u_ids = [r[0] for r in unl.orderBy("doc_id").collect()]

    feats = ranking_features(
        docs, groups, u_ids, max_doc_id=max_doc_id, doc_meta=doc_meta
    )
    scored = l2r_metric_scores(feats, weights).cache()
    # per-side top-k AFTER the L/U split (the reference keeps k labeled
    # AND k' unlabeled neighbors per node, GaussianFields.java:190-210)
    nlab = lab.select(F.col("id").alias("nid"), F.col("y").alias("ny"))
    ul = _topk_per_uid(
        scored.join(F.broadcast(nlab), "nid"), k
    ).select("uid", "nid", "ny", "s")
    uu = _topk_per_uid(
        scored.join(F.broadcast(nlab), "nid", "left_anti"), k_prime
    ).select("uid", "nid", F.lit(None).cast("double").alias("ny"), "s")

    V = docs.select(F.col("doc_id").alias("vec_id")).join(
        lab.select(F.col("id").alias("vec_id"), F.col("y").alias("label")),
        "vec_id",
        "left",
    )
    return gaussian_fields_random_walk(
        V,
        alpha=alpha,
        beta=beta,
        eta=eta,
        iterations=iterations,
        ul_edges=ul,
        uu_edges=uu,
        label_col="label",
        id_col="vec_id",
    )
