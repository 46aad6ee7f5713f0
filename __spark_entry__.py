"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is a thin adapter over the ir_base_spark library
(operators per SURVEY.md §2 + the large-scale text-pipeline ops); each
``oracle_sql()`` entry is the exact ANSI-SQL/DuckDB equivalent. Computed
columns are rounded (4-6 dp) on BOTH sides so order-of-summation float
noise cannot flip a value hash, and every ranking ranks on the rounded
value with an explicit id tie-break so boundary rows match exactly.

Ops with engine-specific hashing (xxhash64) or Porter2 stemming have no
SQL oracle and rely on the rows-only check plus the pytest suite
(tests/test_rank_identity.py etc.).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BM25_QUERY_TERMS = ["spark", "join", "window"]
BM25_K = 20
WAND_K = 15


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _docs_as_transcripts(documents: DataFrame) -> DataFrame:
    """documents → transcripts shape; conv_id zero-padded so string order
    == numeric doc_id order (stable-ordering contract)."""
    return documents.select(
        F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )


def _bm25_query_pdf(k: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "query_id": ["q-0001"],
            "query_text": [" ".join(BM25_QUERY_TERMS)],
            "k": [k],
        }
    )


# --------------------------------------------------------------- queries

def q_bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full engine path (mapInPandas tokenize → dictionary → BM25 weights
    → scoring join), simple analyzer so DuckDB can replicate exactly."""
    from ir_base_spark.functions.ranking import rank_bounded
    from ir_base_spark.index.build import build_index
    from ir_base_spark.query.dataframe_bm25 import analyze_query_terms, score_all

    t = _docs_as_transcripts(_docs(spark, sf_dir))
    idx = build_index(spark, t, analyzer="simple")
    qt = analyze_query_terms(spark, _bm25_query_pdf(BM25_K), analyzer="simple")
    scores = score_all(idx, qt).withColumn("score6", F.round(F.col("score"), 6))
    # distributed bounded-heap top-k (TakeOrderedAndProject) first, then
    # a window-free positional rank over the k survivors — never a
    # global no-partition WindowExec over every scored doc
    return rank_bounded(
        scores, [F.col("score6").desc(), F.col("conv_id").asc()], BM25_K
    ).select(
        "rank",
        F.col("conv_id").cast("long").alias("doc_id"),
        "score6",
    )


def q_bm25_topk_docs_wand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same ranking through the compressed-block + block-max WAND path."""
    from ir_base_spark.index.blocks import build_block_index
    from ir_base_spark.index.build import build_index
    from ir_base_spark.index.dictionary import assign_doc_ids
    from ir_base_spark.query.dataframe_bm25 import analyze_query_terms
    from ir_base_spark.query.wand import wand_topk

    t = _docs_as_transcripts(_docs(spark, sf_dir))
    idx = build_index(spark, t, analyzer="simple")
    # one conversation-base cumsum shared by the doc-id map and the
    # block encode (each would otherwise run its own eager two-phase
    # cumsum over doc_lens)
    from ir_base_spark.index.dictionary import conv_doc_base

    base = conv_doc_base(idx.doc_lens, num_partitions=8)
    docs = assign_doc_ids(idx.doc_lens, base=base)
    bidx = build_block_index(
        idx, docs, block_size=128, bucket_bits=12, doc_base=base
    )
    # over-fetch, then take the final k on the ROUNDED score: the engine
    # and the oracle must agree on the k-boundary even when raw float
    # summation order differs (rank-on-rounded convention)
    qt = analyze_query_terms(
        spark, _bm25_query_pdf(WAND_K + 10), analyzer="simple"
    )
    out = wand_topk(bidx, qt).select(
        F.col("conv_id").cast("long").alias("doc_id"),
        F.round(F.col("score"), 6).alias("score6"),
    )
    return out.orderBy(F.col("score6").desc(), F.col("doc_id").asc()).limit(WAND_K)


def q_lm_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ir_base_spark.ops.textops import lm_topk

    return lm_topk(_docs(spark, sf_dir), BM25_QUERY_TERMS, mu=800.0, k=BM25_K)


def q_tfidf_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine setFeatureValues('TFIDF', 0) exposed per (doc, term)."""
    from ir_base_spark.index.build import build_index

    t = _docs_as_transcripts(_docs(spark, sf_dir))
    idx = build_index(spark, t, analyzer="simple", scheme="TFIDF")
    return (
        idx.weights.join(F.broadcast(idx.terms.select("term", "term_id")), "term_id")
        .select(
            F.col("conv_id").cast("long").alias("doc_id"),
            "term",
            F.round(F.col("weight"), 9).alias("w"),
        )
    )


def q_bm25_weights_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine setFeatureValues('BM25', 2) — the canonical reference
    pipeline step (TransductiveMain.java:124) with L2 doc norm."""
    from ir_base_spark.index.build import build_index

    t = _docs_as_transcripts(_docs(spark, sf_dir))
    idx = build_index(spark, t, analyzer="simple", scheme="BM25", norm=2)
    return (
        idx.weights.join(F.broadcast(idx.terms.select("term", "term_id")), "term_id")
        .select(
            F.col("conv_id").cast("long").alias("doc_id"),
            "term",
            F.round(F.col("weight"), 9).alias("w"),
        )
    )


def q_tfidf_sublinear_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """setFeatureValues('TFIDF-sublinear', 0) — Analyzer.java:214-234."""
    from ir_base_spark.index.build import build_index

    t = _docs_as_transcripts(_docs(spark, sf_dir))
    idx = build_index(spark, t, analyzer="simple", scheme="TFIDF-SUBLINEAR")
    return (
        idx.weights.join(F.broadcast(idx.terms.select("term", "term_id")), "term_id")
        .select(
            F.col("conv_id").cast("long").alias("doc_id"),
            "term",
            F.round(F.col("weight"), 9).alias("w"),
        )
    )


def q_pln_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """setFeatureValues('PLN', 0) — pivoted length norm, Analyzer.java:
    264-291 (s=0.5)."""
    from ir_base_spark.index.build import build_index

    t = _docs_as_transcripts(_docs(spark, sf_dir))
    idx = build_index(spark, t, analyzer="simple", scheme="PLN")
    return (
        idx.weights.join(F.broadcast(idx.terms.select("term", "term_id")), "term_id")
        .select(
            F.col("conv_id").cast("long").alias("doc_id"),
            "term",
            F.round(F.col("weight"), 9).alias("w"),
        )
    )


def q_bm25_weights_l1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """setFeatureValues('BM25', 1) — L1 doc norm (Analyzer.java:316-321)."""
    from ir_base_spark.index.build import build_index

    t = _docs_as_transcripts(_docs(spark, sf_dir))
    idx = build_index(spark, t, analyzer="simple", scheme="BM25", norm=1)
    return (
        idx.weights.join(F.broadcast(idx.terms.select("term", "term_id")), "term_id")
        .select(
            F.col("conv_id").cast("long").alias("doc_id"),
            "term",
            F.round(F.col("weight"), 9).alias("w"),
        )
    )


def q_lm_topk_addone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet LM with the reference's ADD-ONE background
    (_Corpus.getBackgroundProb, _Corpus.java:161-177)."""
    from ir_base_spark.ops.textops import lm_topk

    return lm_topk(
        _docs(spark, sf_dir), BM25_QUERY_TERMS, mu=800.0, k=BM25_K,
        background="add_one",
    )


def q_feature_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average mutual information (FeatureSelector.MI :119-144, incl. its
    ·DF quirk). Gate compares the FINITE slice: terms with a zero class
    cell score -inf in the reference (Math.log(0)) and DuckDB refuses
    ln(0), so both sides exclude them; the op itself keeps -inf."""
    from ir_base_spark.ops.feature_selection import mutual_info_terms

    out = mutual_info_terms(_docs(spark, sf_dir), _labels(spark, sf_dir))
    return out.filter(F.col("score") != F.lit(float("-inf"))).select(
        "term",
        (F.floor(F.col("score") * 1000000.0 + 0.5) / 1000000.0).alias("score"),
    )


def q_nb_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive Bayes conditional log-probs ln(δ+tf_wc)−ln(tot_c+V·δ) for
    observed (label, term) pairs (NaiveBayes.train, src/Classifier/
    supervised/NaiveBayes.java:70-88)."""
    from ir_base_spark.ops.nb import naive_bayes_train

    priors, cond, _v = naive_bayes_train(
        _docs(spark, sf_dir), _labels(spark, sf_dir)
    )
    return cond.select(
        F.col("label").cast("int").alias("label"),
        "term",
        (F.floor(F.col("logp") * 1000000.0 + 0.5) / 1000000.0).alias("logp6"),
    )


def q_nb_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ir_base_spark.ops.nb import naive_bayes_predict

    return naive_bayes_predict(_docs(spark, sf_dir), _labels(spark, sf_dir))


def _event_rankings(spark: SparkSession, sf_dir: str, max_user: int) -> DataFrame:
    """Shared L2R input: (query=event_type, doc=user_id, label=user_id%4)."""
    return (
        _tbl(spark, sf_dir, "events")
        .filter(F.col("user_id") < max_user)
        .select(
            F.col("event_type").alias("query_id"),
            F.col("user_id").alias("doc_id"),
            (F.col("user_id") % 4).alias("label"),
        )
        .distinct()
    )


def q_ranking_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ir_base_spark.ops.l2r import ranking_pairs

    return ranking_pairs(_event_rankings(spark, sf_dir, max_user=40))


RANKFV_QUERY_DOCS = [0, 1, 2]


def q_ranking_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ir_base_spark.ops.l2r import ranking_features

    return ranking_features(
        _docs(spark, sf_dir),
        _labels(spark, sf_dir),
        RANKFV_QUERY_DOCS,
        max_doc_id=60,
    )


def _predictions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 4-class 'classifier' for the eval ops: predicted
    label = text length mod 4, true label from the labels table."""
    return (
        _docs(spark, sf_dir)
        .select("doc_id", (F.length("text") % 4).cast("int").alias("pred_label"))
        .join(
            _labels(spark, sf_dir).select(
                "doc_id", F.col("label").cast("int").alias("true_label")
            ),
            "doc_id",
        )
    )


def q_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ir_base_spark.evaluate import confusion_matrix

    return confusion_matrix(_predictions(spark, sf_dir))


def q_prf1_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ir_base_spark.evaluate import micro_prf

    return micro_prf(_predictions(spark, sf_dir))


def q_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH→verify→survivors composition (rows-only: minhash banding uses
    xxhash64, not expressible in DuckDB; exact-Jaccard verify is covered
    by the ngram_jaccard ✓SQL entry and tests/test_ops.py)."""
    from ir_base_spark.ops.textops import dedup_near

    return dedup_near(_docs(spark, sf_dir), threshold=0.6)


def q_shuffled_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ir_base_spark.ops.textops import shuffled_sample

    return shuffled_sample(_docs(spark, sf_dir), n=20)


def q_kfold_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ir_base_spark.ops.textops import kfold_assign

    return (
        kfold_assign(_docs(spark, sf_dir), k=5)
        .groupBy("fold")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Labeled-corpus adapter: embeddings.vec_id aligns with
    documents.doc_id in the driver testdata."""
    return _tbl(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "label"
    )


def q_feature_chi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ir_base_spark.ops.feature_selection import chi_square_terms

    return chi_square_terms(_docs(spark, sf_dir), _labels(spark, sf_dir))


def q_feature_ig(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ir_base_spark.ops.feature_selection import info_gain_terms

    return info_gain_terms(_docs(spark, sf_dir), _labels(spark, sf_dir))


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ir_base_spark.ops.textops import token_counts

    return token_counts(_docs(spark, sf_dir))


def q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ir_base_spark.ops.textops import term_stats

    return term_stats(_docs(spark, sf_dir))


def q_term_percentile_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ir_base_spark.ops.textops import term_percentile_slice

    return term_percentile_slice(_docs(spark, sf_dir))


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ir_base_spark.ops.textops import dedup_exact

    return dedup_exact(_docs(spark, sf_dir))


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ir_base_spark.ops.textops import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.5, max_doc_id=200)


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ir_base_spark.ops.textops import minhash_lsh_candidates

    return minhash_lsh_candidates(_docs(spark, sf_dir))


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ir_base_spark.ops.textops import simhash64

    return simhash64(_docs(spark, sf_dir))


def q_pos_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POS-projected adj/adv term vectors (constructPOSSpVct). The
    fixture synthesizes deterministic tags from token shape (suffix
    'ly' → RB, length ≥ 7 → JJ, else NN) — the tagger itself is a
    pluggable upstream; the op consumes any aligned pos_tags column."""
    from ir_base_spark.ops.textops import pos_projection

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 300)
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
        lambda x: x != F.lit(""),
    )
    tagged = d.select(
        "doc_id",
        toks.alias("tokens"),
    ).withColumn(
        "pos_tags",
        F.transform(
            F.col("tokens"),
            lambda t: F.when(t.like("%ly"), F.lit("RB"))
            .when(F.length(t) >= 7, F.lit("JJ"))
            .otherwise(F.lit("NN")),
        ),
    )
    return pos_projection(tagged)


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ir_base_spark.ops.textops import text_stats

    return text_stats(_docs(spark, sf_dir))


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ir_base_spark.ops.textops import langid_en

    return langid_en(_docs(spark, sf_dir))


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ir_base_spark.ops.textops import quality_score

    return quality_score(_docs(spark, sf_dir))


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ir_base_spark.ops.textops import doc_fingerprint

    return doc_fingerprint(_docs(spark, sf_dir))


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ir_base_spark.ops.similarity import cosine_topk

    return cosine_topk(_tbl(spark, sf_dir, "embeddings"), query_vec_id=0, k=10)


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ir_base_spark.ops.similarity import ann_lsh_topk

    return ann_lsh_topk(
        _tbl(spark, sf_dir, "embeddings"), query_vec_id=0, k=10, dim=ANN_DIM
    )


ANN_BATCH_IDS = [0, 1, 2, 3, 4]
ANN_DIM = 64  # testdata embeddings are 64-d; planes must match exactly

DEDUP_EMB_THRESHOLD, DEDUP_EMB_BANDS, DEDUP_EMB_PPB = 0.35, 8, 4
IVF_K, IVF_CLUSTERS, IVF_ITERS, IVF_NPROBE = 10, 4, 2, 2


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup removal: banded hyperplane LSH
    candidates (min-anchor emission), exact-cosine verify, min-id
    survivors — the paraphrase-level dedup of a training pipeline."""
    from ir_base_spark.ops.similarity import dedup_embedding

    return dedup_embedding(
        _tbl(spark, sf_dir, "embeddings"),
        threshold=DEDUP_EMB_THRESHOLD,
        bands=DEDUP_EMB_BANDS,
        planes_per_band=DEDUP_EMB_PPB,
        dim=ANN_DIM,
    )


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: deterministic cosine-KMeans coarse quantizer, nprobe
    nearest inverted lists, exact-cosine re-rank."""
    from ir_base_spark.ops.similarity import ann_ivf_topk

    return ann_ivf_topk(
        _tbl(spark, sf_dir, "embeddings"),
        query_vec_id=0,
        k=IVF_K,
        n_clusters=IVF_CLUSTERS,
        iterations=IVF_ITERS,
        nprobe=IVF_NPROBE,
    )


def q_ann_lsh_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-query ANN over the precomputed bucket table — the scale
    shape (bucket table persisted bucketed-by-write, queries broadcast
    with their Hamming-1 probe buckets)."""
    from ir_base_spark.ops.similarity import ann_bucket_table, ann_lsh_topk_batch

    emb = _tbl(spark, sf_dir, "embeddings")
    bt = ann_bucket_table(emb, dim=ANN_DIM)
    return ann_lsh_topk_batch(emb, ANN_BATCH_IDS, k=10, bucket_table=bt)


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL multimodal metadata decode: the deterministic asset fixture
    carries genuine PNG/JPEG/WAV/GIF container headers; the engine
    parses dimensions/channels/sample-rate/duration from the raw bytes
    (ops/multimodal.decode_headers — no image/audio libraries).
    Missing fields use sentinel -1 so the compared frame has no
    nullable-int columns (oracle-dtype stability)."""
    from ir_base_spark.ops.multimodal import (
        ASSET_DDL,
        asset_header_features,
        make_asset_fixture,
    )

    df = spark.createDataFrame(make_asset_fixture(24), ASSET_DDL)
    out = asset_header_features(df)
    m1 = F.lit(-1)
    return out.select(
        "asset_id", "kind", "format",
        F.coalesce(F.col("width"), m1).alias("width"),
        F.coalesce(F.col("height"), m1).alias("height"),
        F.coalesce(F.col("channels"), m1).alias("channels"),
        F.coalesce(F.col("sample_rate"), m1).alias("sample_rate"),
        F.coalesce(F.col("duration_ms"), m1.cast("long")).alias("duration_ms"),
        "n_bytes",
    )


def _multimodal_sql() -> str:
    """Analytic oracle for multimodal_features: expected header fields
    are restated as arithmetic in the asset id (the fixture embeds
    w=64+i etc.), NOT by running any parser — only the payload byte
    LENGTH comes from the shared fixture generator (the fixture is the
    input data, not the system under test)."""
    from ir_base_spark.ops.multimodal import make_asset_fixture

    vals = []
    for i, kind, payload, _meta in make_asset_fixture(24):
        n = len(payload)
        m = i % 4
        if m == 0:
            row = (i, kind, "png", 64 + i, 32 + 2 * i, 4, -1, -1, n)
        elif m == 1:
            row = (i, kind, "jpeg", 100 + i, 50 + i, 3, -1, -1, n)
        elif m == 2:
            row = (
                i, kind, "wav", -1, -1, 1 + (i % 2), 8000 + 1000 * i,
                250 * (i % 3 + 1), n,
            )
        else:
            row = (i, kind, "gif", 30 + i, 20 + i, -1, -1, -1, n)
        vals.append(
            "({}, '{}', '{}', {}, {}, {}, {}, {}, {})".format(*row)
        )
    return (
        "SELECT CAST(c0 AS BIGINT) AS asset_id, c1 AS kind, c2 AS format, "
        "CAST(c3 AS INTEGER) AS width, CAST(c4 AS INTEGER) AS height, "
        "CAST(c5 AS INTEGER) AS channels, "
        "CAST(c6 AS INTEGER) AS sample_rate, "
        "CAST(c7 AS BIGINT) AS duration_ms, CAST(c8 AS BIGINT) AS n_bytes "
        "FROM (VALUES " + ", ".join(vals) + ") AS t(c0,c1,c2,c3,c4,c5,c6,c7,c8)"
    )


ASPECT_SEEDS = [
    (0, "scan"), (0, "table"), (0, "row"),
    (1, "join"), (1, "hash"), (1, "key"),
    (2, "window"), (2, "agg"), (2, "batch"),
]
ASPECT_K, ASPECT_CHI_SIZE, ASPECT_RATIO, ASPECT_ITERS = 3, 6, 1.0, 2


def q_aspect_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect keyword bootstrapping over the documents table: three
    seeded aspects expanded by two chi-square rounds
    (AspectAnalyzer.BootStrapping, :200-229; the aspect seed file is an
    input DataFrame here)."""
    from ir_base_spark.ops.aspect import aspect_bootstrap
    from ir_base_spark.ops.textops import simple_tokens

    dt = simple_tokens(_docs(spark, sf_dir))
    seeds = spark.createDataFrame(ASPECT_SEEDS, "aspect_id int, term string")
    kw, _asg = aspect_bootstrap(
        dt, seeds, n_aspects=ASPECT_K, chi_size=ASPECT_CHI_SIZE,
        chi_ratio=ASPECT_RATIO, iterations=ASPECT_ITERS,
    )
    return kw


def _aspect_sql() -> str:
    """Iteration-unrolled bootstrap oracle for aspect_keywords."""
    K, ratio = ASPECT_K, repr(ASPECT_RATIO)
    ks = range(K)
    seeds_vals = ", ".join(f"({a}, '{t}')" for a, t in ASPECT_SEEDS)

    # in-order unique-argmax fold (Annotate :112-122), textual
    sel, mx = "-1", "CAST(0 AS BIGINT)"
    for k in ks:
        sel = (
            f"CASE WHEN c{k} > {mx} THEN {k} "
            f"WHEN c{k} = {mx} THEN -1 ELSE {sel} END"
        )
        mx = f"greatest({mx}, c{k})"

    def chi(k):
        a = f"CAST(w{k} AS DOUBLE)"
        nn = "CAST(N AS DOUBLE)"
        cdf = f"CAST(d{k} AS DOUBLE)"
        b = f"(DF - {a})"
        c = f"({cdf} - {a})"
        d = f"({nn} - DF - {cdf} + {a})"
        return (
            f"CASE WHEN DF <= 0 OR {cdf} <= 0 OR DF >= {nn} "
            f"OR {cdf} >= {nn} THEN 0.0 ELSE "
            f"{nn} * ({a} * {d} - {b} * {c}) * ({a} * {d} - {b} * {c}) "
            f"/ {cdf} / ({b} + {d}) / DF / ({c} + {d}) END"
        )

    # sequential chi scan fold over precomputed chi{k} columns
    sid, mxc = "-1", "0.0"
    for k in ks:
        cond = f"chi{k} > {ratio} * ({mxc})"
        sid = f"CASE WHEN {cond} THEN {k} ELSE {sid} END"
        mxc = f"CASE WHEN {cond} THEN chi{k} ELSE ({mxc}) END"

    csum = lambda col: ", ".join(  # noqa: E731
        f"CAST(sum(CASE WHEN aspect_id = {k} THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS {col}{k}"
        for k in ks
    )
    dfsum = " + ".join(f"CAST(w{k} AS DOUBLE)" for k in ks)

    head = f"""
WITH {_TOK_CTE},
dt AS (SELECT DISTINCT doc_id, term FROM tok2),
kw0 AS (SELECT * FROM (VALUES {seeds_vals}) AS t(aspect_id, term))"""
    steps = []
    for i in range(1, ASPECT_ITERS + 1):
        p = i - 1
        steps.append(f""",
ann{i} AS (
  SELECT doc_id, {csum('c')}
  FROM dt JOIN kw{p} USING (term) GROUP BY doc_id
),
asg{i} AS (
  SELECT doc_id, aspect_id FROM (
    SELECT doc_id, {sel} AS aspect_id FROM ann{i}
  ) WHERE aspect_id >= 0
),
dist{i} AS (SELECT CAST(count(*) AS BIGINT) AS N, {csum('d')} FROM asg{i}),
wst{i} AS (
  SELECT term, {csum('w')}
  FROM dt JOIN asg{i} USING (doc_id) GROUP BY term
),
sc{i} AS (
  SELECT term, {", ".join(f"w{k}" for k in ks)}, N,
         {", ".join(f"d{k}" for k in ks)}, ({dfsum}) AS DF
  FROM wst{i} CROSS JOIN dist{i}
),
sch{i} AS (
  SELECT term, {", ".join(chi(k) + f" AS chi{k}" for k in ks)}
  FROM sc{i}
),
cand{i} AS (
  SELECT term, {sid} AS aspect_id, {mxc} AS chi FROM sch{i}
),
top{i} AS (
  SELECT aspect_id, term FROM (
    SELECT *, row_number() OVER (
      PARTITION BY aspect_id ORDER BY chi DESC, term ASC) AS rn
    FROM cand{i} WHERE aspect_id >= 0
  ) WHERE rn <= {ASPECT_CHI_SIZE}
),
kw{i} AS (
  SELECT DISTINCT aspect_id, term FROM (
    SELECT aspect_id, term FROM kw{p}
    UNION ALL SELECT aspect_id, term FROM top{i}
  )
)""")
    tail = f"""
SELECT aspect_id, term FROM kw{ASPECT_ITERS}
"""
    return head + "".join(steps) + tail


def _senti_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, tokens, pos_tags) with the deterministic
    tag rule shared with pos_projection's entry ('%ly'→RB, len>=7→JJ,
    else NN)."""
    d = _docs(spark, sf_dir)
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != ""
    )
    return d.select(
        "doc_id",
        toks.alias("tokens"),
        F.transform(
            toks,
            lambda t: F.when(t.like("%ly"), F.lit("RB"))
            .when(F.length(t) >= 7, F.lit("JJ"))
            .otherwise(F.lit("NN")),
        ).alias("pos_tags"),
    )


def q_sentiword_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SentiWordNet doc scoring: fixture lexicon (SWN line format) →
    reference dictionary fold → per-doc average sentiment
    (SentiWordNet.java:32-139, DocAnalyzer.sentiWordScore:198-220).
    stem=False here so the DuckDB oracle can restate the pipeline; the
    stemmed path is pytest-verified (test_senti)."""
    from ir_base_spark.ops.senti import (
        LEXICON_DDL,
        make_senti_lexicon,
        sentiword_doc_scores,
        sentiwordnet_dictionary,
    )

    lex = spark.createDataFrame(make_senti_lexicon(), LEXICON_DDL)
    d = sentiwordnet_dictionary(lex, stem=False)
    out = sentiword_doc_scores(_senti_tagged(spark, sf_dir), d, stem=False)
    return out.select(
        "doc_id", F.round(F.col("senti_score"), 9).alias("senti_score")
    )


def _senti_sql() -> str:
    """Oracle for sentiword_scores: the dictionary is restated by an
    INDEPENDENT Python fold over the fixture lexicon (VALUES literals);
    tagging, lookup and the average run in SQL."""
    from ir_base_spark.ops.senti import make_senti_lexicon

    senses: dict[str, dict[int, float]] = {}
    for pos, _sid, ps, ns, terms in make_senti_lexicon():
        for tr in terms.split(" "):
            word, rank = tr.split("#")
            w = word.lower()
            w = "NUM" if w.isdigit() else w
            senses.setdefault(f"{w}#{pos}", {})[int(rank)] = ps - ns
    vals = []
    for key, by_rank in sorted(senses.items()):
        score, count = 0.0, 0
        for _r, s in sorted(by_rank.items()):
            if s != 0:
                score += s
                count += 1
            if score != 0:
                score = score / count
        vals.append(f"('{key}', {score!r})")
    return f"""
WITH dict AS (SELECT * FROM (VALUES {", ".join(vals)}) AS d(key, score)),
tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS w
  FROM documents
), tok2 AS (SELECT doc_id, w FROM tok WHERE w <> ''),
keyed AS (
  SELECT doc_id,
         concat(CASE WHEN regexp_matches(w, '^[0-9]+$') THEN 'NUM' ELSE w END,
                '#',
                CASE WHEN w LIKE '%ly' THEN 'r'
                     WHEN length(w) >= 7 THEN 'a'
                     ELSE 'n' END) AS key
  FROM tok2
)
SELECT k.doc_id,
       round(sum(coalesce(d.score, 0.0)) / count(*), 9) AS senti_score
FROM keyed k LEFT JOIN dict d USING (key)
GROUP BY k.doc_id
"""


LDA_K, LDA_ALPHA0, LDA_BETA = 3, 1.0, 1.5
LDA_EM, LDA_VAR, LDA_NEWTON = 2, 2, 2


def q_lda_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variational LDA over the documents table: normalized per-doc
    Dirichlet params after 2 deterministic EM iterations
    (LDA_Variational.java:106-199; seeded init + fixed iteration
    schedule — see ops/lda.py)."""
    from ir_base_spark.ops.lda import lda_variational_train
    from ir_base_spark.ops.textops import token_counts

    tf = token_counts(_docs(spark, sf_dir)).withColumn(
        "tf", F.col("tf").cast("double")
    )
    gamma, _lp, _alpha = lda_variational_train(
        tf, n_topics=LDA_K, alpha0=LDA_ALPHA0, beta=LDA_BETA,
        em_iters=LDA_EM, var_iters=LDA_VAR, newton_steps=LDA_NEWTON,
    )
    gsum = F.col("g_0")
    for k in range(1, LDA_K):
        gsum = gsum + F.col(f"g_{k}")
    return gamma.select(
        "doc_id",
        *[
            F.round(F.col(f"g_{k}") / gsum, 6).alias(f"t_{k}")
            for k in range(LDA_K)
        ],
    )


def _dg_sql(x: str) -> str:
    """SQL text of functions.scalar.digamma — identical op order."""
    x6 = f"(({x}) + 6.0)"
    p = f"(1.0 / ({x6} * {x6}))"
    p2 = (
        f"((((0.004166666666667 * {p} - 0.003968253986254) * {p} "
        f"+ 0.008333333333333) * {p} - 0.083333333333333) * {p})"
    )
    tail = " - ".join(f"1.0 / ({x6} - {i}.0)" for i in range(1, 7))
    return f"({p2} + ln({x6}) - 0.5 / {x6} - {tail})"


def _tg_sql(x: str) -> str:
    """SQL text of functions.scalar.trigamma — identical op order."""
    x6 = f"(({x}) + 6.0)"
    p = f"(1.0 / ({x6} * {x6}))"
    base = (
        f"((((((0.075757575757576 * {p} - 0.033333333333333) * {p} "
        f"+ 0.0238095238095238) * {p} - 0.033333333333333) * {p} "
        f"+ 0.166666666666667) * {p} + 1.0) / {x6} + 0.5 * {p})"
    )
    # recurrence nests exactly like the Java loop (p = 1/(x-i)^2 + p
    # walking i = 1..6): innermost is the base, each step wraps it
    out = base
    for i in range(1, 7):
        out = f"(1.0 / (({x6} - {i}.0) * ({x6} - {i}.0)) + {out})"
    return out


def _lda_newton_sql(tag: str, prev: str, ks) -> list[str]:
    """One-row CTE chain: damped Newton steps on the alpha row.
    ``prev`` carries columns (D, st{k}, a{k})."""
    ctes = []
    cur = prev
    for s in range(1, LDA_NEWTON + 1):
        asum = " + ".join(f"a{k}" for k in ks)
        a_ = f"{tag}s{s}a"
        b_ = f"{tag}s{s}b"
        o_ = f"{tag}s{s}"
        ctes.append(f"""
{a_} AS (
  SELECT *, {_dg_sql(asum)} AS diA, D * {_tg_sql(asum)} AS z
  FROM {cur}
),
{b_} AS (
  SELECT *, {", ".join(
      f"D * (diA - {_dg_sql(f'a{k}')}) + st{k} AS gg{k}, "
      f"-(D * {_tg_sql(f'a{k}')}) AS hh{k}"
      for k in ks)}
  FROM {a_}
),
{o_} AS (
  SELECT D, {", ".join(f"st{k}" for k in ks)},
         {", ".join(
      f"a{k} - 0.001 * (gg{k} - (({' + '.join(f'gg{j} / hh{j}' for j in ks)}) "
      f"/ (1.0 / z + ({' + '.join(f'1.0 / hh{j}' for j in ks)})))) / hh{k} "
      f"AS a{k}"
      for k in ks)}
  FROM {b_}
)""")
        cur = o_
    return ctes


def _lda_sql() -> str:
    """Iteration-unrolled variational-LDA oracle for lda_topics."""
    ks = range(LDA_K)
    a0, bm1 = repr(LDA_ALPHA0), repr(LDA_BETA - 1.0)

    def h(k):
        inner = (
            f"concat(CAST(d AS VARCHAR), '#', w, '#{k}')"
        )
        return (
            f"CAST(CAST(concat('0x', substr(md5({inner}), 1, 8)) AS BIGINT) "
            f"AS DOUBLE) / 4294967296.0"
        )

    rsum = " + ".join(f"r{k}" for k in ks)
    gsum = " + ".join(f"g{k}" for k in ks)

    def gamma_cte(name, ph, alpha_row):
        qs = ", ".join(f"sum(p{k} * v) AS q{k}" for k in ks)
        gs = ", ".join(f"a{k} + q{k} AS g{k}" for k in ks)
        return f"""
{name}q AS (SELECT d, {qs} FROM {ph} GROUP BY d),
{name} AS (SELECT d, {gs} FROM {name}q CROSS JOIN
  (SELECT {", ".join(f"a{k}" for k in ks)} FROM {alpha_row}))"""

    def logphi_cte(name, ph):
        ss = ", ".join(f"{bm1} + sum(p{k} * v) AS s{k}" for k in ks)
        ts = ", ".join(f"sum(s{k}) AS t{k}" for k in ks)
        lps = ", ".join(f"ln(s{k} / t{k}) AS lp{k}" for k in ks)
        return f"""
{name}s AS (SELECT w, {ss} FROM {ph} GROUP BY w),
{name}t AS (SELECT {ts} FROM {name}s),
{name} AS (SELECT w, {lps} FROM {name}s CROSS JOIN {name}t)"""

    def astat_cte(name, gm):
        sts = ", ".join(
            f"sum({_dg_sql(f'g{k}')} - {_dg_sql(gsum)}) AS st{k}" for k in ks
        )
        return f"""
{name} AS (SELECT CAST(count(*) AS DOUBLE) AS D, {sts} FROM {gm})"""

    parts = [f"""
WITH {_TOK_CTE},
tfc AS (SELECT doc_id AS d, term AS w, CAST(count(*) AS DOUBLE) AS v
        FROM tok2 GROUP BY 1, 2),
ph0r AS (
  SELECT d, w, v, {", ".join(f"{a0} + {h(k)} AS r{k}" for k in ks)}
  FROM tfc
),
ph0 AS (
  SELECT d, w, v, {", ".join(f"r{k} / ({rsum}) AS p{k}" for k in ks)}
  FROM ph0r
),
alit AS (SELECT {", ".join(f"{a0} AS a{k}" for k in ks)}),"""]
    parts.append(gamma_cte("gm0", "ph0", "alit") + ",")
    parts.append(logphi_cte("lp0", "ph0") + ",")
    parts.append(astat_cte("ast0", "gm0") + ",")
    parts.append(f"""
al0 AS (SELECT ast0.*, {", ".join(f"{a0} AS a{k}" for k in ks)} FROM ast0),""")
    parts.append(",".join(_lda_newton_sql("nw0", "al0", ks)))
    alpha_row = f"nw0s{LDA_NEWTON}"
    gm, lp = "gm0", "lp0"

    for e in range(1, LDA_EM + 1):
        for t in range(1, LDA_VAR + 1):
            jn = f"jn{e}_{t}"
            xx = f"xx{e}_{t}"
            ph = f"ph{e}_{t}"
            xs = ", ".join(
                f"lp{k} + {_dg_sql(f'g{k}')} AS x{k}" for k in ks
            )
            mx = "greatest(" + ", ".join(f"x{k}" for k in ks) + ")"
            es = " + ".join(f"exp(x{k} - m)" for k in ks)
            parts.append(f""",
{jn} AS (SELECT P.d, P.w, P.v, {", ".join(f"lp{k}" for k in ks)},
               {", ".join(f"g{k}" for k in ks)}
        FROM tfc P JOIN {gm} USING (d) JOIN {lp} USING (w)),
{xx}0 AS (SELECT d, w, v, {xs} FROM {jn}),
{xx} AS (SELECT *, {mx} AS m FROM {xx}0),
{ph} AS (
  SELECT d, w, v,
         {", ".join(f"exp(x{k} - (m + ln({es}))) AS p{k}" for k in ks)}
  FROM {xx}
)""")
            parts.append(",")
            parts.append(gamma_cte(f"gm{e}_{t}", ph, alpha_row))
            gm = f"gm{e}_{t}"
        parts.append(",")
        parts.append(logphi_cte(f"lp{e}", f"ph{e}_{LDA_VAR}"))
        parts.append(",")
        parts.append(astat_cte(f"ast{e}", gm))
        parts.append(f""",
al{e} AS (SELECT ast{e}.*, {", ".join(f"a{k}" for k in ks)}
         FROM ast{e} CROSS JOIN
           (SELECT {", ".join(f"a{k}" for k in ks)} FROM {alpha_row})),""")
        parts.append(",".join(_lda_newton_sql(f"nw{e}", f"al{e}", ks)))
        alpha_row = f"nw{e}s{LDA_NEWTON}"
        lp = f"lp{e}"

    parts.append(f"""
SELECT d AS doc_id,
       {", ".join(f"round(g{k} / ({gsum}), 6) AS t_{k}" for k in ks)}
FROM {gm}
""")
    return "".join(parts)


KM_K, KM_ITERS = 4, 2


def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine-distance KMeans over the embeddings table (deterministic
    Lloyd analog of clustering/KMeansAlg.java:29 + CosineDistance)."""
    from ir_base_spark.ops.kmeans import kmeans_cosine

    v = _tbl(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    out = kmeans_cosine(v, k=KM_K, iterations=KM_ITERS)
    return out.select(
        F.col("id").alias("vec_id"), "cluster", "dist9"
    )


def _kmeans_cte(kk: int, iters: int) -> str:
    """Iteration-unrolled Lloyd CTE chain (shared by the kmeans_clusters
    and ann_ivf_topk oracles): defines X, xn, cent0..cent{iters},
    cn{fin}, and the final assignment asg{fin} where fin = iters + 1."""
    assign_tpl = """
cn{i} AS (SELECT c, sqrt(sum(cval * cval)) AS cn FROM cent{p} GROUP BY c),
dot{i} AS (
  SELECT X.id, cent{p}.c, sum(X.val * cent{p}.cval) AS dot
  FROM X JOIN cent{p} USING (pos) GROUP BY X.id, cent{p}.c
),
dist{i} AS (
  SELECT d.id, d.c, round(1.0 - d.dot / x.xn / n.cn, 9) AS dist
  FROM dot{i} d JOIN cn{i} n USING (c) JOIN xn x USING (id)
),
asg{i} AS (
  SELECT id, c, dist FROM (
    SELECT *, row_number() OVER (
      PARTITION BY id ORDER BY dist ASC, c ASC) AS rn FROM dist{i}
  ) WHERE rn = 1
)"""
    head = f"""
WITH X AS (
  SELECT vec_id AS id,
         unnest(embedding::DOUBLE[]) AS val,
         unnest(range(len(embedding))) AS pos
  FROM embeddings
),
xn AS (SELECT id, sqrt(sum(val * val)) AS xn FROM X GROUP BY id),
seed AS (
  SELECT id, c FROM (
    SELECT id, row_number() OVER (ORDER BY id ASC) - 1 AS c
    FROM (SELECT DISTINCT id FROM X)
  ) WHERE c < {kk}
),
cent0 AS (
  SELECT s.c, X.pos, X.val AS cval FROM X JOIN seed s USING (id)
)"""
    steps = []
    for i in range(1, iters + 1):
        steps.append("," + assign_tpl.format(i=i, p=i - 1) + f""",
newc{i} AS (
  SELECT a.c, X.pos, avg(X.val) AS cval
  FROM X JOIN asg{i} a USING (id) GROUP BY a.c, X.pos
),
cent{i} AS (
  SELECT o.c, o.pos, coalesce(n.cval, o.cval) AS cval
  FROM cent{i - 1} o LEFT JOIN newc{i} n ON o.c = n.c AND o.pos = n.pos
)""")
    fin = iters + 1
    return head + "".join(steps) + "," + assign_tpl.format(i=fin, p=iters)


def _kmeans_sql() -> str:
    """Iteration-unrolled Lloyd oracle for kmeans_clusters."""
    fin = KM_ITERS + 1
    return _kmeans_cte(KM_K, KM_ITERS) + f"""
SELECT id AS vec_id, CAST(c AS INTEGER) AS cluster, dist AS dist9 FROM asg{fin}
"""


def _ann_ivf_sql() -> str:
    """IVF-ANN oracle: the kmeans CTE chain as the coarse quantizer,
    then probe the IVF_NPROBE nearest centroids and exact-rank their
    lists (mirrors ops/similarity.ann_ivf_topk: same dist9/sim6
    rounding, same (dist asc, c asc) and (sim desc, id asc) ties)."""
    fin = IVF_ITERS + 1
    return _kmeans_cte(IVF_CLUSTERS, IVF_ITERS) + f""",
qX AS (SELECT pos, val AS qval FROM X WHERE id = 0),
qn AS (SELECT sqrt(sum(qval * qval)) AS qn FROM qX),
cdot AS (
  SELECT c, sum(cval * qval) AS dot
  FROM cent{IVF_ITERS} JOIN qX USING (pos) GROUP BY c
),
cdist AS (
  SELECT d.c, round(1.0 - d.dot / n.cn / q.qn, 9) AS cdist
  FROM cdot d JOIN cn{fin} n USING (c) CROSS JOIN qn q
),
probes AS (
  SELECT c FROM (
    SELECT c, row_number() OVER (ORDER BY cdist ASC, c ASC) AS rn
    FROM cdist
  ) WHERE rn <= {IVF_NPROBE}
),
cand AS (
  SELECT a.id FROM asg{fin} a JOIN probes USING (c) WHERE a.id <> 0
),
qv AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
sim AS (
  SELECT e.vec_id,
         round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6)
             AS sim6
  FROM embeddings e JOIN cand ON e.vec_id = cand.id CROSS JOIN qv q
),
ranked AS (
  SELECT vec_id, sim6,
         CAST(row_number() OVER (ORDER BY sim6 DESC, vec_id ASC) AS INT)
             AS rank
  FROM sim
)
SELECT rank, vec_id, sim6 FROM ranked WHERE rank <= {IVF_K}
"""


def _dedup_embedding_sql() -> str:
    """Banded hyperplane-LSH near-dup oracle: per-band bucket exprs
    unrolled from the shared seeded hyperplane constants (left-
    associated sums — bit-identical signs to F.aggregate's fold),
    min-anchor candidate emission per band, exact-cosine verify at
    6 dp, min-id survivor rule."""
    from ir_base_spark.ops.similarity import hyperplanes

    planes = hyperplanes(
        n_planes=DEDUP_EMB_BANDS * DEDUP_EMB_PPB, dim=ANN_DIM
    )
    band_ctes = []
    band_selects = []
    for b in range(DEDUP_EMB_BANDS):
        pl = planes[b * DEDUP_EMB_PPB : (b + 1) * DEDUP_EMB_PPB]
        bits = []
        for i, p in enumerate(pl):
            proj = " + ".join(
                f"e[{j + 1}] * ({c!r})" for j, c in enumerate(p)
            )
            bits.append(
                f"(CASE WHEN ({proj}) >= 0 THEN {1 << i} ELSE 0 END)"
            )
        expr = "\n       + ".join(bits)
        band_ctes.append(
            f"s{b} AS (SELECT vec_id, {expr} AS bk FROM emb),\n"
            f"a{b} AS (SELECT bk, min(vec_id) AS vec_a FROM s{b} GROUP BY bk)"
        )
        band_selects.append(
            f"SELECT a{b}.vec_a, s{b}.vec_id AS vec_b\n"
            f"  FROM s{b} JOIN a{b} USING (bk) WHERE s{b}.vec_id > a{b}.vec_a"
        )
    return f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
{",".join(band_ctes)},
cand AS (SELECT DISTINCT vec_a, vec_b FROM ({" UNION ALL ".join(band_selects)})),
verified AS (
  SELECT c.vec_a, c.vec_b
  FROM cand c
  JOIN emb ea ON ea.vec_id = c.vec_a
  JOIN emb eb ON eb.vec_id = c.vec_b
  WHERE round(list_cosine_similarity(ea.e, eb.e), 6) >= {DEDUP_EMB_THRESHOLD!r}
),
dup_of AS (
  SELECT vec_b AS vec_id, min(vec_a) AS dup_of FROM verified GROUP BY vec_b
)
SELECT e.vec_id,
       CAST(CASE WHEN d.dup_of IS NOT NULL THEN 1 ELSE 0 END AS INT)
           AS is_dup,
       d.dup_of
FROM emb e LEFT JOIN dup_of d USING (vec_id)
"""


PR_K, PR_ALPHA, PR_ITERS, PR_MIN = 5, 0.15, 2, 10


def q_pagerank_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PageRank instance weighting: documents grouped by
    source, k-NN softmax similarity digraph over their embeddings,
    damped power iteration, weight = 1 + 10*rank
    (influence/PageRank.java:25,129-168)."""
    from ir_base_spark.ops.pagerank import pagerank_instance_weights

    d = _docs(spark, sf_dir).select("doc_id", "source")
    e = _tbl(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), F.col("embedding").alias("vec")
    )
    v = d.join(e, "doc_id")
    return pagerank_instance_weights(
        v, top_k=PR_K, alpha=PR_ALPHA, iterations=PR_ITERS,
        min_group_size=PR_MIN, group_col="source", id_col="doc_id",
        vec_col="vec",
    )


def _pagerank_sql() -> str:
    """Iteration-unrolled oracle for pagerank_weights."""
    al, oma = repr(PR_ALPHA), repr(1.0 - PR_ALPHA)
    head = f"""
WITH V AS (
  SELECT d.source AS g, d.doc_id AS id, e.embedding::DOUBLE[] AS vec
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
),
sz AS (SELECT g, CAST(count(*) AS BIGINT) AS N FROM V GROUP BY g
       HAVING count(*) > {PR_MIN}),
Vn AS (SELECT V.g, V.id, V.vec, sz.N FROM V JOIN sz USING (g)),
pr AS (
  SELECT a.g, a.id AS src, b.id AS dst,
         round(list_inner_product(a.vec, b.vec), 6) AS s
  FROM Vn a JOIN Vn b ON a.g = b.g AND a.id <> b.id
),
top AS (
  SELECT g, src, dst, s FROM (
    SELECT *, row_number() OVER (
      PARTITION BY g, src ORDER BY s DESC, dst ASC) AS rn FROM pr
  ) WHERE rn <= {PR_K}
),
ed AS (
  SELECT g, src, dst,
         exp(s) / sum(exp(s)) OVER (PARTITION BY g, src) AS w
  FROM top
),
r0 AS (SELECT g, id, N, 1.0 / sqrt(N) AS r FROM Vn)"""
    steps = []
    for i in range(1, PR_ITERS + 1):
        p = i - 1
        steps.append(f""",
inc{i} AS (
  SELECT ed.g, ed.dst, sum(ed.w * r{p}.r) AS infl
  FROM ed JOIN r{p} ON ed.g = r{p}.g AND ed.src = r{p}.id
  GROUP BY ed.g, ed.dst
),
upd{i} AS (
  SELECT n.g, n.id, n.N,
         {al} / n.N + {oma} * coalesce(i.infl, 0.0) AS r
  FROM r{p} n LEFT JOIN inc{i} i ON n.g = i.g AND n.id = i.dst
),
nrm{i} AS (SELECT g, sqrt(sum(r * r)) AS nrm FROM upd{i} GROUP BY g),
r{i} AS (
  SELECT u.g, u.id, u.N, u.r / m.nrm AS r
  FROM upd{i} u JOIN nrm{i} m USING (g)
)""")
    tail = f"""
SELECT g AS source, id AS doc_id, round(r, 6) AS rank6,
       round(1.0 + 10.0 * r, 6) AS weight6
FROM r{PR_ITERS}
"""
    return head + "".join(steps) + tail


PLSA_K, PLSA_ALPHA, PLSA_BETA, PLSA_LAM, PLSA_ITERS = 3, 2.0, 1.5, 0.3, 2


def q_plsa_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pLSA + background LM over the documents table (simple-analyzer
    postings): per-doc topic proportions after 2 deterministic EM
    iterations (pLSA.java:155-216; seeded md5 init replaces
    Math.random — see ops/plsa.py)."""
    from ir_base_spark.ops.plsa import plsa_train
    from ir_base_spark.ops.textops import token_counts

    tf = token_counts(_docs(spark, sf_dir)).withColumn(
        "tf", F.col("tf").cast("double")
    )
    theta, _phi = plsa_train(
        tf, n_topics=PLSA_K, alpha=PLSA_ALPHA, beta=PLSA_BETA,
        lam=PLSA_LAM, iterations=PLSA_ITERS,
    )
    return theta.select(
        "doc_id",
        *[F.round(F.col(f"t_{k}"), 6).alias(f"t_{k}") for k in range(PLSA_K)],
    )


def _plsa_sql() -> str:
    """Iteration-unrolled EM oracle for plsa_topics."""
    K = PLSA_K
    am1 = repr(PLSA_ALPHA - 1.0)
    bm1 = repr(PLSA_BETA - 1.0)
    lam = repr(PLSA_LAM)
    oml = repr(1.0 - PLSA_LAM)

    def h(x):
        return (
            f"CAST(CAST(concat('0x', substr(md5({x}), 1, 8)) AS BIGINT) "
            f"AS DOUBLE) / 4294967296.0"
        )

    ks = range(K)
    tsum = " + ".join(f"ts{k}" for k in ks)
    head = f"""
WITH {_TOK_CTE},
tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
       FROM tok2 GROUP BY 1, 2),
docs AS (SELECT DISTINCT doc_id FROM tf),
vocab AS (SELECT term, sum(tf) AS wtf FROM tf GROUP BY term),
bg AS (SELECT term, ({bm1} + wtf)
         / (SELECT sum({bm1} + wtf) FROM vocab) AS bg FROM vocab),
th0r AS (SELECT doc_id, {", ".join(
    am1 + " + " + h("concat(CAST(doc_id AS VARCHAR), '#t%d')" % k)
    + " AS ts%d" % k
    for k in ks)}
  FROM docs),
th0 AS (SELECT doc_id, {", ".join(
    f"ts{k} / ({tsum}) AS t{k}" for k in ks)} FROM th0r),
ph0r AS (SELECT term, {", ".join(
    bm1 + " + " + h("concat(term, '#p%d')" % k) + " AS ws%d" % k
    for k in ks)}
  FROM vocab),
ph0tot AS (SELECT {", ".join(f"sum(ws{k}) AS wt{k}" for k in ks)} FROM ph0r),
ph0 AS (SELECT term, {", ".join(
    f"ws{k} / wt{k} AS p{k}" for k in ks)} FROM ph0r CROSS JOIN ph0tot)"""
    steps = []
    for i in range(1, PLSA_ITERS + 1):
        p, c = i - 1, i
        sexpr = " + ".join(f"t{k} * p{k}" for k in ks)
        steps.append(f""",
j{c} AS (
  SELECT f.doc_id, f.term, f.tf,
         {", ".join(f"t{k}" for k in ks)}, {", ".join(f"p{k}" for k in ks)},
         bg.bg, ({sexpr}) AS s
  FROM tf f
  JOIN th{p} USING (doc_id) JOIN ph{p} USING (term) JOIN bg USING (term)
),
e{c} AS (
  SELECT doc_id, term, {", ".join(
    f"tf * (1.0 - ({lam} * bg) / ({lam} * bg + {oml} * s)) "
    f"* t{k} * p{k} / s AS e{k}" for k in ks)}
  FROM j{c}
),
th{c}r AS (SELECT doc_id, {", ".join(
    f"{am1} + sum(e{k}) AS ts{k}" for k in ks)} FROM e{c} GROUP BY doc_id),
th{c} AS (SELECT doc_id, {", ".join(
    f"ts{k} / ({tsum}) AS t{k}" for k in ks)} FROM th{c}r),
ph{c}r AS (SELECT term, {", ".join(
    f"{bm1} + sum(e{k}) AS ws{k}" for k in ks)} FROM e{c} GROUP BY term),
ph{c}tot AS (SELECT {", ".join(
    f"sum(ws{k}) AS wt{k}" for k in ks)} FROM ph{c}r),
ph{c} AS (SELECT term, {", ".join(
    f"ws{k} / wt{k} AS p{k}" for k in ks)} FROM ph{c}r CROSS JOIN ph{c}tot)""")
    tail = f"""
SELECT doc_id, {", ".join(f"round(t{k}, 6) AS t_{k}" for k in ks)}
FROM th{PLSA_ITERS}
"""
    return head + "".join(steps) + tail


GF_K, GF_KP, GF_ITERS = 3, 4, 3
GF_ALPHA, GF_BETA, GF_ETA = 1.0, 0.1, 0.1


def q_gaussian_fields_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised Gaussian Fields random-walk label propagation
    over the embeddings table: vec_id % 5 == 0 rows are the labeled
    anchors, the rest receive propagated predictions
    (GaussianFieldsByRandomWalk.java:62, deterministic Jacobi analog)."""
    from ir_base_spark.ops.gaussian_fields import gaussian_fields_random_walk

    emb = _tbl(spark, sf_dir, "embeddings")
    v = emb.withColumn(
        "label",
        F.when(F.col("vec_id") % 5 == 0, F.col("label")).otherwise(
            F.lit(None).cast("int")
        ),
    )
    return gaussian_fields_random_walk(
        v, k=GF_K, k_prime=GF_KP, alpha=GF_ALPHA, beta=GF_BETA, eta=GF_ETA,
        iterations=GF_ITERS,
    )


def _gaussian_fields_sql() -> str:
    """Iteration-unrolled CTE oracle for gaussian_fields_predict."""
    head = f"""
WITH V AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec, label FROM embeddings
),
L AS MATERIALIZED (
  SELECT vec_id, vec, CAST(label AS DOUBLE) AS y FROM V WHERE vec_id % 5 = 0
),
U AS MATERIALIZED (
  SELECT vec_id, vec FROM V WHERE vec_id % 5 <> 0
),
nc AS (SELECT CAST(max(y) AS INT) + 1 AS n FROM L),
ul AS MATERIALIZED (
  SELECT uid, nid, y, s FROM (
    SELECT u.vec_id AS uid, l.vec_id AS nid, l.y,
           round(list_cosine_similarity(u.vec, l.vec), 6) AS s,
           row_number() OVER (
             PARTITION BY u.vec_id
             ORDER BY round(list_cosine_similarity(u.vec, l.vec), 6) DESC,
                      l.vec_id ASC
           ) AS rn
    FROM U u CROSS JOIN L l
  ) WHERE rn <= {GF_K}
),
aggl AS MATERIALIZED (
  SELECT uid, sum(s * y) AS SL, sum(s) AS WL,
         sum(s * y) / sum(s) AS cpred
  FROM ul GROUP BY uid
),
uu AS MATERIALIZED (
  SELECT uid, nid, w FROM (
    SELECT a.vec_id AS uid, b.vec_id AS nid,
           round(list_cosine_similarity(a.vec, b.vec), 6) AS w,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY round(list_cosine_similarity(a.vec, b.vec), 6) DESC,
                      b.vec_id ASC
           ) AS rn
    FROM U a CROSS JOIN U b WHERE a.vec_id <> b.vec_id
  ) WHERE rn <= {GF_KP}
),
p0 AS MATERIALIZED (SELECT uid, cpred AS pred FROM aggl)"""
    steps = []
    for t in range(1, GF_ITERS + 1):
        steps.append(f""",
p{t} AS MATERIALIZED (
  SELECT aggl.uid,
         {GF_ETA} * ({GF_ALPHA} * aggl.SL
                     + {GF_BETA} * coalesce(s.su, 0.0))
             / ({GF_ALPHA} * aggl.WL + {GF_BETA} * coalesce(s.wu, 0.0))
         + {1.0 - GF_ETA} * aggl.cpred AS pred
  FROM aggl LEFT JOIN (
    SELECT uu.uid, sum(uu.w * p{t - 1}.pred) AS su, sum(uu.w) AS wu
    FROM uu JOIN p{t - 1} ON uu.nid = p{t - 1}.uid GROUP BY uu.uid
  ) s ON aggl.uid = s.uid
)""")
    tail = f"""
SELECT vec_id, pred6,
       CAST(least(greatest(CAST(ceil(pred6 - 0.5) AS INT), 0), nc.n - 1)
            AS INT) AS pred_label
FROM (
  SELECT uid AS vec_id, round(pred, 6) AS pred6 FROM p{GF_ITERS}
) CROSS JOIN nc
"""
    return head + "".join(steps) + tail


GFML_K, GFML_KP, GFML_ITERS = 3, 3, 2
GFML_ALPHA, GFML_BETA, GFML_ETA = 1.0, 0.1, 0.1
GFML_MAX_DOC = 60
GFML_LABEL_MOD = 4


def _synthetic_doc_meta(documents: DataFrame) -> DataFrame:
    """Deterministic per-doc meta table (topic_vct / senti_score /
    pos_vct / asp_vct) derived purely from doc_id — the plumbing gate
    for ranking_features' doc_meta seam. The real producers (ops/plsa,
    ops/lda, ops/senti, ops/textops.pos_projection, ops/aspect) carry
    their own CORRECTNESS gates; this entry gates the dim FORMULAS
    (symmetric KL, |Δsenti|, POS/aspect cosine) end-to-end with a
    SQL-expressible input. Mirrors _meta_dim_sqls exactly."""
    d = F.col("doc_id")
    traw = [((d + F.lit(j)) % 5 + 1) for j in range(4)]
    den = traw[0] + traw[1] + traw[2] + traw[3]
    return documents.select(
        "doc_id",
        F.array(*[(t.cast("double") / den) for t in traw]).alias("topic_vct"),
        (((d % 13) - 6) / F.lit(6.0)).alias("senti_score"),
        F.array(
            *[((d * 2 + j) % 4).cast("double") for j in range(4)]
        ).alias("pos_vct"),
        F.array(
            *[((d + 2 * j) % 3).cast("double") for j in range(3)]
        ).alias("asp_vct"),
    )


def q_ranking_features_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """genRankingFV with the topical/senti/POS/aspect dims live (fed
    from the deterministic doc_meta table) instead of the
    disabled-subsystem 0.0 defaults."""
    from ir_base_spark.ops.l2r import ranking_features

    docs = _docs(spark, sf_dir)
    return ranking_features(
        docs,
        _labels(spark, sf_dir),
        RANKFV_QUERY_DOCS,
        max_doc_id=60,
        doc_meta=_synthetic_doc_meta(docs),
    )


def q_l2r_metric_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned-metric pair similarity s = round6(exp(w · z(FV)))
    of L2RMetricLearning.getSimilarity (L2RMetricLearning.java:87-99)
    over the ranking_features candidate pairs, with the reference's own
    LambdaRank@MAP weights."""
    from ir_base_spark.ops.l2r import ranking_features
    from ir_base_spark.ops.metric_learning import (
        REFERENCE_WEIGHTS,
        l2r_metric_scores,
    )

    feats = ranking_features(
        _docs(spark, sf_dir),
        _labels(spark, sf_dir),
        RANKFV_QUERY_DOCS,
        max_doc_id=60,
    )
    return l2r_metric_scores(feats, REFERENCE_WEIGHTS)


def q_l2r_metric_gaussian_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full L2RMetricLearning pipeline: learned-metric similarity
    -> per-side top-k edges -> Gaussian Fields random-walk prediction
    for every unlabeled doc (doc_id % 4 != 0) among docs < 60."""
    from ir_base_spark.ops.metric_learning import l2r_metric_gaussian_fields

    labels = _labels(spark, sf_dir)
    labeled = labels.filter(
        (F.col("doc_id") % GFML_LABEL_MOD == 0)
        & (F.col("doc_id") < GFML_MAX_DOC)
    )
    return l2r_metric_gaussian_fields(
        _docs(spark, sf_dir),
        labels,
        labeled,
        k=GFML_K,
        k_prime=GFML_KP,
        alpha=GFML_ALPHA,
        beta=GFML_BETA,
        eta=GFML_ETA,
        iterations=GFML_ITERS,
        max_doc_id=GFML_MAX_DOC,
    )


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ir_base_spark.ops.relational import pricing_summary

    return pricing_summary(_tbl(spark, sf_dir, "lineitem"))


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ir_base_spark.ops.relational import revenue_by_nation

    return revenue_by_nation(
        _tbl(spark, sf_dir, "customer"),
        _tbl(spark, sf_dir, "orders"),
        _tbl(spark, sf_dir, "lineitem"),
        _tbl(spark, sf_dir, "nation"),
        _tbl(spark, sf_dir, "region"),
    )


def q_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ir_base_spark.ops.relational import top_customers_per_nation

    return top_customers_per_nation(
        _tbl(spark, sf_dir, "customer"),
        _tbl(spark, sf_dir, "orders"),
        _tbl(spark, sf_dir, "nation"),
    )


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ir_base_spark.ops.relational import customers_without_orders

    return customers_without_orders(
        _tbl(spark, sf_dir, "customer"), _tbl(spark, sf_dir, "orders")
    )


def q_priority_distinct_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ir_base_spark.ops.relational import order_priority_distinct_union

    return order_priority_distinct_union(_tbl(spark, sf_dir, "orders"))


def q_user_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ir_base_spark.ops.relational import user_event_sessions

    return user_event_sessions(_tbl(spark, sf_dir, "events"))


def q_ndcg_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ir_base_spark.ops.relational import ndcg_by_event_type

    return ndcg_by_event_type(_tbl(spark, sf_dir, "events"))


TRANSCRIPTS_FIXTURE = dict(n_conversations=100, seed=42, n_queries=25)


def q_transcripts_bm25_wand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-rule flagship: synthetic transcripts (FIXTURES.md), full
    reference analyzer (Porter2 + stopwords + NUM), block index, WAND.

    Porter2/xxhash64 are not expressible in DuckDB SQL, so the oracle
    for this entry is the single-node pure-Python reference engine
    (ir_base_spark/oracle.py) run over the SAME deterministic fixture:
    oracle_sql() renders its expected top-k as a VALUES literal, giving
    the driver a full rows+schema+hash gate instead of rows-only."""
    from ir_base_spark.fixtures import make_fixture
    from ir_base_spark.index.blocks import build_block_index
    from ir_base_spark.index.build import build_index
    from ir_base_spark.index.dictionary import assign_doc_ids
    from ir_base_spark.query.dataframe_bm25 import analyze_query_terms
    from ir_base_spark.query.wand import wand_topk

    fx = make_fixture(**TRANSCRIPTS_FIXTURE)
    t = spark.createDataFrame(fx.transcripts)
    idx = build_index(spark, t)
    docs = assign_doc_ids(idx.doc_lens)
    bidx = build_block_index(idx, docs)
    qt = analyze_query_terms(spark, fx.queries)
    return wand_topk(bidx, qt).select(
        "query_id",
        "rank",
        "conv_id",
        F.col("turn_idx").cast("long").alias("turn_idx"),
        F.round(F.col("score"), 6).alias("score6"),
    )


def q_ranking_features_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """genRankingFV + the reference's z-score normalization
    (L2RMetricLearning.normalize) as a composed op."""
    from ir_base_spark.ops.l2r import ranking_features, zscore_features

    feats = ranking_features(
        _docs(spark, sf_dir),
        _labels(spark, sf_dir),
        RANKFV_QUERY_DOCS,
        max_doc_id=60,
    )
    z = zscore_features(feats, RANKFV_COLS)
    return z.select(
        "query_doc",
        "doc_id",
        *[F.round(F.col(f"{c}_z"), 6).alias(f"{c}_z") for c in RANKFV_COLS],
    )


RANKFV_COLS = [
    "bow_cos", "topical_sim", "same_label", "len_diff", "jaccard",
    "senti_diff", "pos_sim", "aspect_sim", "stopword_prop", "avg_idf",
]


RANKNET_HP = dict(lambda_=1.0, lr=0.5, iters=12, shrinkage=0.9)


LAMBDARANK_HP = dict(rate=0.5, lambda_=1.0, lr=0.5, iters=8, shrinkage=0.9)


RANKSVM_HP = dict(lambda_=1.0, lr=0.5, iters=12, shrinkage=0.9)


LAMBDARANK_PAR_HP = dict(
    workers=4, rate=0.5, lambda_=1.0, lr=0.5, iters=6, shrinkage=0.9
)


def q_ranknet_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RankNet trained on z-scored ranking features: pairs by label,
    difference vectors, deterministic full-batch GD (ops/ranknet.py).
    Output (dim, weight6) — the learned 10-dim model."""
    from ir_base_spark.ops.l2r import ranking_pairs
    from ir_base_spark.ops.ranknet import pair_feature_diffs, ranknet_train

    feats = q_ranking_features_z(spark, sf_dir).cache()
    ranked = (
        feats.select("query_doc", "doc_id")
        .join(_labels(spark, sf_dir), "doc_id")
        .select(
            F.col("query_doc").alias("query_id"), "doc_id", "label"
        )
    )
    pairs = ranking_pairs(ranked)
    zcols = [f"{c}_z" for c in RANKFV_COLS]
    diffs = pair_feature_diffs(
        pairs, feats, zcols, query_col="query_doc", doc_col="doc_id"
    )
    beta = ranknet_train(diffs, zcols, **RANKNET_HP)
    feats.unpersist()
    return spark.createDataFrame(
        [(i, float(round(b, 6))) for i, b in enumerate(beta)],
        "dim int, weight6 double",
    )


def _l2r_training_tables(spark: SparkSession, sf_dir: str):
    """Shared L2R training inputs: z-scored features (cached), the
    labeled per-doc frame, and the pair-difference table — the corpus
    every pairwise trainer entry (RankNet/LambdaRank/RankSVM) consumes.
    """
    from ir_base_spark.ops.l2r import ranking_pairs
    from ir_base_spark.ops.ranknet import pair_feature_diffs

    feats = q_ranking_features_z(spark, sf_dir).cache()
    labeled = (
        feats.select("query_doc", "doc_id")
        .join(_labels(spark, sf_dir), "doc_id")
        .select(F.col("query_doc").alias("query_id"), "doc_id", "label")
    )
    pairs = ranking_pairs(labeled)
    zcols = [f"{c}_z" for c in RANKFV_COLS]
    diffs = pair_feature_diffs(
        pairs, feats, zcols, query_col="query_doc", doc_col="doc_id"
    )
    return feats, labeled, diffs, zcols


def q_lambdarank_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LambdaRank (OT_MAP): pairwise logistic gradients weighted by the
    |ΔMAP| harmonic factor of the current ranking, deterministic
    full-batch descent (ops/lambdarank.py). Output (dim, weight6)."""
    from ir_base_spark.ops.lambdarank import lambdarank_train

    feats, labeled, diffs, zcols = _l2r_training_tables(spark, sf_dir)
    per_doc = labeled.join(
        feats.select(
            F.col("query_doc").alias("query_id"), "doc_id", *zcols
        ),
        ["query_id", "doc_id"],
    )
    beta = lambdarank_train(per_doc, diffs, zcols, **LAMBDARANK_HP)
    feats.unpersist()
    return spark.createDataFrame(
        [(i, float(round(b, 6))) for i, b in enumerate(beta)],
        "dim int, weight6 double",
    )


def q_lambdarank_parallel_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LambdaRankParallel's train/average cycle, deterministic analog:
    md5-hash query partitioning, one full-batch LambdaRank step per
    worker partition per outer iteration, uniform weight averaging
    (ops/lambdarank.lambdarank_parallel_train). Output (dim, weight6)."""
    from ir_base_spark.ops.lambdarank import lambdarank_parallel_train

    feats, labeled, diffs, zcols = _l2r_training_tables(spark, sf_dir)
    per_doc = labeled.join(
        feats.select(
            F.col("query_doc").alias("query_id"), "doc_id", *zcols
        ),
        ["query_id", "doc_id"],
    )
    beta = lambdarank_parallel_train(
        per_doc, diffs, zcols, **LAMBDARANK_PAR_HP
    )
    feats.unpersist()
    return spark.createDataFrame(
        [(i, float(round(b, 6))) for i, b in enumerate(beta)],
        "dim int, weight6 double",
    )


def q_ranksvm_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RankSVM: deterministic full-batch hinge subgradient over the same
    pair-difference table (ops/lambdarank.ranksvm_train). Output
    (dim, weight6)."""
    from ir_base_spark.ops.lambdarank import ranksvm_train

    feats, _labeled, diffs, zcols = _l2r_training_tables(spark, sf_dir)
    beta = ranksvm_train(diffs, zcols, **RANKSVM_HP)
    feats.unpersist()
    return spark.createDataFrame(
        [(i, float(round(b, 6))) for i, b in enumerate(beta)],
        "dim int, weight6 double",
    )


def q_child_ranking_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parent-child composition: each 10-doc group is a 'parent', its
    min-id doc is the sentence, the rest are children ranked by the
    smoothed-LM likelihood (rankChild4StnByLanguageModel)."""
    from ir_base_spark.ops.textops import child_ranking_lm

    d = (
        _docs(spark, sf_dir)
        .filter(F.col("doc_id") < 200)
        .withColumn(
            "parent_id", F.floor(F.col("doc_id") / F.lit(10)).cast("long")
        )
    )
    pick = d.groupBy("parent_id").agg(F.min("doc_id").alias("stn_doc_id"))
    stn = (
        d.join(F.broadcast(pick), "parent_id")
        .filter(F.col("doc_id") == F.col("stn_doc_id"))
        .select("parent_id", F.col("text").alias("stn_text"))
    )
    children = (
        d.join(F.broadcast(pick), "parent_id")
        .filter(F.col("doc_id") != F.col("stn_doc_id"))
        .select("parent_id", F.col("doc_id").alias("child_id"), "text")
    )
    return child_ranking_lm(children, stn, mu=1000.0)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship smoke: engine BM25 top-k over sf0.001 documents."""
    return q_bm25_topk_docs(spark, "/root/testdata/sf0.001")


def _fresh(fn: Callable[[SparkSession, str], DataFrame]):
    """Cache hygiene between registry entries (guide §5; r5 verdict
    task 3): 30+ entries share one JVM in the bench/correctness
    harnesses and several build internal ``cache()``s they cannot
    unpersist themselves (the consumer materializes the returned frame
    AFTER the entry function returns). Leaked storage memory from
    earlier entries competes with the current entry's execution memory
    (measured: 25 persistent RDDs accumulated over 15 entries).
    Clearing at entry START is safe: the previous entry's output was
    already materialized by its caller, and unpersist never changes
    results — only where bytes are recomputed from."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.catalog.clearCache()
        return fn(spark, sf_dir)

    wrapped.__name__ = fn.__name__
    wrapped.__doc__ = fn.__doc__
    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Registry ORDER is deliberate (r5 verdict task 1): the driver's
    # correctness gate has historically verified the first 50 entries,
    # so entries that have never had a driver row (lda_topics,
    # multimodal_features, ann_ivf_topk, dedup_embedding), the r4-last-
    # verified ann_lsh_topk_batch, and the r5-rewritten flagship
    # transcripts_bm25_wand sit INSIDE the window; six stable gates
    # that were driver-green for >= 2 consecutive rounds (three weight-
    # scheme variants, lm add-one variant, single-query ann_lsh_topk vs
    # the batch form, shuffled_sample) rotate past position 50. Every
    # entry keeps its name, implementation, and oracle SQL unchanged.
    reg = {
        "bm25_topk_docs": q_bm25_topk_docs,
        "bm25_topk_docs_wand": q_bm25_topk_docs_wand,
        "transcripts_bm25_wand": q_transcripts_bm25_wand,
        "lm_topk_docs": q_lm_topk_docs,
        "tfidf_weights": q_tfidf_weights,
        "bm25_weights_l2": q_bm25_weights_l2,
        "lda_topics": q_lda_topics,
        "multimodal_features": q_multimodal_features,
        "ann_ivf_topk": q_ann_ivf_topk,
        "dedup_embedding": q_dedup_embedding,
        "ann_lsh_topk_batch": q_ann_lsh_topk_batch,
        "feature_chi": q_feature_chi,
        "feature_ig": q_feature_ig,
        "feature_mi": q_feature_mi,
        "ranking_pairs": q_ranking_pairs,
        "ranking_features": q_ranking_features,
        "ranking_features_z": q_ranking_features_z,
        "ranknet_weights": q_ranknet_weights,
        "lambdarank_weights": q_lambdarank_weights,
        "lambdarank_parallel_weights": q_lambdarank_parallel_weights,
        "ranksvm_weights": q_ranksvm_weights,
        "child_ranking_lm": q_child_ranking_lm,
        "confusion_matrix": q_confusion_matrix,
        "prf1_eval": q_prf1_eval,
        "nb_model": q_nb_model,
        "nb_predict": q_nb_predict,
        "dedup_near": q_dedup_near,
        "kfold_counts": q_kfold_counts,
        "token_counts": q_token_counts,
        "term_stats": q_term_stats,
        "term_percentile_slice": q_term_percentile_slice,
        "dedup_exact": q_dedup_exact,
        "ngram_jaccard": q_ngram_jaccard,
        "minhash_lsh": q_minhash_lsh,
        "simhash": q_simhash,
        "pos_projection": q_pos_projection,
        "text_stats": q_text_stats,
        "langid": q_langid,
        "quality_score": q_quality_score,
        "doc_fingerprint": q_doc_fingerprint,
        "ann_cosine_topk": q_ann_cosine_topk,
        "gaussian_fields_predict": q_gaussian_fields_predict,
        "ranking_features_meta": q_ranking_features_meta,
        "l2r_metric_scores": q_l2r_metric_scores,
        "l2r_metric_gaussian_fields": q_l2r_metric_gaussian_fields,
        "plsa_topics": q_plsa_topics,
        "aspect_keywords": q_aspect_keywords,
        "sentiword_scores": q_sentiword_scores,
        "pagerank_weights": q_pagerank_weights,
        "kmeans_clusters": q_kmeans_clusters,
        "lm_topk_addone": q_lm_topk_addone,
        "tfidf_sublinear_weights": q_tfidf_sublinear_weights,
        "pln_weights": q_pln_weights,
        "bm25_weights_l1": q_bm25_weights_l1,
        "ann_lsh_topk": q_ann_lsh_topk,
        "shuffled_sample": q_shuffled_sample,
        "pricing_summary": q_pricing_summary,
        "revenue_by_nation": q_revenue_by_nation,
        "top_customers_per_nation": q_top_customers_per_nation,
        "customers_without_orders": q_customers_without_orders,
        "priority_distinct_union": q_priority_distinct_union,
        "user_event_sessions": q_user_event_sessions,
        "ndcg_by_event_type": q_ndcg_by_event_type,
    }
    return {name: _fresh(fn) for name, fn in reg.items()}


# ------------------------------------------------------------ oracle SQL

_TOK_CTE = """
tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents
), tok2 AS (SELECT doc_id, term FROM tok WHERE term <> '')
"""

_BM25_CTE = (
    _TOK_CTE
    + """,
tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM tok2 GROUP BY 1, 2),
dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
st AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS navg FROM dl),
dfx AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
q(term) AS (VALUES ('spark'), ('join'), ('window')),
sc AS (
  SELECT tf.doc_id,
         sum(ln((st.n - dfx.df + 0.5) / (dfx.df + 0.5)) * tf.tf * 2.5
             / (1.5 * (0.25 + 0.75 * dl.dl / st.navg) + tf.tf)) AS score
  FROM tf
  JOIN q USING (term)
  JOIN dfx USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN st
  GROUP BY tf.doc_id
)
"""
)


def _ann_lsh_sql(query_ids: list[int], k: int, single: bool,
                 n_planes: int = 8, dim: int = ANN_DIM) -> str:
    """LSH-ANN oracle with the Spark plan's deterministic hyperplane
    constants unrolled as left-associated sums (bit-identical projection
    signs across engines — F.aggregate folds left-to-right too)."""
    from ir_base_spark.ops.similarity import hyperplanes

    planes = hyperplanes(n_planes=n_planes, dim=dim)
    bucket_terms = []
    for i, pl in enumerate(planes):
        proj = " + ".join(f"e[{j + 1}] * ({c!r})" for j, c in enumerate(pl))
        bucket_terms.append(
            f"(CASE WHEN ({proj}) >= 0 THEN {1 << i} ELSE 0 END)"
        )
    bucket_expr = "\n       + ".join(bucket_terms)
    qvals = ", ".join(f"({i})" for i in query_ids)
    probe_list = ", ".join(
        ["qbucket"] + [f"xor(qbucket, {1 << i})" for i in range(n_planes)]
    )
    head = (
        "SELECT rank, vec_id, sim6"
        if single
        else "SELECT query_id, rank, vec_id, sim6"
    )
    return f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
b AS (SELECT vec_id, e, {bucket_expr} AS bucket FROM emb),
qids AS (SELECT CAST(query_id AS BIGINT) AS query_id
         FROM (VALUES {qvals}) v(query_id)),
qb AS (SELECT q.query_id, b.e AS qv, b.bucket AS qbucket
       FROM b JOIN qids q ON b.vec_id = q.query_id),
probes AS (SELECT query_id, qv, unnest([{probe_list}]) AS bucket FROM qb),
cand AS (
  SELECT p.query_id, b.vec_id, b.e, p.qv
  FROM b JOIN probes p USING (bucket)
  WHERE b.vec_id <> p.query_id
),
sim AS (SELECT query_id, vec_id,
               round(list_cosine_similarity(e, qv), 6) AS sim6
        FROM cand),
ranked AS (
  SELECT query_id, vec_id, sim6,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY sim6 DESC, vec_id ASC) AS INT)
             AS rank
  FROM sim
)
{head} FROM ranked WHERE rank <= {k}
"""


def _stopword_in_list() -> str:
    from ir_base_spark.text.stopwords import RAW_STOPWORDS

    words = sorted({w for w in RAW_STOPWORDS if "'" not in w})
    return ", ".join(f"'{w}'" for w in words)


_TEXT_STATS_SQL = (
    "WITH "
    + _TOK_CTE
    + f""",
per AS (
  SELECT doc_id,
         count(*) AS n_tokens,
         round(avg(length(term)), 6) AS mean_tok_len,
         round(avg(CASE WHEN term IN ({{STOP}}) THEN 1.0 ELSE 0.0 END), 6)
             AS stopword_ratio,
         round(avg(CASE WHEN regexp_matches(term, '^[0-9]+$') THEN 1.0
                        ELSE 0.0 END), 6) AS digit_ratio
  FROM tok2 GROUP BY doc_id
)
"""
)


def _transcripts_golden_sql() -> str:
    """Expected top-k of the flagship transcripts entry as a VALUES
    literal, computed by the single-node pure-Python oracle engine
    (ir_base_spark/oracle.py — the formalization of the reference's
    retrieval semantics) over the same deterministic fixture. DuckDB
    then just SELECTs the literal — the driver's rows+schema+hash gate
    applies in full to the Porter2/WAND path it cannot express in SQL."""
    from ir_base_spark.fixtures import make_fixture
    from ir_base_spark.oracle import build_oracle_index, search_all

    fx = make_fixture(**TRANSCRIPTS_FIXTURE)
    docs = [
        ((r.conv_id, int(r.turn_idx)), r.text)
        for r in fx.transcripts.itertuples()
    ]
    idx = build_oracle_index(docs)
    rows = search_all(
        idx,
        list(
            zip(
                fx.queries["query_id"],
                fx.queries["query_text"],
                fx.queries["k"],
            )
        ),
    )
    vals = ",\n".join(
        "('{}', {}, '{}', {}, {!r})".format(
            qid.replace("'", "''"),
            rank,
            conv.replace("'", "''"),
            turn,
            round(score, 6),
        )
        for qid, rank, conv, turn, score in rows
    )
    return f"""
SELECT query_id,
       CAST(rank AS INT) AS rank,
       conv_id,
       CAST(turn_idx AS BIGINT) AS turn_idx,
       CAST(score6 AS DOUBLE) AS score6
FROM (VALUES
{vals}
) t(query_id, rank, conv_id, turn_idx, score6)
"""


def _meta_topic_sql(idc: str) -> list[str]:
    """The deterministic 4-dim doc-topic distribution used by the
    doc_meta entries, as SQL exprs over an id column: raw_j =
    (id + j) % 5 + 1, normalized to sum 1 (all-positive, so symmetric
    KL is defined everywhere)."""
    raws = [f"(({idc} + {j}) % 5 + 1)" for j in range(4)]
    den = " + ".join(raws)
    return [f"(CAST({r} AS DOUBLE) / ({den}))" for r in raws]


def _meta_vct_sql(idc: str, mult: int, step: int, mod: int, dims: int) -> list[str]:
    return [
        f"CAST(({idc} * {mult} + {step * j}) % {mod} AS DOUBLE)"
        for j in range(dims)
    ]


def _sql_r6(expr: str) -> str:
    return f"floor(({expr}) * 1000000.0 + 0.5) / 1000000.0"


def _sql_cos6(q: list[str], d: list[str]) -> str:
    """Mirror of ops/l2r._vct_cos6(q, d): left-assoc dot and norms,
    dot / |q| / |d| in that division order, either zero norm -> 0."""
    dot = " + ".join(f"{a} * {b}" for a, b in zip(q, d))
    na = "sqrt(" + " + ".join(f"{a} * {a}" for a in q) + ")"
    nb = "sqrt(" + " + ".join(f"{b} * {b}" for b in d) + ")"
    return (
        f"CASE WHEN {na} = 0 OR {nb} = 0 THEN 0.0 "
        f"ELSE {_sql_r6(f'({dot}) / {na} / {nb}')} END"
    )


def _meta_dim_sqls(qid: str, did: str) -> dict[str, str]:
    """The four doc_meta feature dims (topical/senti/POS/aspect) as SQL
    scalar exprs over the pair (query id col, doc id col) — the same
    deterministic per-doc meta the Spark side builds in
    _synthetic_doc_meta, folded to scalars since every value derives
    from doc_id alone."""
    tq, td = _meta_topic_sql(qid), _meta_topic_sql(did)
    kl = " + ".join(
        f"({q} - {d}) * ln({q} / {d})" for q, d in zip(tq, td)
    )
    senti_q = f"((({qid} % 13) - 6) / 6.0)"
    senti_d = f"((({did} % 13) - 6) / 6.0)"
    return {
        "topical_sim": _sql_r6(f"({kl}) / 4"),
        "senti_diff": _sql_r6(f"abs({senti_q} - {senti_d})"),
        "pos_sim": _sql_cos6(
            _meta_vct_sql(qid, 2, 1, 4, 4), _meta_vct_sql(did, 2, 1, 4, 4)
        ),
        "aspect_sim": _sql_cos6(
            _meta_vct_sql(qid, 1, 2, 3, 3), _meta_vct_sql(did, 1, 2, 3, 3)
        ),
    }


def _ranking_features_sql(stop: str, qdocs: str, meta: bool = False) -> str:
    """genRankingFV oracle over documents < 60, parametrized by the
    query-doc id list (the metric-learning entries re-render it with
    the unlabeled id set). meta=True swaps the disabled-subsystem 0.0
    dims for the deterministic doc_meta formulas (_meta_dim_sqls)."""
    if meta:
        dims = _meta_dim_sqls("i.query_doc", "i.doc_id")
    else:
        dims = {k: "0.0" for k in
                ("topical_sim", "senti_diff", "pos_sim", "aspect_sim")}
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents WHERE doc_id < 60
), tok2 AS (SELECT doc_id, term FROM tok WHERE term <> ''),
tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM tok2 GROUP BY 1, 2),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents WHERE doc_id < 60),
dfx AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
stats AS (SELECT doc_id, sum(tf) AS dlen, sqrt(sum(tf * tf)) AS l2,
                 count(*) AS nterms
          FROM tf GROUP BY doc_id),
aidf AS (SELECT doc_id, avg(ln((nn.n + 1.0) / dfx.df)) AS avg_idf
         FROM tf JOIN dfx USING (term) CROSS JOIN nn GROUP BY doc_id),
sprop AS (SELECT doc_id,
                 round(avg(CASE WHEN term IN ({stop}) THEN 1.0 ELSE 0.0 END), 6)
                     AS stopword_ratio
          FROM tok2 GROUP BY doc_id),
lab AS (SELECT vec_id AS doc_id, label FROM embeddings),
qtf AS (SELECT doc_id AS query_doc, term, tf AS qtf FROM tf
        WHERE doc_id IN ({qdocs})),
qstats AS (SELECT doc_id AS query_doc, dlen AS q_dlen, l2 AS q_l2,
                  nterms AS q_nterms
           FROM stats WHERE doc_id IN ({qdocs})),
qlab AS (SELECT doc_id AS query_doc, label AS q_label FROM lab
         WHERE doc_id IN ({qdocs})),
inter AS (
  SELECT qtf.query_doc, tf.doc_id,
         sum(tf.tf * qtf.qtf) AS dot, count(*) AS n_common
  FROM tf JOIN qtf USING (term)
  WHERE tf.doc_id <> qtf.query_doc
  GROUP BY 1, 2
)
SELECT i.query_doc, i.doc_id,
       floor(i.dot / (s.l2 * qs.q_l2) * 1000000.0 + 0.5) / 1000000.0 AS bow_cos,
       {dims["topical_sim"]} AS topical_sim,
       CAST(l.label = ql.q_label AS INT) AS same_label,
       floor(abs(qs.q_dlen - s.dlen) / qs.q_dlen * 1000000.0 + 0.5)
           / 1000000.0 AS len_diff,
       floor(CAST(i.n_common AS DOUBLE)
             / (s.nterms + qs.q_nterms - i.n_common) * 1000000.0 + 0.5)
           / 1000000.0 AS jaccard,
       {dims["senti_diff"]} AS senti_diff,
       {dims["pos_sim"]} AS pos_sim,
       {dims["aspect_sim"]} AS aspect_sim,
       sp.stopword_ratio AS stopword_prop,
       floor(a.avg_idf * 1000000.0 + 0.5) / 1000000.0 AS avg_idf
FROM inter i
JOIN stats s ON s.doc_id = i.doc_id
JOIN qstats qs ON qs.query_doc = i.query_doc
JOIN aidf a ON a.doc_id = i.doc_id
JOIN sprop sp ON sp.doc_id = i.doc_id
JOIN lab l ON l.doc_id = i.doc_id
JOIN qlab ql ON ql.query_doc = i.query_doc
"""


def _l2r_metric_dot_sql() -> str:
    """w · round6(zscore(f)) as a SQL expr over an rf row joined with
    the mom moments row — the same std>0 guard, variance clamp, and
    6-dp z pin as the Spark op (ops/metric_learning.l2r_metric_scores)."""
    from ir_base_spark.ops.metric_learning import FV_COLS, REFERENCE_WEIGHTS

    terms = []
    for w, c in zip(REFERENCE_WEIGHTS, FV_COLS):
        std = f"sqrt(greatest(s_{c} - m_{c} * m_{c}, 0.0))"
        z = (
            f"CASE WHEN {std} > 0 "
            f"THEN round(({c} - m_{c}) / {std}, 6) ELSE 0.0 END"
        )
        terms.append(f"({w!r} * {z})")
    return " + ".join(terms)


def _l2r_metric_scores_sql(rf_sql: str, moments: str) -> str:
    return f"""
WITH rf AS ({rf_sql}),
mom AS (SELECT {moments} FROM rf)
SELECT rf.query_doc AS uid, rf.doc_id AS nid,
       {_sql_r6(f'exp({_l2r_metric_dot_sql()})')} AS s
FROM rf CROSS JOIN mom
"""


def _l2r_metric_gf_sql(rf_sql: str, moments: str) -> str:
    """Full L2RMetricLearning -> GaussianFields oracle: score every
    candidate pair with the learned metric, split L/U, per-side top-k,
    then the iteration-unrolled Jacobi propagation (the same CTE
    pattern as _gaussian_fields_sql)."""
    head = f"""
WITH rf AS ({rf_sql}),
mom AS (SELECT {moments} FROM rf),
sc AS MATERIALIZED (
  SELECT rf.query_doc AS uid, rf.doc_id AS nid,
         {_sql_r6(f'exp({_l2r_metric_dot_sql()})')} AS s
  FROM rf CROSS JOIN mom
),
lab AS MATERIALIZED (
  SELECT vec_id AS id, CAST(label AS DOUBLE) AS y FROM embeddings
  WHERE vec_id < 60 AND vec_id % 4 = 0
),
nc AS (SELECT CAST(max(y) AS INT) + 1 AS n FROM lab),
ul AS (
  SELECT uid, nid, ny, s FROM (
    SELECT sc.uid, sc.nid, lab.y AS ny, sc.s,
           row_number() OVER (
             PARTITION BY sc.uid ORDER BY sc.s DESC, sc.nid ASC
           ) AS rn
    FROM sc JOIN lab ON sc.nid = lab.id
  ) WHERE rn <= {GFML_K}
),
aggl AS MATERIALIZED (
  SELECT uid, sum(s * ny) AS SL, sum(s) AS WL,
         sum(s * ny) / sum(s) AS cpred
  FROM ul GROUP BY uid
),
uu AS MATERIALIZED (
  SELECT uid, nid, w FROM (
    SELECT sc.uid, sc.nid, sc.s AS w,
           row_number() OVER (
             PARTITION BY sc.uid ORDER BY sc.s DESC, sc.nid ASC
           ) AS rn
    FROM sc WHERE sc.nid NOT IN (SELECT id FROM lab)
  ) WHERE rn <= {GFML_KP}
),
p0 AS MATERIALIZED (SELECT uid, cpred AS pred FROM aggl)"""
    steps = []
    for t in range(1, GFML_ITERS + 1):
        steps.append(f""",
p{t} AS MATERIALIZED (
  SELECT aggl.uid,
         {GFML_ETA} * ({GFML_ALPHA} * aggl.SL
                     + {GFML_BETA} * coalesce(s.su, 0.0))
             / ({GFML_ALPHA} * aggl.WL + {GFML_BETA} * coalesce(s.wu, 0.0))
         + {1.0 - GFML_ETA} * aggl.cpred AS pred
  FROM aggl LEFT JOIN (
    SELECT uu.uid, sum(uu.w * p{t - 1}.pred) AS su, sum(uu.w) AS wu
    FROM uu JOIN p{t - 1} ON uu.nid = p{t - 1}.uid GROUP BY uu.uid
  ) s ON aggl.uid = s.uid
)""")
    tail = f"""
SELECT vec_id, pred6,
       CAST(least(greatest(CAST(ceil(pred6 - 0.5) AS INT), 0), nc.n - 1)
            AS INT) AS pred_label
FROM (
  SELECT uid AS vec_id, round(pred, 6) AS pred6 FROM p{GFML_ITERS}
) CROSS JOIN nc
"""
    return head + "".join(steps) + tail


def oracle_sql() -> dict[str, str]:
    stop = _stopword_in_list()
    text_stats_cte = _TEXT_STATS_SQL.replace("{STOP}", stop)
    qdocs = ", ".join(str(i) for i in RANKFV_QUERY_DOCS)
    orc = {
        "bm25_topk_docs": f"""
WITH {_BM25_CTE}
SELECT CAST(row_number() OVER (ORDER BY round(score, 6) DESC, doc_id ASC) AS INT)
           AS rank,
       doc_id,
       round(score, 6) AS score6
FROM sc
QUALIFY rank <= {BM25_K}
""",
        "bm25_topk_docs_wand": f"""
WITH {_BM25_CTE}
SELECT doc_id, round(score, 6) AS score6
FROM sc
ORDER BY round(score, 6) DESC, doc_id ASC
LIMIT {WAND_K}
""",
        "lm_topk_docs": f"""
WITH {_TOK_CTE},
tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM tok2 GROUP BY 1, 2),
dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
tot AS (SELECT sum(tf) AS T FROM tf),
p AS (SELECT term, sum(tf) / (SELECT T FROM tot) AS p FROM tf GROUP BY term),
q(term) AS (VALUES ('spark'), ('join'), ('window')),
qp AS (SELECT p.term, p.p FROM p JOIN q USING (term)),
pairs AS (SELECT dl.doc_id, dl.dl, qp.term, qp.p FROM dl CROSS JOIN qp),
m AS (
  SELECT pairs.doc_id, pairs.dl, pairs.p, coalesce(tf.tf, 0.0) AS tf
  FROM pairs LEFT JOIN tf ON tf.doc_id = pairs.doc_id AND tf.term = pairs.term
),
sc AS (
  SELECT doc_id, round(sum(ln((tf + 800.0 * p) / (dl + 800.0))), 6) AS score6
  FROM m GROUP BY doc_id
)
SELECT CAST(row_number() OVER (ORDER BY score6 DESC, doc_id ASC) AS INT) AS rank,
       doc_id, score6
FROM sc
QUALIFY rank <= {BM25_K}
""",
        "tfidf_weights": f"""
WITH {_TOK_CTE},
tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM tok2 GROUP BY 1, 2),
dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
st AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM dl),
dfx AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1)
SELECT tf.doc_id, tf.term,
       round((tf.tf / dl.dl) * ln((st.n + 1.0) / dfx.df), 9) AS w
FROM tf JOIN dl USING (doc_id) JOIN dfx USING (term) CROSS JOIN st
""",
        "bm25_weights_l2": f"""
WITH {_TOK_CTE},
tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM tok2 GROUP BY 1, 2),
dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
st AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS navg FROM dl),
dfx AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
wgt AS (
  SELECT tf.doc_id, tf.term,
         ln((st.n - dfx.df + 0.5) / (dfx.df + 0.5)) * tf.tf * 2.5
         / (1.5 * (0.25 + 0.75 * dl.dl / st.navg) + tf.tf) AS w
  FROM tf JOIN dl USING (doc_id) JOIN dfx USING (term) CROSS JOIN st
)
SELECT doc_id, term,
       round(w / sqrt(sum(w * w) OVER (PARTITION BY doc_id)), 9) AS w
FROM wgt
""",
        "lm_topk_addone": f"""
WITH {_TOK_CTE},
tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM tok2 GROUP BY 1, 2),
dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
ttf AS (SELECT term, sum(tf) AS ttf FROM tf GROUP BY term),
tot AS (SELECT sum(ttf) AS T, CAST(count(*) AS DOUBLE) AS V FROM ttf),
p AS (SELECT term, (1.0 + ttf) / (tot.T + tot.V) AS p FROM ttf CROSS JOIN tot),
q(term) AS (VALUES ('spark'), ('join'), ('window')),
qp AS (SELECT p.term, p.p FROM p JOIN q USING (term)),
pairs AS (SELECT dl.doc_id, dl.dl, qp.term, qp.p FROM dl CROSS JOIN qp),
m AS (
  SELECT pairs.doc_id, pairs.dl, pairs.p, coalesce(tf.tf, 0.0) AS tf
  FROM pairs LEFT JOIN tf ON tf.doc_id = pairs.doc_id AND tf.term = pairs.term
),
sc AS (
  SELECT doc_id, round(sum(ln((tf + 800.0 * p) / (dl + 800.0))), 6) AS score6
  FROM m GROUP BY doc_id
)
SELECT CAST(row_number() OVER (ORDER BY score6 DESC, doc_id ASC) AS INT) AS rank,
       doc_id, score6
FROM sc
QUALIFY rank <= {BM25_K}
""",
        "tfidf_sublinear_weights": f"""
WITH {_TOK_CTE},
tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM tok2 GROUP BY 1, 2),
dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
st AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM dl),
dfx AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1)
SELECT tf.doc_id, tf.term,
       round((1.0 + log10(tf.tf)) * (1.0 + log10(st.n / dfx.df)), 9) AS w
FROM tf JOIN dfx USING (term) CROSS JOIN st
""",
        "pln_weights": f"""
WITH {_TOK_CTE},
tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM tok2 GROUP BY 1, 2),
dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
st AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS navg FROM dl),
dfx AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1)
SELECT tf.doc_id, tf.term,
       round(((1.0 + ln(1.0 + ln(tf.tf)))
              / (0.5 + 0.5 * dl.dl / st.navg))
             * ln((st.n + 1.0) / dfx.df), 9) AS w
FROM tf JOIN dl USING (doc_id) JOIN dfx USING (term) CROSS JOIN st
""",
        "bm25_weights_l1": f"""
WITH {_TOK_CTE},
tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM tok2 GROUP BY 1, 2),
dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
st AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS navg FROM dl),
dfx AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
wgt AS (
  SELECT tf.doc_id, tf.term,
         ln((st.n - dfx.df + 0.5) / (dfx.df + 0.5)) * tf.tf * 2.5
         / (1.5 * (0.25 + 0.75 * dl.dl / st.navg) + tf.tf) AS w
  FROM tf JOIN dl USING (doc_id) JOIN dfx USING (term) CROSS JOIN st
)
SELECT doc_id, term,
       round(CASE WHEN sum(abs(w)) OVER (PARTITION BY doc_id) > 0
                  THEN w / sum(abs(w)) OVER (PARTITION BY doc_id)
                  ELSE w END, 9) AS w
FROM wgt
""",
        "feature_mi": f"""
WITH {_TOK_CTE},
dt AS (SELECT DISTINCT doc_id, term FROM tok2),
lab AS (SELECT vec_id AS doc_id, label FROM embeddings),
nn AS (SELECT count(*) AS n FROM lab),
cls AS (SELECT label, count(*) AS n_c FROM lab GROUP BY label),
tc AS (SELECT term, label, count(*) AS df_tc
       FROM dt JOIN lab USING (doc_id) GROUP BY 1, 2),
tdf AS (SELECT term, CAST(sum(df_tc) AS BIGINT) AS df FROM tc GROUP BY 1),
grid AS (
  SELECT t.term, c.label, coalesce(tc.df_tc, 0) AS df_tc,
         t.df, c.n_c, (SELECT n FROM nn) AS n
  FROM tdf t CROSS JOIN cls c
  LEFT JOIN tc ON tc.term = t.term AND tc.label = c.label
),
gf AS (SELECT * FROM grid WHERE df > 1 AND df < n * 0.8)
SELECT term,
       floor(sum(ln(df_tc * n / n_c * df) * (n_c / n)) * 1000000.0 + 0.5)
           / 1000000.0 AS score
FROM gf GROUP BY term
HAVING min(df_tc) > 0
""",
        "ranking_pairs": """
WITH r AS (
  SELECT DISTINCT event_type AS query_id, user_id AS doc_id,
         user_id % 4 AS label
  FROM events WHERE user_id < 40
),
p AS (
  SELECT a.query_id, a.doc_id AS doc_a, a.label AS la,
         b.doc_id AS doc_b, b.label AS lb
  FROM r a JOIN r b
    ON a.query_id = b.query_id AND a.doc_id < b.doc_id AND a.label <> b.label
)
SELECT query_id,
       CASE WHEN la > lb THEN doc_a ELSE doc_b END AS better_doc,
       CASE WHEN la > lb THEN doc_b ELSE doc_a END AS worse_doc
FROM p
""",
        "ranking_features": _ranking_features_sql(stop, qdocs),
        "confusion_matrix": """
SELECT CAST(length(text) % 4 AS INT) AS pred_label,
       CAST(label AS INT) AS true_label,
       count(*) AS n
FROM documents
JOIN (SELECT vec_id AS doc_id, label FROM embeddings) USING (doc_id)
GROUP BY 1, 2
""",
        "prf1_eval": """
WITH cm AS (
  SELECT CAST(length(text) % 4 AS INT) AS pred_label,
         CAST(label AS INT) AS true_label,
         CAST(count(*) AS DOUBLE) AS n
  FROM documents
  JOIN (SELECT vec_id AS doc_id, label FROM embeddings) USING (doc_id)
  GROUP BY 1, 2
),
pp AS (SELECT pred_label AS label, sum(n) AS pp FROM cm GROUP BY 1),
tpt AS (SELECT true_label AS label, sum(n) AS tp_total FROM cm GROUP BY 1),
diag AS (SELECT pred_label AS label, n AS tp FROM cm
         WHERE pred_label = true_label),
j AS (
  SELECT coalesce(pp.label, tpt.label) AS label,
         coalesce(pp.pp, 0) AS pp,
         coalesce(tpt.tp_total, 0) AS tp_total,
         coalesce(d.tp, 0) AS tp
  FROM pp FULL OUTER JOIN tpt ON pp.label = tpt.label
  LEFT JOIN diag d ON d.label = coalesce(pp.label, tpt.label)
),
pr AS (
  SELECT label,
         CASE WHEN pp > 0 THEN tp / pp ELSE 0.0 END AS p,
         CASE WHEN tp_total > 0 THEN tp / tp_total ELSE 0.0 END AS r
  FROM j
)
SELECT label,
       floor(p * 1000000.0 + 0.5) / 1000000.0 AS precision,
       floor(r * 1000000.0 + 0.5) / 1000000.0 AS recall,
       floor(CASE WHEN p + r > 0 THEN 2.0 * p * r / (p + r) ELSE 0.0 END
             * 1000000.0 + 0.5) / 1000000.0 AS f1
FROM pr
""",
        "nb_model": f"""
WITH {_TOK_CTE},
tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM tok2 GROUP BY 1, 2),
v AS (SELECT CAST(count(DISTINCT term) AS DOUBLE) AS V FROM tf),
lab AS (SELECT vec_id AS doc_id, label FROM embeddings),
cw AS (SELECT label, term, sum(tf.tf) AS cnt
       FROM tf JOIN lab USING (doc_id) GROUP BY 1, 2),
tot AS (SELECT label, sum(cnt) AS tot FROM cw GROUP BY 1)
SELECT CAST(cw.label AS INT) AS label, cw.term,
       floor((ln(0.1 + cw.cnt) - ln(tot.tot + v.V * 0.1)) * 1000000.0 + 0.5)
           / 1000000.0 AS logp6
FROM cw JOIN tot USING (label) CROSS JOIN v
""",
        "nb_predict": f"""
WITH {_TOK_CTE},
tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM tok2 GROUP BY 1, 2),
v AS (SELECT CAST(count(DISTINCT term) AS DOUBLE) AS V FROM tf),
lab AS (SELECT vec_id AS doc_id, label FROM embeddings),
cw AS (SELECT label, term, sum(tf.tf) AS cnt
       FROM tf JOIN lab USING (doc_id) GROUP BY 1, 2),
tot AS (SELECT label, sum(cnt) AS tot FROM cw GROUP BY 1),
pri AS (SELECT label, ln(count(*) + 0.1) AS log_prior FROM lab GROUP BY label),
pc AS (
  SELECT tf.doc_id, p.label,
         floor((p.log_prior
                + sum(tf.tf * (ln(0.1 + coalesce(cw.cnt, 0))
                               - ln(t.tot + v.V * 0.1)))) * 1000000.0 + 0.5)
             / 1000000.0 AS score6
  FROM tf
  CROSS JOIN pri p
  JOIN tot t ON t.label = p.label
  CROSS JOIN v
  LEFT JOIN cw ON cw.label = p.label AND cw.term = tf.term
  GROUP BY tf.doc_id, p.label, p.log_prior, t.tot, v.V
)
SELECT doc_id, CAST(label AS INT) AS pred_label, score6
FROM pc
QUALIFY row_number() OVER (PARTITION BY doc_id
                           ORDER BY score6 DESC, label ASC) = 1
""",
        "shuffled_sample": """
SELECT CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC) AS INT)
           AS pos,
       doc_id
FROM documents
QUALIFY pos <= 20
""",
        "kfold_counts": """
SELECT CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                 AS BIGINT) % 5 AS INT) AS fold,
       count(*) AS n_docs
FROM documents GROUP BY 1
""",
        "feature_chi": f"""
WITH {_TOK_CTE},
dt AS (SELECT DISTINCT doc_id, term FROM tok2),
lab AS (SELECT vec_id AS doc_id, label FROM embeddings),
nn AS (SELECT count(*) AS n FROM lab),
cls AS (SELECT label, count(*) AS n_c FROM lab GROUP BY label),
tc AS (SELECT term, label, count(*) AS df_tc
       FROM dt JOIN lab USING (doc_id) GROUP BY 1, 2),
tdf AS (SELECT term, CAST(sum(df_tc) AS BIGINT) AS df FROM tc GROUP BY 1),
grid AS (
  SELECT t.term, c.label, CAST(coalesce(tc.df_tc, 0) AS DOUBLE) AS a,
         t.df, c.n_c, (SELECT n FROM nn) AS n
  FROM tdf t CROSS JOIN cls c
  LEFT JOIN tc ON tc.term = t.term AND tc.label = c.label
),
gf AS (SELECT * FROM grid WHERE df > 1 AND df < n * 0.8)
SELECT term,
       floor(sum(n * (a * (n - df - n_c + a) - (df - a) * (n_c - a))
                   * (a * (n - df - n_c + a) - (df - a) * (n_c - a))
                 / n_c / ((df - a) + (n - df - n_c + a)) / df
                 / ((n_c - a) + (n - df - n_c + a))
                 * n_c / n) * 1000000.0 + 0.5) / 1000000.0 AS score
FROM gf GROUP BY term
""",
        "feature_ig": f"""
WITH {_TOK_CTE},
dt AS (SELECT DISTINCT doc_id, term FROM tok2),
lab AS (SELECT vec_id AS doc_id, label FROM embeddings),
nn AS (SELECT count(*) AS n FROM lab),
cls AS (SELECT label, count(*) AS n_c FROM lab GROUP BY label),
tc AS (SELECT term, label, count(*) AS df_tc
       FROM dt JOIN lab USING (doc_id) GROUP BY 1, 2),
tdf AS (SELECT term, CAST(sum(df_tc) AS BIGINT) AS df FROM tc GROUP BY 1),
grid AS (
  SELECT t.term, c.label, coalesce(tc.df_tc, 0) AS df_tc,
         t.df, c.n_c, (SELECT n FROM nn) AS n
  FROM tdf t CROSS JOIN cls c
  LEFT JOIN tc ON tc.term = t.term AND tc.label = c.label
),
gf AS (SELECT * FROM grid WHERE df > 1 AND df < n * 0.8),
terms_agg AS (
  SELECT term,
         max(df) / CAST(max(n) AS DOUBLE) AS pt,
         sum(CASE WHEN n_c / n > 0
                  THEN -(n_c / n) * ln(n_c / n) ELSE 0.0 END) AS e,
         sum(CASE WHEN ((df_tc / n_c) * (n_c / n) / (df / n)) <> 0
                  THEN ((df_tc / n_c) * (n_c / n) / (df / n))
                       * ln((df_tc / n_c) * (n_c / n) / (df / n))
                  ELSE 0.0 END) AS cs,
         sum(CASE WHEN (((n_c - df_tc) / n_c) * (n_c / n) / (1.0 - df / n)) <> 0
                  THEN (((n_c - df_tc) / n_c) * (n_c / n) / (1.0 - df / n))
                       * ln(((n_c - df_tc) / n_c) * (n_c / n) / (1.0 - df / n))
                  ELSE 0.0 END) AS cns
  FROM gf GROUP BY term
)
SELECT term,
       floor((e + pt * cs + (1.0 - pt) * cns) * 1000000.0 + 0.5) / 1000000.0
           AS score
FROM terms_agg
""",
        "token_counts": f"""
WITH {_TOK_CTE}
SELECT doc_id, term, count(*) AS tf FROM tok2 GROUP BY doc_id, term
""",
        "pos_projection": f"""
WITH
tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents WHERE doc_id < 300
), tok2 AS (SELECT doc_id, term FROM tok WHERE term <> '')
SELECT doc_id, term, count(*) AS tf
FROM tok2
WHERE (CASE WHEN term LIKE '%ly' THEN 'RB'
            WHEN length(term) >= 7 THEN 'JJ'
            ELSE 'NN' END) IN ('JJ', 'JJR', 'JJS', 'RB', 'RBR', 'RBS')
  AND length(term) > 1 AND length(term) < 20
  AND term NOT IN ({stop})
GROUP BY doc_id, term
""",
        "term_stats": f"""
WITH {_TOK_CTE},
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok2 GROUP BY 1, 2)
SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS ttf FROM tf GROUP BY term
""",
        "term_percentile_slice": f"""
WITH {_TOK_CTE},
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok2 GROUP BY 1, 2),
stats AS (SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS ttf
          FROM tf GROUP BY term),
pr AS (SELECT term, df, ttf,
              percent_rank() OVER (ORDER BY df ASC, term ASC) AS pr
       FROM stats)
SELECT term, df, ttf FROM pr WHERE pr >= 0.4 AND pr < 0.9
""",
        "dedup_exact": """
SELECT md5(text) AS text_hash, count(*) AS n_dups, min(doc_id) AS keep_doc_id
FROM documents GROUP BY md5(text) HAVING count(*) > 1
""",
        "ngram_jaccard": """
WITH sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_distinct(list_transform(
             range(1, greatest(length(text) - 2, 1) + 1),
             i -> substr(lower(text), CAST(i AS INT), 3)))) AS sh
  FROM documents WHERE doc_id < 200
),
sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS jaccard
FROM inter
JOIN sz sa ON sa.doc_id = doc_a
JOIN sz sb ON sb.doc_id = doc_b
WHERE round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) >= 0.5
""",
        "text_stats": text_stats_cte
        + "SELECT doc_id, n_tokens, mean_tok_len, stopword_ratio, digit_ratio FROM per",
        "langid": text_stats_cte
        + """
SELECT doc_id, CAST(stopword_ratio >= 0.08 AS INT) AS is_en FROM per
""",
        "quality_score": text_stats_cte
        + """
SELECT doc_id,
       floor((least(n_tokens / 100.0, 1.0) * 0.4
              + (1.0 - least(digit_ratio * 4.0, 1.0)) * 0.3
              + least(stopword_ratio * 5.0, 1.0) * 0.3) * 1000000.0 + 0.5)
           / 1000000.0 AS quality
FROM per
""",
        "doc_fingerprint": """
SELECT doc_id, substr(md5(lower(text)), 1, 16) AS fingerprint FROM documents
""",
        "ann_cosine_topk": """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
sim AS (
  SELECT vec_id,
         round(list_cosine_similarity(embedding::DOUBLE[], q.qv), 6) AS sim6
  FROM embeddings CROSS JOIN q
  WHERE vec_id <> 0
)
SELECT CAST(row_number() OVER (ORDER BY sim6 DESC, vec_id ASC) AS INT) AS rank,
       vec_id, sim6
FROM sim
QUALIFY rank <= 10
""",
        "ann_lsh_topk": _ann_lsh_sql([0], 10, single=True),
        "gaussian_fields_predict": _gaussian_fields_sql(),
        "plsa_topics": _plsa_sql(),
        "aspect_keywords": _aspect_sql(),
        "sentiword_scores": _senti_sql(),
        "pagerank_weights": _pagerank_sql(),
        "kmeans_clusters": _kmeans_sql(),
        "lda_topics": _lda_sql(),
        "multimodal_features": _multimodal_sql(),
        "ann_lsh_topk_batch": _ann_lsh_sql(ANN_BATCH_IDS, 10, single=False),
        "ann_ivf_topk": _ann_ivf_sql(),
        "dedup_embedding": _dedup_embedding_sql(),
        "pricing_summary": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)
           AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
        "revenue_by_nation": """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
        "top_customers_per_nation": """
WITH spend AS (
  SELECT o_custkey, round(sum(o_totalprice), 4) AS total_spend
  FROM orders GROUP BY o_custkey
),
j AS (
  SELECT n_name, c_custkey, total_spend
  FROM spend
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
)
SELECT n_name,
       CAST(row_number() OVER (PARTITION BY n_name
                               ORDER BY total_spend DESC, c_custkey ASC) AS INT)
           AS rank,
       c_custkey, total_spend
FROM j
QUALIFY rank <= 3
""",
        "customers_without_orders": """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
        "priority_distinct_union": """
SELECT DISTINCT o_orderpriority FROM (
  SELECT o_orderpriority FROM orders WHERE o_totalprice > 200000
  UNION ALL
  SELECT o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
)
""",
        "user_event_sessions": """
WITH marked AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w IS NULL
                OR epoch(ts) - lag(epoch(ts)) OVER w > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, value,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS session_seq
  FROM marked
)
SELECT user_id, session_seq, count(*) AS n_events,
       round(sum(value), 6) AS session_value
FROM sess GROUP BY user_id, session_seq
""",
        "ndcg_by_event_type": """
WITH agg AS (
  SELECT event_type, user_id,
         floor(sum(value) * 1000000.0 + 0.5) / 1000000.0 AS total_value,
         CAST(user_id % 4 AS DOUBLE) AS rel
  FROM events GROUP BY event_type, user_id
),
ranked AS (
  SELECT event_type, rel,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY total_value DESC, user_id ASC) AS rank,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY rel DESC, user_id ASC) AS irank
  FROM agg
)
SELECT event_type,
       round(sum(CASE WHEN rank <= 10
                      THEN (pow(2.0, rel) - 1.0) / ln(rank + 1.0)
                      ELSE 0.0 END)
             / sum(CASE WHEN irank <= 10
                        THEN (pow(2.0, rel) - 1.0) / ln(irank + 1.0)
                        ELSE 0.0 END), 6) AS ndcg
FROM ranked GROUP BY event_type
""",
        "child_ranking_lm": """
WITH d AS (
  SELECT doc_id, text, CAST(floor(doc_id / 10) AS BIGINT) AS parent_id
  FROM documents WHERE doc_id < 200
),
pick AS (SELECT parent_id, min(doc_id) AS stn_doc_id FROM d GROUP BY 1),
stn AS (SELECT d.parent_id, d.text AS stn_text
        FROM d JOIN pick ON d.parent_id = pick.parent_id
                        AND d.doc_id = pick.stn_doc_id),
ch AS (SELECT d.parent_id, d.doc_id AS child_id, d.text
       FROM d JOIN pick ON d.parent_id = pick.parent_id
                       AND d.doc_id <> pick.stn_doc_id),
ctok AS (SELECT parent_id, child_id,
                unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
         FROM ch),
ctok2 AS (SELECT * FROM ctok WHERE term <> ''),
ctf AS (SELECT parent_id, child_id, term, CAST(count(*) AS DOUBLE) AS tf
        FROM ctok2 GROUP BY 1, 2, 3),
clen AS (SELECT parent_id, child_id, sum(tf) AS clen FROM ctf GROUP BY 1, 2),
ttf AS (SELECT term, sum(tf) AS ttf FROM ctf GROUP BY 1),
tot AS (SELECT sum(ttf) AS T FROM ttf),
p AS (SELECT term, ttf / (SELECT T FROM tot) AS p FROM ttf),
stok AS (SELECT parent_id,
                unnest(string_split_regex(lower(stn_text), '[^a-z0-9]+')) AS term
         FROM stn),
stok2 AS (SELECT * FROM stok WHERE term <> ''),
stf AS (SELECT parent_id, term, CAST(count(*) AS DOUBLE) AS stn_tf
        FROM stok2 GROUP BY 1, 2),
pairs AS (
  SELECT s.parent_id, cl.child_id, s.stn_tf, p.p, cl.clen,
         coalesce(ct.tf, 0.0) AS ctf_val
  FROM stf s
  JOIN p ON p.term = s.term
  JOIN clen cl ON cl.parent_id = s.parent_id
  LEFT JOIN ctf ct ON ct.parent_id = s.parent_id
                  AND ct.child_id = cl.child_id
                  AND ct.term = s.term
),
sc AS (
  SELECT parent_id, child_id,
         round(sum(stn_tf * ln(
             (1.0 - 1000.0 / (1000.0 + clen)) * ctf_val / clen
             + (1000.0 / (1000.0 + clen)) * p)), 6) AS score6
  FROM pairs GROUP BY 1, 2
)
SELECT parent_id, child_id,
       CAST(row_number() OVER (PARTITION BY parent_id
                               ORDER BY score6 DESC, child_id ASC) AS INT)
           AS rank,
       score6
FROM sc
""",
        "transcripts_bm25_wand": _transcripts_golden_sql(),
    }
    # z-scored ranking features: wrap the ranking_features oracle in a
    # CTE, add one moments row, normalize with the same std>0 guard the
    # Spark op applies (constant columns -> 0.0, not NaN)
    moments = ", ".join(
        f"avg({c}) AS m_{c}, avg({c} * {c}) AS s_{c}" for c in RANKFV_COLS
    )
    zsel = ",\n       ".join(
        f"CASE WHEN sqrt(greatest(s_{c} - m_{c} * m_{c}, 0.0)) > 0 "
        f"THEN round(({c} - m_{c}) "
        f"/ sqrt(greatest(s_{c} - m_{c} * m_{c}, 0.0)), 6) "
        f"ELSE 0.0 END AS {c}_z"
        for c in RANKFV_COLS
    )
    orc["ranking_features_z"] = f"""
WITH rf AS ({orc["ranking_features"]}),
mom AS (SELECT {moments} FROM rf)
SELECT rf.query_doc, rf.doc_id,
       {zsel}
FROM rf CROSS JOIN mom
"""
    orc["ranking_features_meta"] = _ranking_features_sql(stop, qdocs, meta=True)
    orc["l2r_metric_scores"] = _l2r_metric_scores_sql(
        orc["ranking_features"], moments
    )
    gfml_udocs = ", ".join(
        str(i) for i in range(GFML_MAX_DOC) if i % GFML_LABEL_MOD != 0
    )
    orc["l2r_metric_gaussian_fields"] = _l2r_metric_gf_sql(
        _ranking_features_sql(stop, gfml_udocs), moments
    )
    orc["ranknet_weights"] = _ranknet_sql(orc["ranking_features_z"])
    orc["lambdarank_weights"] = _lambdarank_sql(orc["ranking_features_z"])
    orc["ranksvm_weights"] = _ranksvm_sql(orc["ranking_features_z"])
    orc["lambdarank_parallel_weights"] = _lambdarank_parallel_sql(
        orc["ranking_features_z"]
    )
    orc.update(_dedup_golden_sqls())
    return orc


def _dedup_golden_sqls() -> dict[str, str]:
    """Expected outputs of the three xxhash64-based dedup entries as
    VALUES literals, computed by the pure-Python replicas
    (ir_base_spark/oracle_textops.py — from-spec XXH64 + the same
    minhash/banding/verify math) over the SAME sf0.01 documents table
    the driver feeds the Spark side. DuckDB just SELECTs the literal, so
    the full rows+schema+hash gate applies to ops DuckDB cannot express
    (no xxhash64). Replica-vs-Spark parity is itself pytest-asserted
    (tests/test_oracle_textops.py)."""
    import os

    import pyarrow.parquet as pq

    from ir_base_spark.oracle_textops import (
        dedup_near_py,
        minhash_lsh_candidates_py,
        simhash64_py,
    )

    sf_dir = os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    docs = list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))

    pairs = minhash_lsh_candidates_py(docs)
    pair_vals = ",\n".join(f"({a}, {b})" for a, b in pairs)
    sims = simhash64_py(docs)
    sim_vals = ",\n".join(f"({d}, {h})" for d, h in sims)
    dd = dedup_near_py(docs, threshold=0.6)
    dd_vals = ",\n".join(
        f"({d}, {is_dup}, {'NULL' if dup_of is None else dup_of})"
        for d, is_dup, dup_of in dd
    )
    return {
        "minhash_lsh": f"""
SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b
FROM (VALUES
{pair_vals}
) t(doc_a, doc_b)
""",
        "simhash": f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(simhash AS BIGINT) AS simhash
FROM (VALUES
{sim_vals}
) t(doc_id, simhash)
""",
        "dedup_near": f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(is_dup AS INT) AS is_dup,
       CAST(dup_of AS BIGINT) AS dup_of
FROM (VALUES
{dd_vals}
) t(doc_id, is_dup, dup_of)
""",
    }


def _ranknet_sql(rfz_sql: str) -> str:
    """RankNet's deterministic full-batch GD unrolled as chained CTEs —
    one (gradient, update) CTE pair per iteration, identical float
    association order to ops/ranknet.ranknet_train, so DuckDB converges
    to the same weights (round-6) as the distributed trainer."""
    zc = [f"{c}_z" for c in RANKFV_COLS]
    nz = len(zc)
    lam = RANKNET_HP["lambda_"]
    lr = RANKNET_HP["lr"]
    sh = RANKNET_HP["shrinkage"]
    iters = RANKNET_HP["iters"]
    diff_cols = ",\n         ".join(
        f"(bf.{c} - wf.{c}) AS x{i}" for i, c in enumerate(zc)
    )
    zero_w = ", ".join(f"0.0 AS w{i}" for i in range(nz))
    margin = " + ".join(f"x{i} * w{i}" for i in range(nz))
    # MATERIALIZED: DuckDB inlines plain CTEs, so every unrolled
    # iteration would re-expand the whole feature SQL (and re-open the
    # parquet inputs hundreds of times — fd exhaustion); materializing
    # the shared inputs evaluates each exactly once
    parts = [
        f"rfz AS MATERIALIZED ({rfz_sql})",
        """ranked AS (
  SELECT r.query_doc AS query_id, r.doc_id, l.label
  FROM rfz r
  JOIN (SELECT vec_id AS doc_id, label FROM embeddings) l USING (doc_id)
)""",
        """rp AS (
  SELECT a.query_id,
         CASE WHEN a.label > b.label THEN a.doc_id ELSE b.doc_id END
             AS better_doc,
         CASE WHEN a.label > b.label THEN b.doc_id ELSE a.doc_id END
             AS worse_doc
  FROM ranked a JOIN ranked b
    ON a.query_id = b.query_id AND a.doc_id < b.doc_id
   AND a.label <> b.label
)""",
        f"""diffs AS MATERIALIZED (
  SELECT {diff_cols}
  FROM rp
  JOIN rfz bf ON bf.query_doc = rp.query_id AND bf.doc_id = rp.better_doc
  JOIN rfz wf ON wf.query_doc = rp.query_id AND wf.doc_id = rp.worse_doc
)""",
        "cnt AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM diffs)",
        f"b0 AS MATERIALIZED (SELECT {zero_w})",
    ]
    for t in range(1, iters + 1):
        mu = lr * (sh ** (t - 1))
        gsel = ", ".join(
            f"sum((-1.0/(1.0+exp({margin}))) * x{i}) AS g{i}"
            for i in range(nz)
        )
        bsel = ", ".join(
            f"w{i} - {mu!r} * (g{i}/n + {lam!r} * w{i}) AS w{i}"
            for i in range(nz)
        )
        # every iteration CTE is MATERIALIZED: b_t references b_{t-1}
        # twice (weights + gradient margin), so plain inlining would
        # blow up the expression tree 2^iters-fold at planning time
        parts.append(
            f"g{t} AS MATERIALIZED (SELECT {gsel} "
            f"FROM diffs CROSS JOIN b{t-1})"
        )
        parts.append(
            f"b{t} AS MATERIALIZED (SELECT {bsel} FROM b{t-1} "
            f"CROSS JOIN g{t} CROSS JOIN cnt)"
        )
    final = "\nUNION ALL\n".join(
        f"SELECT {i} AS dim, round(w{i}, 6) AS weight6 FROM b{iters}"
        for i in range(nz)
    )
    return "WITH " + ",\n".join(parts) + "\n" + final


_RP_SQL = """rp AS (
  SELECT a.query_id,
         CASE WHEN a.label > b.label THEN a.doc_id ELSE b.doc_id END
             AS better_doc,
         CASE WHEN a.label > b.label THEN b.doc_id ELSE a.doc_id END
             AS worse_doc
  FROM ranked a JOIN ranked b
    ON a.query_id = b.query_id AND a.doc_id < b.doc_id
   AND a.label <> b.label
)"""


_RANKED_SQL = """ranked AS (
  SELECT r.query_doc AS query_id, r.doc_id, l.label
  FROM rfz r
  JOIN (SELECT vec_id AS doc_id, label FROM embeddings) l USING (doc_id)
)"""


def _lambdarank_sql(rfz_sql: str) -> str:
    """LambdaRank's deterministic full-batch descent unrolled as chained
    MATERIALIZED CTEs — per iteration: a score CTE, a rank+running-
    harmonic window CTE, the |ΔMAP|-weighted gradient aggregate, and the
    weight update, in the identical float association order as
    ops/lambdarank.lambdarank_train."""
    zc = [f"{c}_z" for c in RANKFV_COLS]
    nz = len(zc)
    hp = LAMBDARANK_HP
    rate, lam = hp["rate"], hp["lambda_"]
    lr, sh, iters = hp["lr"], hp["shrinkage"], hp["iters"]
    diff_cols = ",\n         ".join(
        f"(bf.{c} - wf.{c}) AS x{i}" for i, c in enumerate(zc)
    )
    feat_cols = ",\n         ".join(
        f"rf.{c} AS f{i}" for i, c in enumerate(zc)
    )
    zero_w = ", ".join(f"0.0 AS w{i}" for i in range(nz))
    score = " + ".join(f"f{i} * w{i}" for i in range(nz))
    parts = [
        f"rfz AS MATERIALIZED ({rfz_sql})",
        _RANKED_SQL,
        f"""base AS MATERIALIZED (
  SELECT ra.query_id, ra.doc_id, ra.label,
         {feat_cols}
  FROM ranked ra
  JOIN rfz rf ON rf.query_doc = ra.query_id AND rf.doc_id = ra.doc_id
)""",
        """pstats AS MATERIALIZED (
  SELECT query_id,
         sum(CASE WHEN label > 0 THEN 1.0 ELSE 0.0 END) AS p_rel
  FROM base GROUP BY query_id
)""",
        _RP_SQL,
        f"""diffs AS MATERIALIZED (
  SELECT rp.query_id, rp.better_doc, rp.worse_doc,
         {diff_cols}
  FROM rp
  JOIN rfz bf ON bf.query_doc = rp.query_id AND bf.doc_id = rp.better_doc
  JOIN rfz wf ON wf.query_doc = rp.query_id AND wf.doc_id = rp.worse_doc
)""",
        "cnt AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM diffs)",
        f"b0 AS MATERIALIZED (SELECT {zero_w})",
    ]
    for t in range(1, iters + 1):
        mu = lr * (sh ** (t - 1))
        parts.append(
            f"""s{t} AS MATERIALIZED (
  SELECT query_id, doc_id, ({score}) AS s
  FROM base CROSS JOIN b{t - 1}
)"""
        )
        # rank by (score desc, doc_id asc), then the running harmonic
        # sum H_pos — the MAP swap-delta factor's ingredients
        parts.append(
            f"""r{t} AS MATERIALIZED (
  SELECT query_id, doc_id, s,
         sum(1.0 / CAST(pos AS DOUBLE)) OVER (
             PARTITION BY query_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumh
  FROM (SELECT query_id, doc_id, s,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY s DESC, doc_id ASC) AS pos
        FROM s{t})
)"""
        )
        gsel = ", ".join(
            f"sum((-({rate!r} + abs(rb.cumh - rw.cumh) / p.p_rel)"
            f" / (1.0 + exp(rb.s - rw.s))) * d.x{i}) AS g{i}"
            for i in range(nz)
        )
        parts.append(
            f"""g{t} AS MATERIALIZED (
  SELECT {gsel}
  FROM diffs d
  JOIN r{t} rb ON rb.query_id = d.query_id AND rb.doc_id = d.better_doc
  JOIN r{t} rw ON rw.query_id = d.query_id AND rw.doc_id = d.worse_doc
  JOIN pstats p ON p.query_id = d.query_id
)"""
        )
        bsel = ", ".join(
            f"w{i} - {mu!r} * (g{i} / (2.0 * n) + {lam!r} * w{i}) AS w{i}"
            for i in range(nz)
        )
        parts.append(
            f"b{t} AS MATERIALIZED (SELECT {bsel} FROM b{t - 1} "
            f"CROSS JOIN g{t} CROSS JOIN cnt)"
        )
    final = "\nUNION ALL\n".join(
        f"SELECT {i} AS dim, round(w{i}, 6) AS weight6 FROM b{iters}"
        for i in range(nz)
    )
    return "WITH " + ",\n".join(parts) + "\n" + final


def _ranksvm_sql(rfz_sql: str) -> str:
    """RankSVM's deterministic full-batch hinge subgradient unrolled the
    _ranknet_sql way: the only difference is the gradient term
    -x·1[margin < 1] in place of the logistic factor."""
    zc = [f"{c}_z" for c in RANKFV_COLS]
    nz = len(zc)
    lam = RANKSVM_HP["lambda_"]
    lr = RANKSVM_HP["lr"]
    sh = RANKSVM_HP["shrinkage"]
    iters = RANKSVM_HP["iters"]
    diff_cols = ",\n         ".join(
        f"(bf.{c} - wf.{c}) AS x{i}" for i, c in enumerate(zc)
    )
    zero_w = ", ".join(f"0.0 AS w{i}" for i in range(nz))
    margin = " + ".join(f"x{i} * w{i}" for i in range(nz))
    parts = [
        f"rfz AS MATERIALIZED ({rfz_sql})",
        _RANKED_SQL,
        _RP_SQL,
        f"""diffs AS MATERIALIZED (
  SELECT {diff_cols}
  FROM rp
  JOIN rfz bf ON bf.query_doc = rp.query_id AND bf.doc_id = rp.better_doc
  JOIN rfz wf ON wf.query_doc = rp.query_id AND wf.doc_id = rp.worse_doc
)""",
        "cnt AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM diffs)",
        f"b0 AS MATERIALIZED (SELECT {zero_w})",
    ]
    for t in range(1, iters + 1):
        mu = lr * (sh ** (t - 1))
        gsel = ", ".join(
            f"sum((CASE WHEN ({margin}) < 1.0 THEN -1.0 ELSE 0.0 END)"
            f" * x{i}) AS g{i}"
            for i in range(nz)
        )
        bsel = ", ".join(
            f"w{i} - {mu!r} * (g{i}/n + {lam!r} * w{i}) AS w{i}"
            for i in range(nz)
        )
        parts.append(
            f"g{t} AS MATERIALIZED (SELECT {gsel} "
            f"FROM diffs CROSS JOIN b{t - 1})"
        )
        parts.append(
            f"b{t} AS MATERIALIZED (SELECT {bsel} FROM b{t - 1} "
            f"CROSS JOIN g{t} CROSS JOIN cnt)"
        )
    final = "\nUNION ALL\n".join(
        f"SELECT {i} AS dim, round(w{i}, 6) AS weight6 FROM b{iters}"
        for i in range(nz)
    )
    return "WITH " + ",\n".join(parts) + "\n" + final


def _lambdarank_parallel_sql(rfz_sql: str) -> str:
    """LambdaRankParallel's deterministic analog unrolled: per outer
    iteration one |ΔMAP|-weighted gradient aggregation GROUPED BY the
    md5 worker partition, per-partition steps extracted by conditional
    aggregation, averaged in pinned ascending-partition order —
    identical float association to
    ops/lambdarank.lambdarank_parallel_train."""
    zc = [f"{c}_z" for c in RANKFV_COLS]
    nz = len(zc)
    hp = LAMBDARANK_PAR_HP
    W, rate, lam = hp["workers"], hp["rate"], hp["lambda_"]
    lr, sh, iters = hp["lr"], hp["shrinkage"], hp["iters"]
    lam_w = lam / W
    diff_cols = ",\n         ".join(
        f"(bf.{c} - wf.{c}) AS x{i}" for i, c in enumerate(zc)
    )
    feat_cols = ",\n         ".join(
        f"rf.{c} AS f{i}" for i, c in enumerate(zc)
    )
    zero_w = ", ".join(f"0.0 AS w{i}" for i in range(nz))
    score = " + ".join(f"f{i} * w{i}" for i in range(nz))
    parts = [
        f"rfz AS MATERIALIZED ({rfz_sql})",
        _RANKED_SQL,
        f"""base AS MATERIALIZED (
  SELECT ra.query_id, ra.doc_id, ra.label,
         {feat_cols}
  FROM ranked ra
  JOIN rfz rf ON rf.query_doc = ra.query_id AND rf.doc_id = ra.doc_id
)""",
        """pstats AS MATERIALIZED (
  SELECT query_id,
         sum(CASE WHEN label > 0 THEN 1.0 ELSE 0.0 END) AS p_rel
  FROM base GROUP BY query_id
)""",
        _RP_SQL,
        f"""diffs AS MATERIALIZED (
  SELECT rp.query_id, rp.better_doc, rp.worse_doc,
         CAST(('0x' || substring(md5(CAST(rp.query_id AS VARCHAR)), 1, 8)) AS BIGINT)
             % {W} AS part,
         {diff_cols}
  FROM rp
  JOIN rfz bf ON bf.query_doc = rp.query_id AND bf.doc_id = rp.better_doc
  JOIN rfz wf ON wf.query_doc = rp.query_id AND wf.doc_id = rp.worse_doc
)""",
        f"b0 AS MATERIALIZED (SELECT {zero_w})",
    ]
    for t in range(1, iters + 1):
        mu = lr * (sh ** (t - 1))
        parts.append(
            f"""s{t} AS MATERIALIZED (
  SELECT query_id, doc_id, ({score}) AS s
  FROM base CROSS JOIN b{t - 1}
)"""
        )
        parts.append(
            f"""r{t} AS MATERIALIZED (
  SELECT query_id, doc_id, s,
         sum(1.0 / CAST(pos AS DOUBLE)) OVER (
             PARTITION BY query_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumh
  FROM (SELECT query_id, doc_id, s,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY s DESC, doc_id ASC) AS pos
        FROM s{t})
)"""
        )
        gsel = ", ".join(
            f"sum((-({rate!r} + abs(rb.cumh - rw.cumh) / p.p_rel)"
            f" / (1.0 + exp(rb.s - rw.s))) * d.x{i}) AS g{i}"
            for i in range(nz)
        )
        parts.append(
            f"""g{t} AS MATERIALIZED (
  SELECT d.part, CAST(count(*) AS DOUBLE) AS n_p, {gsel}
  FROM diffs d
  JOIN r{t} rb ON rb.query_id = d.query_id AND rb.doc_id = d.better_doc
  JOIN r{t} rw ON rw.query_id = d.query_id AND rw.doc_id = d.worse_doc
  JOIN pstats p ON p.query_id = d.query_id
  GROUP BY d.part
)"""
        )
        # per-partition scalars via conditional aggregation
        gx = []
        for p in range(W):
            gx.append(f"max(CASE WHEN part = {p} THEN n_p END) AS n_{p}")
            gx += [
                f"max(CASE WHEN part = {p} THEN g{i} END) AS g{p}_{i}"
                for i in range(nz)
            ]
        parts.append(
            f"gx{t} AS MATERIALIZED (SELECT {', '.join(gx)} FROM g{t})"
        )
        # averaged stepped weights, ascending-partition association
        bsel = []
        for i in range(nz):
            steps = " + ".join(
                f"COALESCE(w{i} - {mu!r} * (g{p}_{i} / (2.0 * n_{p})"
                f" + {lam_w!r} * w{i}),"
                f" w{i} - {mu!r} * ({lam_w!r} * w{i}))"
                for p in range(W)
            )
            bsel.append(f"({steps}) / {float(W)!r} AS w{i}")
        parts.append(
            f"b{t} AS MATERIALIZED (SELECT {', '.join(bsel)} "
            f"FROM b{t - 1} CROSS JOIN gx{t})"
        )
    final = "\nUNION ALL\n".join(
        f"SELECT {i} AS dim, round(w{i}, 6) AS weight6 FROM b{iters}"
        for i in range(nz)
    )
    return "WITH " + ",\n".join(parts) + "\n" + final
