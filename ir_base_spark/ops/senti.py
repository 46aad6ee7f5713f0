"""SentiWordNet scoring with the lexicon as an input table.

Deterministic Spark analog of the reference's SentiWordNet structure
(/root/reference/src/structures/SentiWordNet.java:16,32-139) and
DocAnalyzer.sentiWordScore (:198-220). The bundled SWN data file —
what made this row out-of-scope before — becomes an input DataFrame
of raw lexicon rows; everything downstream is the reference pipeline:

- dictionary build: explode each synset line's ``word#rank`` terms,
  synset score = PosS − NegS, then per ``word#pos`` fold the sense
  scores with the reference's EXACT running recurrence
  (SentiWordNet.java:113-127): for each sense, a non-zero score is
  added and the count incremented, and then the accumulated score is
  re-divided by the count whenever it is non-zero — including on
  zero-score senses (each zero sense re-divides again). That loop
  iterates a java.util.HashMap, so its order is UNSPECIFIED in the
  reference; the deterministic analog folds in ascending sense-rank
  order (documented deviation — any fixed order is as faithful as
  unspecified order, and rank order is the natural one).
- doc scoring: per token, Normalize + stem, map the POS tag to the
  SWN class (NN*→n, JJ*→a, VB/VBD/VBG→v, RB*→r, else untouched),
  look up ``stem#class``, sum the found scores and divide by the
  TOTAL token count (missing words contribute 0 to the sum but stay
  in the denominator — sentiWordScore :216-219).

Normalize here is the Catalyst subset of the reference's Normalize
(\\W+ strip + lowercase + NUM fold; Java-regex \\W is Unicode-aware,
NFKC is not available as a Catalyst function — full-NFKC parity runs
through the python analyzer path and is irrelevant for ASCII
lexicons). Stemming (porter2) runs over DISTINCT words only, batched
through mapInPandas — the lexicon and vocab are small relative to the
corpus; everything corpus-sized is codegen column work.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LEXICON_DDL = (
    "pos string, synset_id string, pos_score double, neg_score double, "
    "terms string"
)


def _normalize_col(word):
    """Catalyst subset of SentiWordNet.Normalize (:37-46)."""
    w = F.lower(F.regexp_replace(word, r"\W+", ""))
    return F.when(w.rlike(r"^\d+$"), F.lit("NUM")).otherwise(w)


def _stem_distinct(df: DataFrame, col: str) -> DataFrame:
    """(col) → (col, stem): porter2 over the distinct values, Arrow
    batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ir_base_spark.text.porter2 import stem

        for pdf in batches:
            yield pd.DataFrame(
                {col: pdf[col], "stem": [stem(w) for w in pdf[col]]}
            )

    return df.select(col).distinct().mapInPandas(
        run, schema=f"{col} string, stem string"
    )


def sentiwordnet_dictionary(
    lexicon: DataFrame, stem: bool = True
) -> DataFrame:
    """lexicon(LEXICON_DDL) → (key, score): the ``stemmed#pos`` score
    map (SentiWordNet constructor)."""
    e = (
        lexicon.select(
            "pos",
            (F.col("pos_score") - F.col("neg_score")).alias("sscore"),
            F.explode(F.split("terms", " ")).alias("tr"),
        )
        .select(
            "pos",
            "sscore",
            _normalize_col(F.split("tr", "#")[0]).alias("word"),
            F.split("tr", "#")[1].cast("int").alias("rank"),
        )
        .filter(F.col("word") != "")
    )
    if stem:
        e = e.join(F.broadcast(_stem_distinct(e, "word")), "word").drop(
            "word"
        ).withColumnRenamed("stem", "word")
    grouped = e.groupBy("word", "pos").agg(
        F.sort_array(F.collect_list(F.struct("rank", "sscore"))).alias("xs")
    )
    # the reference's running recurrence, rank-ascending (see module
    # docstring): s' = s + x if x != 0; c' = c + [x != 0]; then
    # s' = s'/c' whenever s' != 0
    zero = F.struct(
        F.lit(0.0).alias("s"), F.lit(0).cast("int").alias("c")
    )

    def step(acc, x):
        s1 = F.when(x["sscore"] != 0.0, acc["s"] + x["sscore"]).otherwise(
            acc["s"]
        )
        c1 = F.when(x["sscore"] != 0.0, acc["c"] + F.lit(1)).otherwise(
            acc["c"]
        )
        s2 = F.when(s1 != 0.0, s1 / c1).otherwise(s1)
        return F.struct(s2.alias("s"), c1.alias("c"))

    folded = grouped.select(
        F.concat(F.col("word"), F.lit("#"), F.col("pos")).alias("key"),
        F.aggregate(F.col("xs"), zero, step, lambda acc: acc["s"]).alias(
            "score"
        ),
    )
    return folded


def make_senti_lexicon() -> list[tuple]:
    """Deterministic SWN-format fixture lexicon (LEXICON_DDL rows) over
    the synthetic corpus vocabulary — multi-sense words, interleaved
    zero-score senses (exercising the reference fold's re-division
    quirk), shared synsets, and a NUM entry."""
    return [
        ("n", "001", 0.5, 0.125, "fast#1 quick#1"),
        ("n", "002", 0.0, 0.0, "fast#2"),
        ("n", "003", 0.25, 0.5, "fast#3 slow#1"),
        ("n", "004", 0.375, 0.0, "table#1 scan#2"),
        ("n", "005", 0.0, 0.25, "scan#1 row#1"),
        ("n", "006", 0.625, 0.125, "query#1 data#2"),
        ("n", "007", 0.0, 0.0, "data#1"),
        ("a", "008", 0.75, 0.0, "customer#1 supplier#1"),
        ("a", "009", 0.125, 0.375, "customer#2"),
        ("n", "010", 0.5, 0.5, "join#1 hash#1"),
        ("n", "011", 0.25, 0.0, "123#1"),
        ("v", "012", 0.875, 0.125, "scan#3"),
    ]


_TAG_CLASS = {
    "NN": "n", "NNS": "n", "NNP": "n", "NNPS": "n",
    "JJ": "a", "JJR": "a", "JJS": "a",
    "VB": "v", "VBD": "v", "VBG": "v",
    "RB": "r", "RBR": "r", "RBS": "r",
}


def _tag_class(tag):
    expr = tag
    for t, c in _TAG_CLASS.items():
        expr = F.when(tag == t, F.lit(c)).otherwise(expr)
    return expr


def sentiword_doc_scores(
    tagged: DataFrame,
    dictionary: DataFrame,
    stem: bool = True,
    tokens_col: str = "tokens",
    tags_col: str = "pos_tags",
) -> DataFrame:
    """tagged(doc_id, tokens array, pos_tags array) + dictionary(key,
    score) → (doc_id, senti_score): sentiWordScore per doc — found
    scores summed, divided by the TOTAL token count."""
    z = tagged.select(
        "doc_id",
        F.size(F.col(tokens_col)).alias("n_tokens"),
        F.explode(
            F.arrays_zip(
                F.col(tokens_col).alias("w"), F.col(tags_col).alias("tag")
            )
        ).alias("p"),
    ).select(
        "doc_id",
        "n_tokens",
        _normalize_col(F.col("p.w")).alias("word"),
        _tag_class(F.col("p.tag")).alias("cls"),
    )
    if stem:
        z = z.join(F.broadcast(_stem_distinct(z, "word")), "word").drop(
            "word"
        ).withColumnRenamed("stem", "word")
    keyed = z.withColumn(
        "key", F.concat(F.col("word"), F.lit("#"), F.col("cls"))
    ).join(F.broadcast(dictionary), "key", "left")
    return keyed.groupBy("doc_id").agg(
        (
            F.sum(F.coalesce(F.col("score"), F.lit(0.0)))
            / F.first("n_tokens")
        ).alias("senti_score")
    )
