"""svmlight vector-file source/sink — the reference's persisted corpus
format (VctAnalyzer.LoadDoc, /root/reference/src/Analyzer/
VctAnalyzer.java:26-72; _Corpus.save2File,
/root/reference/src/structures/_Corpus.java:138-158).

Line format::

    <label> <idx>:<value> <idx>:<value> ... [#<item_id>-<doc_name>]

- feature indices are 1-BASED on disk (VctAnalyzer.java:54 subtracts 1
  on load; save2File adds 1 on write); in-engine indices are 0-based;
- values serialize as Java ``%f`` (fixed 6 decimals) — reproduced with
  ``format_string('%d:%f', ...)`` so a file written here is
  byte-compatible with the reference loader;
- the optional trailing ``#item-name`` comment carries (item_id,
  doc_name) (VctAnalyzer.java:48-51).

Both directions are pure Catalyst column algebra over ``spark.read.text``
/ ``df.write.text`` — parse and format are codegen'd, no Python in the
row path, so the source scales like any text scan (file-split parallel).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SVMLIGHT_SCHEMA = (
    "label int, indices array<int>, values array<double>, "
    "item_id string, doc_name string"
)


def read_svmlight(
    spark: SparkSession, path: str, min_tokens: int | None = None
) -> DataFrame:
    """path (text file/dir/glob) → (label, indices[0-based], values,
    item_id, doc_name).

    ``min_tokens`` mirrors the reference's length threshold
    (VctAnalyzer.java:37: lines with <= threshold space-separated tokens
    are dropped BEFORE parsing).
    """
    lines = spark.read.text(path).select(
        F.split(F.trim(F.col("value")), " ").alias("p")
    )
    lines = lines.filter(F.size("p") >= 2)
    if min_tokens is not None:
        lines = lines.filter(F.size("p") > min_tokens)
    feats = F.filter(F.col("p"), lambda x: x.contains(":"))
    comment = F.filter(F.col("p"), lambda x: x.startswith("#"))
    comment0 = F.when(F.size(comment) > 0, F.element_at(comment, 1))
    comment_body = F.split(F.substring(comment0, 2, 1 << 20), "-")
    return lines.select(
        F.element_at(F.col("p"), 1).cast("int").alias("label"),
        F.transform(
            feats, lambda x: (F.split(x, ":")[0].cast("int") - 1)
        ).alias("indices"),
        F.transform(feats, lambda x: F.split(x, ":")[1].cast("double")).alias(
            "values"
        ),
        F.element_at(comment_body, 1).alias("item_id"),
        F.element_at(comment_body, 2).alias("doc_name"),
    )


def write_svmlight(
    df: DataFrame,
    path: str,
    label_col: str = "label",
    indices_col: str = "indices",
    values_col: str = "values",
    item_id_col: str | None = "item_id",
    doc_name_col: str | None = "doc_name",
) -> None:
    """(label, indices[0-based], values[, item_id, doc_name]) → svmlight
    text, byte-compatible with _Corpus.save2File (1-based ``%d:%f``
    pairs, optional ``#item-name`` trailer)."""
    pairs = F.zip_with(
        F.col(indices_col),
        F.col(values_col),
        lambda i, v: F.format_string("%d:%f", i + 1, v),
    )
    line = F.concat_ws(
        " ", F.col(label_col).cast("string"), F.array_join(pairs, " ")
    )
    if item_id_col is not None and doc_name_col is not None:
        trailer = F.when(
            F.col(item_id_col).isNotNull() & F.col(doc_name_col).isNotNull(),
            F.concat(F.lit("#"), F.col(item_id_col), F.lit("-"), F.col(doc_name_col)),
        )
        line = F.when(
            trailer.isNotNull(), F.concat_ws(" ", line, trailer)
        ).otherwise(line)
    df.select(line.alias("value")).write.mode("overwrite").text(path)


def postings_to_svmlight_rows(
    weights: DataFrame,
    labels: DataFrame,
    doc_cols: list[str],
) -> DataFrame:
    """Weighted postings (doc_cols..., term_id, weight) + labels
    (doc_cols..., label) → svmlight rows with term_id-ascending sparse
    vectors (the canonical accumulation order, SURVEY §7.3)."""
    vec = (
        weights.groupBy(*doc_cols)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("term_id", "weight"))
            ).alias("sv")
        )
        .join(labels, doc_cols)
    )
    return vec.select(
        *doc_cols,
        "label",
        F.transform(F.col("sv"), lambda s: s["term_id"].cast("int")).alias(
            "indices"
        ),
        F.transform(F.col("sv"), lambda s: s["weight"]).alias("values"),
    )
