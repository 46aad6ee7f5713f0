"""Document sources: the reference's text / JSON review loaders.

- JSON review files (DocAnalyzer.LoadJsonDoc,
  /root/reference/src/Analyzer/DocAnalyzer.java:357-374): each file is
  one object with a top-level ``Reviews`` array; per review the fields
  used are Overall (rating), Content, Title, Date, ReviewID, Author.
  Rating semantics follow _Post
  (/root/reference/src/structures/_Post.java:95-115): ``"None"`` → -1,
  numeric clamped to [1, 5], truncated to int; the classification label
  binarizes as ylabel = 0 if rating < 4 else 1
  (DocAnalyzer.java:365).
- Plain-text documents (LoadDoc fallback for .txt): one document per
  file (whole-file content), keyed by file path.

Both are declarative scans — Spark's JSON/text data sources parallelize
by file split; no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_json_reviews(spark: SparkSession, path: str) -> DataFrame:
    """path (file/dir/glob of review JSON files) → one row per review:
    (review_id, item_file, author, date, title, text, rating, label).

    rating: -1 for "None", else numeric clamped to [1,5] truncated to
    int (_Post.java semantics); label: 0 if rating < 4 else 1
    (LoadJsonDoc binarization).
    """
    raw = spark.read.option("multiLine", "true").json(path).select(
        F.input_file_name().alias("item_file"),
        F.explode(F.col("Reviews")).alias("r"),
    )
    overall = F.col("r.Overall").cast("string")
    num = overall.cast("double")
    rating = (
        F.when(overall.isNull() | (overall == "None"), F.lit(-1))
        .when(num <= 0, F.lit(1))
        .when(num > 5, F.lit(5))
        .otherwise(num.cast("int"))
    )
    return raw.select(
        F.col("r.ReviewID").alias("review_id"),
        "item_file",
        F.col("r.Author").alias("author"),
        F.col("r.Date").alias("date"),
        F.col("r.Title").alias("title"),
        F.col("r.Content").alias("text"),
        rating.alias("rating"),
        (rating >= 4).cast("int").alias("label"),
    )


def read_text_docs(spark: SparkSession, path: str) -> DataFrame:
    """path (dir/glob of .txt) → (doc_path, text): one doc per file —
    the reference's plain-text LoadDoc branch."""
    return spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("doc_path"),
        F.col("value").alias("text"),
    )
