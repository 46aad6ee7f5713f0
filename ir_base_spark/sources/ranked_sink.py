"""Ranked-list text sink — the reference's debug/model writers.

Reproduces the printTopChild4Stn family's line format
(/root/reference/src/topicmodels/languageModelBaseLine.java:126-165):
one line per query/group, the group key, then the ranked items as
``item:score`` tab-separated, scores descending with an id tie-break.
The reference also writes a parent header line with the child count; we
fold the count into the line (key, n, items...) so the format stays
one-record-per-line and therefore partition-parallel at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ranked_list_lines(
    df: DataFrame,
    query_col: str = "query_id",
    item_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """(line) — one formatted ranked-list line per query group.

    ``<query>\\t<n_items>\\t<item>:<score>\\t...`` with items ordered by
    (score desc, item asc). One shuffle keyed by the query; the in-group
    ordering is a sort_array over the collected (negated-score, item)
    structs, so no window and no driver-side sorting.
    """
    # struct field order IS the sort order: negated score asc (= score
    # desc), then the item in its NATIVE type (numeric ids tie-break
    # numerically, not lexicographically); the display string rides last
    items = df.groupBy(F.col(query_col).alias("_q")).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    (-F.col(score_col)).cast("double").alias("ns"),
                    F.col(item_col).alias("raw"),
                    F.col(item_col).cast("string").alias("it"),
                )
            )
        ).alias("ranked")
    )
    rendered = items.select(
        "_q",
        F.size("ranked").alias("_n"),
        F.array_join(
            F.transform(
                F.col("ranked"),
                lambda s: F.concat_ws(
                    ":", s["it"], F.format_string("%.6f", -s["ns"])
                ),
            ),
            "\t",
        ).alias("_items"),
    )
    return rendered.select(
        F.concat_ws(
            "\t", F.col("_q").cast("string"), F.col("_n").cast("string"),
            F.col("_items")
        ).alias("line"),
        F.col("_q").alias("_sort_key"),
    )


def write_ranked_list(
    df: DataFrame,
    path: str,
    query_col: str = "query_id",
    item_col: str = "doc_id",
    score_col: str = "score",
    single_file: bool = False,
) -> None:
    """Write the ranked-list text file(s) under ``path``.

    ``single_file=True`` reproduces the reference's one-driver-file
    output (coalesce(1), lines sorted by query) for small eval dumps;
    the default keeps one file per partition — the only shape that
    works when the query set itself is large.
    """
    lines = ranked_list_lines(
        df, query_col=query_col, item_col=item_col, score_col=score_col
    )
    if single_file:
        lines = lines.coalesce(1).sortWithinPartitions("_sort_key")
    out = lines.select("line")
    out.write.mode("overwrite").text(path)
