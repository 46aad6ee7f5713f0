"""Spark-side tokenization: transcripts → per-(turn, term) TF postings.

One Arrow-batched ``mapInPandas`` pass does tokenize → normalize → stem →
n-gram → per-doc TF counting (the reference's per-thread analyze+count,
/root/reference/src/Analyzer/DocAnalyzer.java:377-423 and
MultiThreadedUserAnalyzer.java:77-130), emitting already-aggregated
(doc, term, tf) rows. Because a turn's tokens never cross a partition,
TF needs NO shuffle — this is the document-sharded build phase; only the
dictionary/stats aggregation that follows shuffles, and it shuffles
pre-aggregated (doc, term) rows, not raw tokens.

No per-row Python: the analysis memo in ir_base_spark.text.analyze makes
each distinct raw token pay normalize+stem once per worker process.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

POSTINGS_SCHEMA = (
    "conv_id string, turn_idx int, term string, tf double, doc_len double, "
    "is_doc_head int"
)


def tokenize_turns(
    transcripts: DataFrame,
    ngrams: int = 1,
    min_distinct_terms: int = 0,
    text_col: str = "text",
    analyzer: str = "reference",
) -> DataFrame:
    """transcripts(conv_id, turn_idx, text, ...) → raw postings.

    Output: one row per (conv_id, turn_idx, term) with the term frequency
    and the turn's total analyzed length (Σ tf — _DocBase.m_totalLength,
    /root/reference/src/structures/_DocBase.java:129-134). Turns with
    <= min_distinct_terms distinct terms are dropped BEFORE any corpus
    statistics (declarative reordering of the reference's rollBack,
    /root/reference/src/Analyzer/Analyzer.java:156-186).
    """
    cols = ["conv_id", "turn_idx", text_col]

    def analyze_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ir_base_spark.text.analyze import term_counts

        for pdf in batches:
            conv_ids: list[str] = []
            turn_idxs: list[int] = []
            terms: list[str] = []
            tfs: list[float] = []
            dls: list[float] = []
            heads: list[int] = []
            for conv_id, turn_idx, text in zip(
                pdf["conv_id"].values, pdf["turn_idx"].values, pdf[text_col].values
            ):
                tc = term_counts(
                    text if isinstance(text, str) else "",
                    ngrams=ngrams,
                    analyzer=analyzer,
                )
                if len(tc) <= min_distinct_terms:
                    continue
                dl = float(sum(tc.values()))
                for i, (term, tf) in enumerate(tc.items()):
                    conv_ids.append(conv_id)
                    turn_idxs.append(int(turn_idx))
                    terms.append(term)
                    tfs.append(float(tf))
                    dls.append(dl)
                    heads.append(1 if i == 0 else 0)
            yield pd.DataFrame(
                {
                    "conv_id": pd.Series(conv_ids, dtype="object"),
                    "turn_idx": pd.Series(turn_idxs, dtype="int32"),
                    "term": pd.Series(terms, dtype="object"),
                    "tf": pd.Series(tfs, dtype="float64"),
                    "doc_len": pd.Series(dls, dtype="float64"),
                    # exactly one head row per turn: lets every consumer
                    # count/collect docs without a distinct or groupBy
                    "is_doc_head": pd.Series(heads, dtype="int32"),
                }
            )

    return transcripts.select(*cols).mapInPandas(
        analyze_partition, schema=POSTINGS_SCHEMA
    )
