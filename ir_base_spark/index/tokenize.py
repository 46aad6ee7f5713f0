"""Spark-side tokenization: transcripts → per-(turn, term) TF postings.

One Arrow-batched ``mapInPandas`` pass does tokenize → normalize → stem →
n-gram → per-doc TF counting (the reference's per-thread analyze+count,
/root/reference/src/Analyzer/DocAnalyzer.java:377-423 and
MultiThreadedUserAnalyzer.java:77-130), emitting already-aggregated
(doc, term, tf) rows. Because a turn's tokens never cross a partition,
TF needs NO shuffle — this is the document-sharded build phase; only the
dictionary/stats aggregation that follows shuffles, and it shuffles
pre-aggregated (doc, term) rows, not raw tokens.

Kernel shape (the build hot path, so no per-row Python for the default
unigram analyzers): the whole Arrow batch is tokenized with pandas
C-level string ops (``str.normalize`` → ``str.findall`` → ``explode``),
each DISTINCT raw token is analyzed once through the per-worker memo
(Zipf text → the normalize+stem cost is amortized to near zero), and
TF/doc_len/head flags come from one vectorized groupby. The per-row
loop survives only for ngrams >= 2 (a sequential chain-break window).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

POSTINGS_SCHEMA = (
    "conv_id string, turn_idx int, term string, tf double, doc_len double, "
    "is_doc_head int"
)

_EMPTY = {
    "conv_id": pd.Series([], dtype="object"),
    "turn_idx": pd.Series([], dtype="int32"),
    "term": pd.Series([], dtype="object"),
    "tf": pd.Series([], dtype="float64"),
    "doc_len": pd.Series([], dtype="float64"),
    "is_doc_head": pd.Series([], dtype="int32"),
}


def _vectorized_unigram_batch(
    pdf: pd.DataFrame,
    text_col: str,
    analyzer: str,
    min_distinct_terms: int,
) -> pd.DataFrame:
    """Batch-level tokenize+count for ngrams=1 (reference or simple)."""
    texts = pdf[text_col].astype("string").fillna("")
    if analyzer == "simple":
        toks = texts.str.lower().str.findall(r"[a-z0-9]+")
    else:
        from ir_base_spark.text.analyze import TOKEN_RE

        toks = texts.str.normalize("NFKC").str.findall(TOKEN_RE)
    flat = toks.explode()
    flat = flat[flat.notna()]
    if len(flat) == 0:
        return pd.DataFrame(_EMPTY)

    if analyzer == "simple":
        mapped = flat
    else:
        from ir_base_spark.text.analyze import _analyze_token

        # analyze each DISTINCT raw token once (memoized per worker);
        # non-legit / empty-normalized tokens map to absent -> dropped
        lookup: dict[str, str] = {}
        for raw in pd.unique(flat):
            hit = _analyze_token(raw)
            if hit is not None and hit[1]:
                lookup[raw] = hit[0]
        mapped = flat.map(lookup)
        mapped = mapped[mapped.notna()]
        if len(mapped) == 0:
            return pd.DataFrame(_EMPTY)

    # TF per (input row, term): one C-level groupby over the flat stream
    g = (
        pd.DataFrame({"i": mapped.index, "term": mapped.values})
        .groupby(["i", "term"], sort=False)
        .size()
        .reset_index(name="tf")
    )
    per_doc = g.groupby("i", sort=False)["tf"].agg(["sum", "size"])
    keep = per_doc[per_doc["size"] > min_distinct_terms]
    if len(keep) == 0:
        return pd.DataFrame(_EMPTY)
    g = g[g["i"].isin(keep.index)]
    i = g["i"].to_numpy()
    head = np.empty(len(g), dtype=np.int32)
    head[0] = 1
    head[1:] = (i[1:] != i[:-1]).astype(np.int32)
    dl = keep["sum"].astype("float64")
    return pd.DataFrame(
        {
            "conv_id": pdf["conv_id"].to_numpy()[i],
            "turn_idx": pdf["turn_idx"].to_numpy().astype("int32")[i],
            "term": g["term"].to_numpy(),
            "tf": g["tf"].to_numpy(dtype="float64"),
            "doc_len": dl.reindex(i).to_numpy(),
            # exactly one head row per turn: lets every consumer
            # count/collect docs without a distinct or groupBy
            "is_doc_head": head,
        }
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
    vectorized = ngrams == 1 and analyzer in ("reference", "simple")

    def analyze_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ir_base_spark.text.analyze import term_counts

        for pdf in batches:
            if vectorized:
                pdf = pdf.reset_index(drop=True)
                yield _vectorized_unigram_batch(
                    pdf, text_col, analyzer, min_distinct_terms
                )
                continue
            # n-gram path: sequential chain-break window per turn
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
                    "is_doc_head": pd.Series(heads, dtype="int32"),
                }
            )

    return transcripts.select(*cols).mapInPandas(
        analyze_partition, schema=POSTINGS_SCHEMA
    )
