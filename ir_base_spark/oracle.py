"""Single-node pure-Python reference oracle.

This module IS "the reference engine" for rank-identity assertions
(SURVEY.md §5): it re-implements, in plain dict/loop Python, exactly the
semantics surveyed from mikelatch/IR_Base —

- analysis chain: ir_base_spark.text (shared with the Spark engine, so
  token identity holds by construction; reference chain
  /root/reference/src/Analyzer/DocAnalyzer.java:159-258);
- exact DF/TTF stats (/root/reference/src/structures/_stat.java:54-62);
- BM25 weighting with k1=1.5, b=0.75, IDF=ln((N-DF+0.5)/(DF+0.5)),
  TF saturation tf*(k1+1)/(k1*(1-b+b*dl/avgdl)+tf)
  (/root/reference/src/Analyzer/Analyzer.java:235-263);
- optional L1/L2 doc-vector normalization (Analyzer.java:316-321);
- retrieval: score = Σ_{t ∈ q∩d} w_q(t)·w_d(t), the sparse dot product
  (/root/reference/src/utils/Utils.java:380-399), query side raw TF;
- bounded top-k with first-arrival-wins tie behavior formalized as
  score desc, then (conv_id, turn_idx) asc
  (/root/reference/src/structures/MyPriorityQueue.java:40-52; SURVEY §7.3).

Floating-point determinism: per-doc score accumulation runs in ascending
term_id order (canonical order, SURVEY §7.3); the Spark engine accumulates
in the same order, so scores agree to well under 1e-9.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from .text.analyze import term_counts

K1 = 1.5   # Analyzer.java:236
B = 0.75   # Analyzer.java:237

DocKey = tuple[str, int]  # (conv_id, turn_idx)


@dataclass
class OracleIndex:
    """In-memory forward+inverted index with BM25 weights."""

    n_docs: int = 0
    avg_doc_len: float = 0.0
    term_ids: dict[str, int] = field(default_factory=dict)      # term -> id
    df: dict[str, int] = field(default_factory=dict)
    ttf: dict[str, int] = field(default_factory=dict)
    # term_id -> list[(doc_key, weight)] in doc_key order
    postings: dict[int, list[tuple[DocKey, float]]] = field(default_factory=dict)
    doc_len: dict[DocKey, int] = field(default_factory=dict)
    ngrams: int = 1


def build_oracle_index(
    docs: list[tuple[DocKey, str]],
    ngrams: int = 1,
    min_distinct_terms: int = 0,
    min_df: int = 1,
    max_df: int | None = None,
    norm: int = 0,
) -> OracleIndex:
    """Two-pass build mirroring the reference pipeline.

    Pass 1: analyze + count → dictionary with exact DF/TTF, pruned by
    [min_df, max_df] (FeatureSelector.java:64-71 analog). Pass 2: project
    doc vectors onto the dictionary, compute doc lengths, BM25 weights,
    optional L1/L2 norm (Analyzer.java:189-326).
    """
    vectors: list[tuple[DocKey, dict[str, int]]] = []
    df: dict[str, int] = {}
    ttf: dict[str, int] = {}
    for key, text in docs:
        tf = term_counts(text or "", ngrams=ngrams)
        if len(tf) <= min_distinct_terms:
            continue  # filtered before stats: no rollBack needed (SURVEY §2.4)
        vectors.append((key, dict(tf)))
        for term, c in tf.items():
            df[term] = df.get(term, 0) + 1
            ttf[term] = ttf.get(term, 0) + c

    # dictionary pruning + deterministic ids: row_number over (df desc, term asc)
    kept = {
        t for t, d in df.items()
        if d >= min_df and (max_df is None or d <= max_df)
    }
    ordered = sorted(kept, key=lambda t: (-df[t], t))
    term_ids = {t: i for i, t in enumerate(ordered)}

    idx = OracleIndex(ngrams=ngrams)
    idx.term_ids = term_ids
    idx.df = {t: df[t] for t in kept}
    idx.ttf = {t: ttf[t] for t in kept}

    # project vectors onto dictionary; doc_len over retained terms
    proj: list[tuple[DocKey, dict[str, int]]] = []
    total_len = 0
    for key, tf in vectors:
        ptf = {t: c for t, c in tf.items() if t in kept}
        if not ptf:
            continue
        proj.append((key, ptf))
        dl = sum(ptf.values())
        idx.doc_len[key] = dl
        total_len += dl

    idx.n_docs = len(proj)
    idx.avg_doc_len = (total_len / idx.n_docs) if idx.n_docs else 0.0

    n = idx.n_docs
    navg = idx.avg_doc_len
    for key, ptf in sorted(proj, key=lambda kv: kv[0]):
        dl = idx.doc_len[key]
        nlen = dl / navg if navg > 0 else 0.0
        weights: dict[str, float] = {}
        for term, tf in ptf.items():
            idf = math.log((n - idx.df[term] + 0.5) / (idx.df[term] + 0.5))
            weights[term] = idf * tf * (K1 + 1.0) / (K1 * (1.0 - B + B * nlen) + tf)
        if norm == 1:
            s = sum(abs(w) for w in weights.values())
            if s > 0:
                weights = {t: w / s for t, w in weights.items()}
        elif norm == 2:
            s = math.sqrt(sum(w * w for w in weights.values()))
            if s > 0:
                weights = {t: w / s for t, w in weights.items()}
        for term, w in weights.items():
            idx.postings.setdefault(term_ids[term], []).append((key, w))
    return idx


def search(
    index: OracleIndex, query_text: str, k: int
) -> list[tuple[str, int, float]]:
    """BM25 top-k: returns [(conv_id, turn_idx, score)] ranked.

    Candidates are docs sharing >= 1 analyzed query term. Accumulation is
    ascending-term_id order per doc; ranking is score desc then
    (conv_id, turn_idx) asc (the formalized MyPriorityQueue contract).
    """
    qtf = term_counts(query_text or "", ngrams=index.ngrams)
    qvec = sorted(
        (index.term_ids[t], float(c))
        for t, c in qtf.items()
        if t in index.term_ids
    )
    scores: dict[DocKey, float] = {}
    for tid, qw in qvec:  # ascending term_id: canonical accumulation order
        for key, dw in index.postings.get(tid, ()):
            scores[key] = scores.get(key, 0.0) + qw * dw
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(key[0], key[1], s) for key, s in ranked]


def search_all(
    index: OracleIndex, queries: list[tuple[str, str, int]]
) -> list[tuple[str, int, str, int, float]]:
    """Run the full query set → rows (query_id, rank, conv_id, turn_idx,
    score) — the expected_topk golden table (FIXTURES.md §3)."""
    out = []
    for qid, qtext, k in queries:
        for rank, (conv_id, turn_idx, score) in enumerate(
            search(index, qtext, k), start=1
        ):
            out.append((qid, rank, conv_id, turn_idx, score))
    return out
