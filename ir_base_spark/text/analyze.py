"""Shared text-analysis pipeline: tokenize → normalize → stem → n-gram.

Semantics follow the reference analyzer chain
(/root/reference/src/Analyzer/DocAnalyzer.java):

- ``Tokenizer`` (DocAnalyzer.java:159-162) uses an OpenNLP maxent model;
  that statistical model is not portable, so this engine defines a
  deterministic regex tokenizer and rank-identity is asserted against the
  single-node oracle that uses THIS module (SURVEY.md §2.2, §5).
- ``Normalize`` (DocAnalyzer.java:165-174): NFKC → strip ``\\W`` → lower →
  pure-digit tokens fold to the literal ``"NUM"`` (Utils.isNumber,
  /root/reference/src/utils/Utils.java:401-403).
- ``SnowballStemming`` (DocAnalyzer.java:177-183): Porter2 English — see
  ir_base_spark.text.porter2.
- ``isLegit`` (DocAnalyzer.java:185-190): drop empty, stopword,
  len <= 1, len >= 20.
- N-gram expansion (``TokenizerNormalizeStemmer``, DocAnalyzer.java:
  223-258): emit legit unigrams plus ``w1-w2``-joined n-grams; empty
  normalized tokens break the n-gram chain; an n-gram is emitted only
  when ALL constituents are legit (the reference's ``legit &=
  isLegit(tokens[j])`` accumulator — its code comment says "at least
  one" but the code ANDs; parity follows the code).

Everything here is pure Python over plain strings, shared verbatim by the
Spark Arrow UDFs and the oracle. The batch helpers amortize work across a
pandas batch via a token-level memo (Zipf text → near-free stemming).
"""

from __future__ import annotations

import re
import unicodedata
from collections import Counter
from collections.abc import Iterable

from .porter2 import stem_cached
from .stopwords import analyzed_stopwords

# Word tokens (with inner apostrophes) OR punctuation runs; punctuation
# tokens normalize to "" and break the n-gram chain, matching the
# reference tokenizer's behavior of emitting punctuation as tokens.
TOKEN_RE = re.compile(r"\w+(?:'\w+)*|[^\w\s]+", re.UNICODE)
_NON_WORD_RE = re.compile(r"\W+", re.UNICODE)
_DIGITS_RE = re.compile(r"\d+")

MAX_TOKEN_LEN = 20  # exclusive upper bound, DocAnalyzer.java:188
MIN_TOKEN_LEN = 1   # exclusive lower bound, DocAnalyzer.java:188


def normalize_token(token: str) -> str:
    """NFKC → strip non-word chars → lowercase → digit-fold to 'NUM'."""
    t = unicodedata.normalize("NFKC", token)
    t = _NON_WORD_RE.sub("", t)
    t = t.lower()
    if t and _DIGITS_RE.fullmatch(t):
        return "NUM"
    return t


def is_legit(analyzed: str) -> bool:
    """Reference isLegit on an analyzed (normalized+stemmed) token."""
    return (
        MIN_TOKEN_LEN < len(analyzed) < MAX_TOKEN_LEN
        and analyzed not in analyzed_stopwords()
    )


# Per-process memo: raw token -> (analyzed token, legit) | None for empty.
_ANALYZE_CACHE: dict[str, tuple[str, bool] | None] = {}


def _analyze_token(raw: str) -> tuple[str, bool] | None:
    hit = _ANALYZE_CACHE.get(raw)
    if hit is None and raw not in _ANALYZE_CACHE:
        if len(_ANALYZE_CACHE) > 2_000_000:
            _ANALYZE_CACHE.clear()
        norm = normalize_token(raw)
        if not norm:
            hit = None
        else:
            stemmed = stem_cached(norm) if norm != "NUM" else "NUM"
            hit = (stemmed, is_legit(stemmed))
        _ANALYZE_CACHE[raw] = hit
    return hit


def analyze(text: str, ngrams: int = 1) -> list[str]:
    """Full pipeline for one document; returns the analyzed token stream.

    Emission order matches the reference: at each position, the unigram
    (if legit) followed by the 2..n-grams ending at that position (if ALL
    constituents are legit). Empty-normalized tokens reset the window.
    """
    if not text:
        return []
    out: list[str] = []
    window: list[tuple[str, bool]] = []
    for raw in TOKEN_RE.findall(unicodedata.normalize("NFKC", text)):
        tok = _analyze_token(raw)
        if tok is None:
            window.clear()
            continue
        window.append(tok)
        if len(window) > ngrams:
            window.pop(0)
        if tok[1]:
            out.append(tok[0])
        for n in range(2, len(window) + 1):
            gram = window[-n:]
            if all(legit for _, legit in gram):
                out.append("-".join(t for t, _ in gram))
    return out


_SIMPLE_SPLIT_RE = re.compile(r"[^a-z0-9]+")


def simple_analyze(text: str) -> list[str]:
    """SQL-equivalent analyzer: lowercase + split on ``[^a-z0-9]+``.

    Exactly expressible in ANSI SQL/DuckDB
    (``string_split_regex(lower(text), '[^a-z0-9]+')``), which makes every
    downstream stat/score independently verifiable by a SQL oracle. No
    stemming, no stopwords, no length bounds.
    """
    if not text:
        return []
    return [t for t in _SIMPLE_SPLIT_RE.split(text.lower()) if t]


def term_counts(text: str, ngrams: int = 1, analyzer: str = "reference") -> Counter[str]:
    """TF map for one document (constructSpVct analog,
    DocAnalyzer.java:377-423)."""
    if analyzer == "simple":
        return Counter(simple_analyze(text))
    return Counter(analyze(text, ngrams=ngrams))


def analyze_batch(
    texts: Iterable[str | None], ngrams: int = 1
) -> list[list[tuple[str, int]]]:
    """Analyze a batch of documents → per-doc [(term, tf), ...] lists.

    The per-process memo in ``_analyze_token`` makes this effectively
    vectorized for natural-language batches: each distinct raw token pays
    the normalize+stem cost once per worker lifetime.
    """
    out: list[list[tuple[str, int]]] = []
    for text in texts:
        if not text:
            out.append([])
            continue
        out.append(sorted(term_counts(text, ngrams=ngrams).items()))
    return out
