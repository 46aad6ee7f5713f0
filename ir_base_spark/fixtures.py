"""Deterministic synthetic fixtures per FIXTURES.md.

Generates the ``transcripts`` table (conv_id, turn_idx, role, text, tool,
ts — exactly the BASELINE.json:15 input shape) and the reference query
set, entirely from a fixed seed: no external data. The vocabulary is
Zipf-distributed with a hot head (exercises salted term-shard merges),
mixed with digit tokens (NUM folding), cased/punctuated variants
(NFKC/\\W path), stopwords, length-bound violators, and inflected forms
(Porter2 path) — see FIXTURES.md §1.

The generator emits plain pandas DataFrames; callers hand them to Spark
(`spark.createDataFrame`) or the oracle directly. Output is a pure
function of (seed, n_conversations), so fixture scale can grow for bench
runs without changing content at smaller scales' semantics.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from .text.stopwords import RAW_STOPWORDS

ROLES = ("user", "assistant", "system", "tool")
TOOLS = ("search", "browser", "python", "bash", "calculator", "")

_CONSONANTS = "bcdfghjklmnpqrstvwz"
_VOWELS = "aeiou"
_SUFFIXES = ("", "", "", "", "s", "ing", "ed", "ies", "ation", "ness", "ly")


def _make_vocab(rng: np.random.Generator, n_lemmas: int = 5000) -> list[str]:
    """Pronounceable CVC-trigram lemmas, deterministic, deduped."""
    vocab: list[str] = []
    seen: set[str] = set()
    while len(vocab) < n_lemmas:
        k = int(rng.integers(1, 4))  # 1..3 syllables
        word = "".join(
            _CONSONANTS[int(rng.integers(len(_CONSONANTS)))]
            + _VOWELS[int(rng.integers(len(_VOWELS)))]
            + (_CONSONANTS[int(rng.integers(len(_CONSONANTS)))] if rng.random() < 0.5 else "")
            for _ in range(k)
        )
        if word not in seen and len(word) >= 2:
            seen.add(word)
            vocab.append(word)
    return vocab


@dataclass
class TranscriptFixture:
    transcripts: pd.DataFrame
    queries: pd.DataFrame
    vocab: list[str]


def _zipf_probs(n: int, s: float = 1.07) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks ** (-s)
    return p / p.sum()


def make_transcripts(
    n_conversations: int = 200,
    seed: int = 42,
    n_lemmas: int = 5000,
) -> pd.DataFrame:
    """Synthesize the transcripts table (FIXTURES.md §1)."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_make_vocab(rng, n_lemmas))
    probs = _zipf_probs(len(vocab))
    stop = np.array([w for w in RAW_STOPWORDS if "'" not in w])

    rows: list[tuple] = []
    base_ts = np.datetime64("2025-01-01T00:00:00")
    for c in range(n_conversations):
        conv_id = f"conv-{c:08d}"
        n_turns = 3 + int(rng.geometric(0.08))
        n_turns = min(n_turns, 40)
        conv_start = base_ts + np.timedelta64(int(rng.integers(0, 10_000_000)), "s")
        ts = conv_start
        for t in range(n_turns):
            role = ROLES[int(rng.integers(len(ROLES)))]
            tool = TOOLS[int(rng.integers(len(TOOLS) - 1))] if role == "tool" else ""
            # ~1% empty/whitespace turns (edge case)
            if rng.random() < 0.01:
                text = "   " if rng.random() < 0.5 else ""
            else:
                n_tok = int(np.clip(rng.lognormal(2.7, 0.9), 5, 300))
                words = rng.choice(vocab, size=n_tok, p=probs).astype(object)
                for i in range(n_tok):
                    r = rng.random()
                    if r < 0.30:
                        words[i] = stop[int(rng.integers(len(stop)))]
                    elif r < 0.34:
                        words[i] = str(int(rng.integers(0, 99999)))  # NUM fold
                    elif r < 0.38:
                        words[i] = words[i] + _SUFFIXES[int(rng.integers(len(_SUFFIXES)))]
                    elif r < 0.41:
                        words[i] = words[i].capitalize() + ","  # case+punct
                    elif r < 0.425:
                        words[i] = words[i][0]  # len-1 (dropped by filter)
                    elif r < 0.435:
                        words[i] = words[i] * 8  # >=20 chars (dropped)
                text = " ".join(words.tolist())
            ts = ts + np.timedelta64(int(rng.integers(1, 600)), "s")
            rows.append((conv_id, t, role, text, tool, pd.Timestamp(ts)))

    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ).astype({"turn_idx": "int32"})


def make_transcripts_spark(
    spark,
    n_conversations: int,
    seed: int = 42,
    n_lemmas: int = 5000,
    partitions: int = 64,
):
    """Distributed synthetic transcripts generator (bench scale).

    Content is deterministic per (seed, conv_id) — each conversation gets
    its own numpy Generator — so output is independent of partitioning.
    Used for large scaling-run corpora where the driver-side pandas
    generator would be the bottleneck; pytest correctness fixtures keep
    using ``make_transcripts`` (identical schema and token mix).
    """
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    # vocab must match the driver-side generator's construction
    vocab_rng = np.random.default_rng(seed)
    vocab = np.array(_make_vocab(vocab_rng, n_lemmas))
    probs = _zipf_probs(len(vocab))
    stop = np.array([w for w in RAW_STOPWORDS if "'" not in w])
    base_ts = np.datetime64("2025-01-01T00:00:00")

    def gen(batches):
        for pdf in batches:
            rows = []
            for c in pdf["id"].tolist():
                rng = np.random.default_rng((seed << 20) ^ c)
                conv_id = f"conv-{c:08d}"
                n_turns = min(3 + int(rng.geometric(0.08)), 40)
                ts = base_ts + np.timedelta64(int(rng.integers(0, 10_000_000)), "s")
                for t in range(n_turns):
                    role = ROLES[int(rng.integers(len(ROLES)))]
                    tool = (
                        TOOLS[int(rng.integers(len(TOOLS) - 1))]
                        if role == "tool"
                        else ""
                    )
                    if rng.random() < 0.01:
                        text = "   " if rng.random() < 0.5 else ""
                    else:
                        n_tok = int(np.clip(rng.lognormal(2.7, 0.9), 5, 300))
                        words = rng.choice(vocab, size=n_tok, p=probs).astype(object)
                        for i in range(n_tok):
                            r = rng.random()
                            if r < 0.30:
                                words[i] = stop[int(rng.integers(len(stop)))]
                            elif r < 0.34:
                                words[i] = str(int(rng.integers(0, 99999)))
                            elif r < 0.38:
                                words[i] = words[i] + _SUFFIXES[
                                    int(rng.integers(len(_SUFFIXES)))
                                ]
                            elif r < 0.41:
                                words[i] = words[i].capitalize() + ","
                            elif r < 0.425:
                                words[i] = words[i][0]
                            elif r < 0.435:
                                words[i] = words[i] * 8
                        text = " ".join(words.tolist())
                    ts = ts + np.timedelta64(int(rng.integers(1, 600)), "s")
                    rows.append((conv_id, t, role, text, tool, pd.Timestamp(ts)))
            yield pd.DataFrame(
                rows,
                columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
            ).astype({"turn_idx": "int32"})

    ids = spark.range(0, n_conversations, 1, partitions).withColumnRenamed(
        "id", "id"
    )
    return ids.mapInPandas(
        gen,
        schema=(
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp"
        ),
    )


def make_queries(
    transcripts: pd.DataFrame,
    n_queries: int = 100,
    seed: int = 4242,
) -> pd.DataFrame:
    """Reference query set (FIXTURES.md §2): 1-8 terms, mixed head/tail/
    stopword/unknown/digit tokens; k in {1, 10, 25, 100}."""
    rng = np.random.default_rng(seed)
    # source words from the corpus itself (head + tail mix)
    all_words = pd.Series(
        " ".join(transcripts["text"].head(2000).tolist()).split()
    )
    uniq = all_words.drop_duplicates().reset_index(drop=True)
    counts = all_words.value_counts()
    head = counts.head(50).index.to_numpy(dtype=object)
    ks = np.array([1, 10, 25, 100])
    rows = []
    for q in range(n_queries):
        n_terms = int(rng.integers(1, 9))
        terms = []
        for _ in range(n_terms):
            r = rng.random()
            if r < 0.35:
                terms.append(str(head[int(rng.integers(len(head)))]))
            elif r < 0.80:
                terms.append(str(uniq.iloc[int(rng.integers(len(uniq)))]))
            elif r < 0.88:
                terms.append("zzzunknownzzz")  # OOV
            elif r < 0.95:
                terms.append(str(int(rng.integers(0, 99999))))  # digits
            else:
                terms.append("the")  # stopword
        rows.append((f"q-{q:04d}", " ".join(terms), int(ks[int(rng.integers(4))])))
    return pd.DataFrame(rows, columns=["query_id", "query_text", "k"])


def make_fixture(
    n_conversations: int = 200, seed: int = 42, n_queries: int = 100
) -> TranscriptFixture:
    t = make_transcripts(n_conversations=n_conversations, seed=seed)
    q = make_queries(t, n_queries=n_queries, seed=seed + 4200)
    return TranscriptFixture(transcripts=t, queries=q, vocab=[])
