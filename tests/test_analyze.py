"""Unit tests for the tokenize→normalize→stem→n-gram pipeline."""

from __future__ import annotations

from ir_base_spark.text.analyze import (
    analyze,
    normalize_token,
    term_counts,
)
from ir_base_spark.text.stopwords import analyzed_stopwords


def test_normalize_nfkc_and_case():
    assert normalize_token("Hello,") == "hello"
    assert normalize_token("ＦＵＬＬＷＩＤＴＨ") == "fullwidth"  # NFKC fold
    assert normalize_token("can't") == "cant"
    assert normalize_token("...") == ""


def test_normalize_num_fold():
    assert normalize_token("12345") == "NUM"
    assert normalize_token("007") == "NUM"
    assert normalize_token("１２３") == "NUM"  # fullwidth digits via NFKC
    assert normalize_token("a123") == "a123"  # mixed is not a number


def test_length_bounds():
    assert analyze("a") == []  # len<=1 dropped
    assert analyze("x" * 25) == []  # len>=20 dropped
    assert analyze("ab") == ["ab"]


def test_stopwords_dropped():
    assert analyze("the cat and the hat") == ["cat", "hat"]
    assert "the" in {normalize_token(w) for w in ("the",)}
    assert "onli" in analyzed_stopwords()  # 'only' stems to 'onli'


def test_stemming_applied():
    assert analyze("running dogs") == ["run", "dog"]
    assert analyze("flies") == ["fli"]


def test_num_is_term():
    assert analyze("version 42 shipped") == ["version", "NUM", "ship"]


def test_empty_and_whitespace():
    assert analyze("") == []
    assert analyze("    ") == []
    assert analyze(None if False else "\t\n") == []


def test_term_counts():
    tc = term_counts("cat cat dog 7 7 7")
    assert tc == {"cat": 2, "dog": 1, "NUM": 3}


def test_bigrams_chain_and_legitimacy():
    # 'the' is a stopword: not legit, so neither the unigram NOR any
    # bigram containing it is emitted — the reference ANDs legitimacy
    # across constituents (DocAnalyzer.java:249 ``legit &= isLegit``).
    toks = analyze("the cat", ngrams=2)
    assert toks == ["cat"]
    assert analyze("big cat", ngrams=2) == ["big", "cat", "big-cat"]
    # punctuation-only token breaks the chain
    toks2 = analyze("cat ... dog", ngrams=2)
    assert "cat-dog" not in toks2
    # a stopword mid-trigram poisons every gram that spans it
    toks3 = analyze("big the cat", ngrams=3)
    assert "big-the-cat" not in toks3 and "the-cat" not in toks3


def test_bigram_order_of_emission():
    toks = analyze("big cat runs", ngrams=2)
    assert toks == ["big", "cat", "big-cat", "run", "cat-run"]


def test_vectorized_tokenizer_matches_per_row(spark):
    """The batch-level unigram kernel must emit exactly the per-row
    term_counts result (tf, doc_len, one head per surviving turn)."""
    import pandas as pd

    from ir_base_spark.index.tokenize import tokenize_turns

    rows = [
        ("c1", 0, "The cat and the hat ran far away 42 times"),
        ("c1", 1, ""),
        ("c2", 0, None),
        ("c2", 1, "running dogs running FLIES ... cats!! 7 7"),
        ("c3", 0, "a"),  # analyzes to nothing (len<=1)
        ("c3", 1, "ＦＵＬＬＷＩＤＴＨ text with unicode ﬁ ligatures"),
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"])
    t = spark.createDataFrame(pdf)

    for analyzer in ("reference", "simple"):
        for mdt in (0, 2):
            got = {
                (r["conv_id"], r["turn_idx"], r["term"]): (
                    r["tf"], r["doc_len"], r["is_doc_head"]
                )
                for r in tokenize_turns(
                    t, analyzer=analyzer, min_distinct_terms=mdt
                ).collect()
            }
            exp = {}
            heads = {}
            for conv_id, turn_idx, text in rows:
                tc = term_counts(text or "", analyzer=analyzer)
                if len(tc) <= mdt:
                    continue
                dl = float(sum(tc.values()))
                for term, tf in tc.items():
                    exp[(conv_id, turn_idx, term)] = (float(tf), dl)
            assert set(got) == set(exp), (analyzer, mdt)
            for k, (tf, dl) in exp.items():
                assert got[k][0] == tf and got[k][1] == dl, (analyzer, mdt, k)
            # exactly one head row per surviving turn
            per_turn = {}
            for (c, ti, _), (_, _, h) in got.items():
                per_turn[(c, ti)] = per_turn.get((c, ti), 0) + h
            assert all(v == 1 for v in per_turn.values()), (analyzer, mdt)
