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
