"""SentiWordNet dictionary fold + doc scoring vs a pure-Python replica
(stemmed path — the entry's oracle covers the unstemmed one)."""

from __future__ import annotations

from ir_base_spark.ops.senti import (
    LEXICON_DDL,
    make_senti_lexicon,
    sentiword_doc_scores,
    sentiwordnet_dictionary,
)
from ir_base_spark.text.porter2 import stem

TAG_CLASS = {
    "NN": "n", "NNS": "n", "NNP": "n", "NNPS": "n",
    "JJ": "a", "JJR": "a", "JJS": "a",
    "VB": "v", "VBD": "v", "VBG": "v",
    "RB": "r", "RBR": "r", "RBS": "r",
}


def _norm(w: str) -> str:
    import re

    w = re.sub(r"\W+", "", w).lower()
    return "NUM" if w.isdigit() else w


def _replica_dict(lexicon, do_stem):
    senses: dict[str, dict[int, float]] = {}
    for pos, _sid, ps, ns, terms in lexicon:
        for tr in terms.split(" "):
            word, rank = tr.split("#")
            w = _norm(word)
            if do_stem:
                w = stem(w)
            senses.setdefault(f"{w}#{pos}", {})[int(rank)] = ps - ns
    out = {}
    for key, by_rank in senses.items():
        score, count = 0.0, 0
        for _r, s in sorted(by_rank.items()):
            if s != 0:
                score += s
                count += 1
            if score != 0:
                score = score / count
        out[key] = score
    return out


def test_dictionary_fold_matches_replica(spark):
    lex = spark.createDataFrame(make_senti_lexicon(), LEXICON_DDL)
    for do_stem in (True, False):
        got = {
            r["key"]: r["score"]
            for r in sentiwordnet_dictionary(lex, stem=do_stem).collect()
        }
        want = _replica_dict(make_senti_lexicon(), do_stem)
        assert got == want  # bit-identical fold


def test_doc_scores_match_replica(spark):
    docs = [
        (1, ["fast", "running", "scan", "zzz"], ["JJ", "VBG", "NN", "NN"]),
        (2, ["slowly", "table"], ["RB", "NN"]),
        (3, ["123", "fast"], ["NN", "NN"]),
    ]
    lex_rows = make_senti_lexicon() + [
        ("v", "100", 0.5, 0.0, "run#1"),
        ("r", "101", 0.0, 0.75, "slowli#1"),
        ("a", "102", 0.25, 0.0, "fast#1"),
        ("n", "103", 0.125, 0.0, "123#2"),
    ]
    lex = spark.createDataFrame(lex_rows, LEXICON_DDL)
    d = sentiwordnet_dictionary(lex, stem=True)
    df = spark.createDataFrame(
        docs, "doc_id long, tokens array<string>, pos_tags array<string>"
    )
    got = {
        r["doc_id"]: r["senti_score"]
        for r in sentiword_doc_scores(df, d, stem=True).collect()
    }
    dict_ = _replica_dict(lex_rows, True)
    for doc_id, toks, tags in docs:
        s = 0.0
        for w, t in zip(toks, tags):
            key = f"{stem(_norm(w))}#{TAG_CLASS.get(t, t)}"
            s += dict_.get(key, 0.0)
        assert abs(got[doc_id] - s / len(toks)) < 1e-12, doc_id
