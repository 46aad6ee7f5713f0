"""JSON review / text doc sources (reference LoadDoc family)."""

from __future__ import annotations

import json


def test_read_json_reviews(spark, tmp_path):
    from ir_base_spark.sources.docs import read_json_reviews

    doc = {
        "ProductInfo": {"ProductID": "p1"},
        "Reviews": [
            {"ReviewID": "r1", "Author": "a1", "Date": "2011-01-01",
             "Title": "great", "Content": "loved it", "Overall": "5.0"},
            {"ReviewID": "r2", "Author": "a2", "Date": "2011-01-02",
             "Title": "meh", "Content": "it was ok", "Overall": "3.0"},
            {"ReviewID": "r3", "Author": "a3", "Date": "2011-01-03",
             "Title": "?", "Content": "no rating", "Overall": "None"},
            {"ReviewID": "r4", "Author": "a4", "Date": "2011-01-04",
             "Title": "wow", "Content": "clamped", "Overall": "9.0"},
            {"ReviewID": "r5", "Author": "a5", "Date": "2011-01-05",
             "Title": "bad", "Content": "clamped low", "Overall": "-2"},
        ],
    }
    p = tmp_path / "p1.json"
    p.write_text(json.dumps(doc))
    got = {r["review_id"]: (r["rating"], r["label"], r["text"])
           for r in read_json_reviews(spark, str(p)).collect()}
    assert got["r1"] == (5, 1, "loved it")
    assert got["r2"] == (3, 0, "it was ok")
    assert got["r3"][0] == -1 and got["r3"][1] == 0   # "None" -> -1, neg class
    assert got["r4"][0] == 5                            # clamp high
    assert got["r5"][0] == 1                            # clamp low


def test_read_text_docs(spark, tmp_path):
    from ir_base_spark.sources.docs import read_text_docs

    (tmp_path / "a.txt").write_text("first doc\nwith two lines")
    (tmp_path / "b.txt").write_text("second doc")
    got = {r["doc_path"].rsplit("/", 1)[-1]: r["text"]
           for r in read_text_docs(spark, str(tmp_path)).collect()}
    assert got["a.txt"] == "first doc\nwith two lines"
    assert got["b.txt"] == "second doc"
