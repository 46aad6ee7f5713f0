"""svmlight source/sink: roundtrip + reference byte format."""

from __future__ import annotations

import glob

from ir_base_spark.sources.svmlight import (
    postings_to_svmlight_rows,
    read_svmlight,
    write_svmlight,
)


def test_svmlight_roundtrip(spark, tmp_path):
    rows = [
        (1, [0, 3, 7], [0.5, 1.25, 2.0], "itemA", "rev1"),
        (0, [2], [3.0], "itemB", "rev2"),
        (3, [1, 2], [0.1, 0.2], None, None),  # no comment trailer
    ]
    df = spark.createDataFrame(
        rows,
        "label int, indices array<int>, values array<double>, "
        "item_id string, doc_name string",
    )
    out = str(tmp_path / "vct")
    write_svmlight(df, out)

    # on-disk format matches the reference writer: 1-based idx, %f values
    text = ""
    for f in sorted(glob.glob(out + "/part-*")):
        with open(f) as fh:
            text += fh.read()
    lines = sorted(line for line in text.splitlines() if line)
    assert "1 1:0.500000 4:1.250000 8:2.000000 #itemA-rev1" in lines
    assert "0 3:3.000000 #itemB-rev2" in lines
    assert "3 2:0.100000 3:0.200000" in lines

    back = {
        (r["label"], tuple(r["indices"])): (
            tuple(r["values"]), r["item_id"], r["doc_name"]
        )
        for r in read_svmlight(spark, out).collect()
    }
    assert back[(1, (0, 3, 7))] == ((0.5, 1.25, 2.0), "itemA", "rev1")
    assert back[(0, (2,))] == ((3.0,), "itemB", "rev2")
    assert back[(3, (1, 2))] == ((0.1, 0.2), None, None)


def test_svmlight_min_tokens_filter(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, [0], [1.0], None, None), (0, [1, 2, 3], [1.0, 2.0, 3.0], None, None)],
        "label int, indices array<int>, values array<double>, "
        "item_id string, doc_name string",
    )
    out = str(tmp_path / "vct2")
    write_svmlight(df, out)
    # threshold 2: a line with label + 1 feature has 2 tokens -> dropped
    kept = read_svmlight(spark, out, min_tokens=2).collect()
    assert len(kept) == 1 and kept[0]["label"] == 0


def test_postings_to_svmlight_rows(spark):
    w = spark.createDataFrame(
        [(10, 5, 0.5), (10, 1, 0.25), (11, 2, 1.0)],
        "doc_id long, term_id long, weight double",
    )
    lab = spark.createDataFrame([(10, 1), (11, 0)], "doc_id long, label int")
    got = {
        r["doc_id"]: (r["label"], list(r["indices"]), list(r["values"]))
        for r in postings_to_svmlight_rows(w, lab, ["doc_id"]).collect()
    }
    # term_id ascending within the sparse vector
    assert got[10] == (1, [1, 5], [0.25, 0.5])
    assert got[11] == (0, [2], [1.0])
