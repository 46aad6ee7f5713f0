"""Structured Streaming incremental ingest: catch-up, incrementality,
equivalence with the batch tokenizer."""

from __future__ import annotations

import os

from ir_base_spark.index.tokenize import tokenize_turns
from ir_base_spark.streaming.incremental import (
    load_stream_postings,
    start_incremental_ingest,
)


def _write_batch(spark, pdf, path):
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(path)


def test_incremental_ingest(spark, fixture_small, tmp_path):
    t = fixture_small.transcripts
    in_dir = str(tmp_path / "in")
    root = str(tmp_path / "idx")

    first, second = t.iloc[: len(t) // 2], t.iloc[len(t) // 2 :]
    _write_batch(spark, first, in_dir)

    q = start_incremental_ingest(spark, in_dir, root, available_now=True)
    q.awaitTermination(300)

    got1 = load_stream_postings(spark, root)
    exp1 = tokenize_turns(spark.createDataFrame(first))
    assert got1.count() == exp1.count()

    epochs_after_first = set(os.listdir(os.path.join(root, "postings_stream")))

    # new files arrive; resumed stream processes ONLY the new data
    _write_batch(spark, second, in_dir)
    q2 = start_incremental_ingest(spark, in_dir, root, available_now=True)
    q2.awaitTermination(300)

    epochs_after_second = set(os.listdir(os.path.join(root, "postings_stream")))
    assert epochs_after_first < epochs_after_second  # old epochs untouched

    got_all = load_stream_postings(spark, root)
    exp_all = tokenize_turns(spark.createDataFrame(t))
    assert got_all.count() == exp_all.count()
    # content equivalence with the batch kernel: postings multiset equal;
    # the is_doc_head flag marks SOME single row per doc (which row is an
    # internal, batch-composition-dependent choice of the Arrow kernel)
    def norm(rows):
        postings = sorted(
            (r["conv_id"], r["turn_idx"], r["term"], r["tf"], r["doc_len"])
            for r in rows
        )
        heads = {}
        for r in rows:
            k = (r["conv_id"], r["turn_idx"])
            heads[k] = heads.get(k, 0) + r["is_doc_head"]
        return postings, heads

    a = norm(got_all.drop("epoch").collect())
    b = norm(exp_all.collect())
    assert a[0] == b[0]
    assert a[1] == b[1]
    assert all(v == 1 for v in a[1].values())
