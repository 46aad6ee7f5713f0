"""Resumability: killed builds restart without recomputing done work."""

from __future__ import annotations

import os
import shutil

from ir_base_spark.index.manifest import (
    finalize_index,
    read_manifest,
    resumable_build,
)


def _file_states(root: str) -> dict[str, tuple[float, int]]:
    out = {}
    for r, _d, files in os.walk(root):
        for f in files:
            p = os.path.join(r, f)
            st = os.stat(p)
            out[os.path.relpath(p, root)] = (st.st_mtime_ns, st.st_size)
    return out


def test_resume_skips_completed_partitions(spark, fixture_small, tmp_path):
    t = spark.createDataFrame(fixture_small.transcripts)
    root = str(tmp_path / "idx")
    P = 8

    r1 = resumable_build(spark, t, root, num_partitions=P)
    assert r1.partitions_built == P and r1.partitions_skipped == 0
    assert len(read_manifest(root)) == P

    # full no-op resume: nothing recomputed
    before = _file_states(os.path.join(root, "postings"))
    r2 = resumable_build(spark, t, root, num_partitions=P)
    assert r2.partitions_built == 0 and r2.partitions_skipped == P
    assert _file_states(os.path.join(root, "postings")) == before

    # simulate a kill: drop manifest rows + outputs for 3 partitions
    killed = [1, 4, 6]
    for pid in killed:
        os.remove(os.path.join(root, "manifest", f"p{pid}.json"))
        out_dir = os.path.join(root, "postings", f"partition_id={pid}")
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
    survivors = {
        k: v for k, v in before.items()
        if not any(f"partition_id={pid}/" in k for pid in killed)
    }

    r3 = resumable_build(spark, t, root, num_partitions=P)
    assert r3.partitions_built == len(killed)
    assert r3.partitions_skipped == P - len(killed)

    after = _file_states(os.path.join(root, "postings"))
    # untouched partitions: byte-identical, not recomputed (same mtime)
    for k, v in survivors.items():
        assert after[k] == v, f"partition output {k} was recomputed"


    # manifest rows carry lineage + metrics
    man = read_manifest(root)
    assert len(man) == P
    snap = {m.snapshot_id for m in man.values()}
    assert len(snap) == 1
    for m in man.values():
        if m.turns:
            assert m.postings_written > 0
            assert m.bytes_compressed > 0
            assert m.turns_per_sec >= 0


def test_resume_rejects_changed_build_params(spark, fixture_small, tmp_path):
    """Same root + same input but different tokenizer params must be
    refused: the input snapshot id cannot see the params, and mixing
    postings/term-partials built under two tokenizers would be silent
    corruption (r5 ADVICE item on load_term_partials staleness)."""
    import pytest

    t = spark.createDataFrame(fixture_small.transcripts)
    root = str(tmp_path / "idx_params")
    resumable_build(spark, t, root, num_partitions=4)
    with pytest.raises(ValueError, match="built with params"):
        resumable_build(spark, t, root, num_partitions=4, ngrams=2)


def test_resumed_index_identical_to_fresh(spark, fixture_small, tmp_path):
    t = spark.createDataFrame(fixture_small.transcripts)
    root_a = str(tmp_path / "a")
    root_b = str(tmp_path / "b")
    P = 4

    resumable_build(spark, t, root_a, num_partitions=P)

    resumable_build(spark, t, root_b, num_partitions=P)
    for pid in (0, 2):
        os.remove(os.path.join(root_b, "manifest", f"p{pid}.json"))
        shutil.rmtree(os.path.join(root_b, "postings", f"partition_id={pid}"))
    resumable_build(spark, t, root_b, num_partitions=P)

    ia = finalize_index(spark, root_a)
    ib = finalize_index(spark, root_b)
    assert ia.n_docs == ib.n_docs
    assert ia.avg_doc_len == ib.avg_doc_len
    ta = {tuple(r) for r in ia.terms.collect()}
    tb = {tuple(r) for r in ib.terms.collect()}
    assert ta == tb
    wa = {tuple(r) for r in ia.weights.collect()}
    wb = {tuple(r) for r in ib.weights.collect()}
    assert wa == wb


def test_finalize_pruning_identity(spark, fixture_small, tmp_path):
    """finalize_index(min_df/max_df) must re-project doc stats onto the
    pruned dictionary exactly like build_index's pruning branch."""
    from ir_base_spark.index.build import build_index

    t = spark.createDataFrame(fixture_small.transcripts)
    root = str(tmp_path / "idx")
    resumable_build(spark, t, root, num_partitions=4)

    fin = finalize_index(spark, root, min_df=3, max_df=500)
    ref = build_index(spark, t, min_df=3, max_df=500)

    assert fin.n_docs == ref.n_docs
    assert abs(fin.avg_doc_len - ref.avg_doc_len) < 1e-12
    ta = {tuple(r) for r in fin.terms.collect()}
    tb = {tuple(r) for r in ref.terms.collect()}
    assert ta == tb
    wa = {(r[0], r[1], r[2], round(r[3], 12)) for r in fin.weights.collect()}
    wb = {(r[0], r[1], r[2], round(r[3], 12)) for r in ref.weights.collect()}
    assert wa == wb
