"""Property fuzz of the pure-Python WAND kernel vs brute force.

Catches pruning-soundness bugs (e.g. under-counted block-max bounds)
without Spark in the loop. Negative weights are included deliberately:
BM25 IDF goes negative for DF > N/2 and the kernel's UB clamping must
stay sound.
"""

from __future__ import annotations

import numpy as np

from ir_base_spark.index.blocks import encode_postings_block
from ir_base_spark.query.wand import _ListIter, _wand_bucket


def _run_trial(rng) -> None:
    n_docs = int(rng.integers(5, 300))
    n_terms = int(rng.integers(1, 7))
    k = int(rng.integers(1, 15))
    block_size = int(rng.integers(2, 10))
    lists = []
    truth: dict[int, float] = {}
    for tid in range(n_terms):
        n_post = int(rng.integers(1, n_docs + 1))
        ids = np.sort(rng.choice(n_docs, size=n_post, replace=False)).astype(np.int64)
        ws = rng.normal(loc=1.0, size=n_post)
        qw = float(rng.integers(1, 4))
        firsts, lasts, maxws, gaps, wb = [], [], [], [], []
        for off in range(0, n_post, block_size):
            f, l, m, g, w_ = encode_postings_block(
                ids[off : off + block_size], ws[off : off + block_size]
            )
            firsts.append(f)
            lasts.append(l)
            maxws.append(m)
            gaps.append(g)
            wb.append(w_)
        lists.append(
            _ListIter(
                tid, qw,
                np.array(firsts, dtype=np.int64),
                np.array(lasts, dtype=np.int64),
                np.array(maxws, dtype=np.float64),
                gaps, wb,
            )
        )
        for d, w2 in zip(ids, ws):
            truth[d] = truth.get(d, 0.0) + qw * float(w2)
    expect = sorted(truth.items(), key=lambda t: (-t[1], t[0]))[:k]
    got = _wand_bucket(lists, k)
    assert len(got) == len(expect)
    for g, e in zip(got, expect):
        assert g[0] == e[0], f"doc {g[0]} vs {e[0]}"
        assert abs(g[1] - e[1]) < 1e-12


def test_wand_kernel_fuzz():
    rng = np.random.default_rng(1234)
    for _ in range(250):
        _run_trial(rng)


def _run_maxscore_trial(rng) -> None:
    from ir_base_spark.query.wand import _maxscore_query

    n_docs = int(rng.integers(5, 300))
    n_terms = int(rng.integers(1, 7))
    k = int(rng.integers(1, 15))
    chunk = int(rng.integers(2, 40))  # tiny chunks stress θ/frontier logic
    lists = []
    truth: dict[int, float] = {}
    for tid in range(n_terms):
        n_post = int(rng.integers(1, n_docs + 1))
        ids = np.sort(rng.choice(n_docs, size=n_post, replace=False)).astype(
            np.int64
        )
        ws = rng.normal(loc=1.0, size=n_post)
        qw = float(rng.integers(1, 4))
        ub = max(0.0, qw * float(ws.max()))
        lists.append((tid, qw, ids, ws.astype(np.float64), ub))
        for d, w2 in zip(ids, ws):
            truth[d] = truth.get(d, 0.0) + qw * float(w2)
    expect = sorted(truth.items(), key=lambda t: (-t[1], t[0]))[:k]
    docs, scores = _maxscore_query(lists, k, chunk=chunk)
    order = np.lexsort((docs, -scores))[:k]
    got = [(int(docs[i]), float(scores[i])) for i in order]
    assert len(got) == len(expect)
    for g, e in zip(got, expect):
        assert g[0] == e[0], f"doc {g[0]} vs {e[0]}"
        assert abs(g[1] - e[1]) < 1e-12


def test_maxscore_kernel_fuzz():
    """Chunked-MaxScore pruning soundness vs brute force, including
    negative weights (clamped UBs) and tiny chunk sizes."""
    rng = np.random.default_rng(4321)
    for _ in range(250):
        _run_maxscore_trial(rng)


def _run_bmw_trial(rng) -> None:
    from ir_base_spark.query.wand import _bmw_query

    n_docs = int(rng.integers(5, 300))
    n_terms = int(rng.integers(1, 7))
    k = int(rng.integers(1, 15))
    block_size = int(rng.integers(2, 10))
    lists = []
    truth: dict[int, float] = {}
    for tid in range(n_terms):
        n_post = int(rng.integers(1, n_docs + 1))
        ids = np.sort(rng.choice(n_docs, size=n_post, replace=False)).astype(
            np.int64
        )
        ws = rng.normal(loc=1.0, size=n_post)
        qw = float(rng.integers(1, 4))
        firsts, lasts, maxws, gaps, wb = [], [], [], [], []
        for off in range(0, n_post, block_size):
            f, l, m, g, w_ = encode_postings_block(
                ids[off : off + block_size], ws[off : off + block_size]
            )
            firsts.append(f)
            lasts.append(l)
            maxws.append(m)
            gaps.append(g)
            wb.append(w_)
        maxws_arr = np.array(maxws, dtype=np.float64)
        ub = max(0.0, qw * float(maxws_arr.max()))
        lists.append(
            (
                tid, qw,
                np.array(firsts, dtype=np.int64),
                np.array(lasts, dtype=np.int64),
                maxws_arr, gaps, wb, None, ub,
            )
        )
        for d, w2 in zip(ids, ws):
            truth[d] = truth.get(d, 0.0) + qw * float(w2)
    expect = sorted(truth.items(), key=lambda t: (-t[1], t[0]))[:k]
    docs, scores = _bmw_query(lists, k, cache={})
    order = np.lexsort((docs, -scores))[:k]
    got = [(int(docs[i]), float(scores[i])) for i in order]
    assert len(got) == len(expect)
    for g, e in zip(got, expect):
        assert g[0] == e[0], f"doc {g[0]} vs {e[0]}"
        assert abs(g[1] - e[1]) < 1e-12


def test_bmw_vectorized_kernel_fuzz():
    """Vectorized block-max WAND (the algo='wand' production kernel)
    pruning soundness vs brute force: tiny blocks stress the window
    boundary logic, negative weights stress the clamped bounds."""
    rng = np.random.default_rng(9999)
    for _ in range(250):
        _run_bmw_trial(rng)
