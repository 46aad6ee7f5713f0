"""Unit tests for the varbyte/delta-gap block codec."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ir_base_spark.index.blocks import (
    decode_postings_block,
    encode_postings_block,
    varbyte_decode,
    varbyte_encode,
)


def test_varbyte_roundtrip_simple():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**31, 2**40], dtype=np.uint64)
    assert (varbyte_decode(varbyte_encode(vals)) == vals).all()


def test_varbyte_empty():
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0


@given(
    st.lists(st.integers(min_value=0, max_value=2**42), min_size=0, max_size=300)
)
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    out = varbyte_decode(varbyte_encode(arr))
    assert (out == arr).all()


def test_varbyte_compression_ratio():
    # small gaps should take ~1 byte each vs 8 for raw int64
    gaps = np.random.default_rng(0).integers(1, 100, size=1000).astype(np.uint64)
    enc = varbyte_encode(gaps)
    assert len(enc) <= 1000  # all < 128 -> exactly 1 byte each


def test_block_roundtrip():
    rng = np.random.default_rng(7)
    ids = np.sort(rng.choice(10_000_000, size=128, replace=False)).astype(np.int64)
    ws = rng.normal(size=128)
    first, last, mx, gaps, wbytes = encode_postings_block(ids, ws)
    assert first == ids[0] and last == ids[-1]
    assert mx == ws.max()
    rids, rws = decode_postings_block(first, gaps, wbytes)
    assert (rids == ids).all()
    assert (rws == ws).all()  # float64 bit-exact


@given(st.data())
@settings(max_examples=100, deadline=None)
def test_block_roundtrip_property(data):
    n = data.draw(st.integers(min_value=1, max_value=200))
    start = data.draw(st.integers(min_value=0, max_value=2**40))
    gaps = data.draw(
        st.lists(st.integers(min_value=1, max_value=2**20), min_size=n, max_size=n)
    )
    ids = start + np.cumsum(np.array([0] + gaps[:-1], dtype=np.int64))
    ws = np.linspace(-5, 5, n)
    first, last, mx, enc, wbytes = encode_postings_block(ids, ws)
    rids, rws = decode_postings_block(first, enc, wbytes)
    assert (rids == ids).all()
    assert (rws == ws).all()
