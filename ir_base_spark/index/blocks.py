"""Compressed posting blocks: delta-gap + varbyte, per-block max-score.

The reference keeps postings as boxed Java objects (~32 B/posting,
/root/reference/src/structures/_SparseFeature.java); at 10^12 turns the
engine instead stores term-major posting blocks:

    (term_id, bucket, block_seq, n, first_doc, last_doc, max_weight,
     doc_gaps: binary, weights: binary)

- doc ids are dense longs ranked by (conv_id, turn_idx) — so ascending
  doc_id IS the stable turn ordering, and delta gaps are small;
- gaps are varbyte-encoded (vectorized numpy encode/decode, no per-value
  Python in the build hot path);
- weights stay float64 (rank identity forbids quantization); stored as
  raw little-endian bytes;
- ``max_weight`` per block drives block-max WAND pruning (query/wand.py).

Hot-term skew (SURVEY §4, §7.3): the build groups by (term_id, bucket)
where bucket = doc_id >> bucket_bits — a *doc-range* salt. A Zipf-head
term's postings split across many buckets that build independently and
IN GLOBAL DOC ORDER, so no single reducer sees a whole hot posting list
and no second merge stage is needed: block order within a term is simply
(bucket, block_seq). This replaces the naive hash-salt + re-merge
two-stage plan with one shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BLOCK_SIZE = 128
DEFAULT_BUCKET_BITS = 16  # 65536 docs per bucket

BLOCK_SCHEMA = (
    "term_id long, bucket int, block_seq int, n int, first_doc long, "
    "last_doc long, max_weight double, doc_gaps binary, weights binary"
)


# ---------------------------------------------------------------- varbyte

def varbyte_encode(values: np.ndarray) -> bytes:
    """Vectorized varbyte (7-bit groups, MSB=continuation) encoder."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    nbytes = np.ones(v.shape, dtype=np.int64)
    tmp >>= np.uint64(7)
    while tmp.any():
        nbytes += (tmp > 0).astype(np.int64)
        tmp >>= np.uint64(7)
    del nbits
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    max_b = int(nbytes.max())
    for j in range(max_b):
        mask = nbytes > j
        pos = starts[mask] + j
        byte = ((v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] - 1 > j).astype(np.uint8) << 7
        out[pos] = byte | cont
    return out.tobytes()


def varbyte_decode(buf: bytes) -> np.ndarray:
    """Vectorized varbyte decoder → uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    group = np.zeros(b.shape, dtype=np.int64)
    group[1:] = np.cumsum(is_last[:-1])
    n = int(is_last.sum())
    starts = np.zeros(n, dtype=np.int64)
    ends = np.flatnonzero(is_last)
    starts[1:] = ends[:-1] + 1
    idx_in_group = np.arange(b.size, dtype=np.int64) - starts[group]
    contrib = (b.astype(np.uint64) & np.uint64(0x7F)) << (
        np.uint64(7) * idx_in_group.astype(np.uint64)
    )
    values = np.zeros(n, dtype=np.uint64)
    np.add.at(values, group, contrib)
    return values


def encode_postings_block(
    doc_ids: np.ndarray, weights: np.ndarray
) -> tuple[int, int, float, bytes, bytes]:
    """One block: (first_doc, last_doc, max_weight, gaps_varbyte, w_bytes).

    Gaps: first value is 0 (first_doc is carried absolutely in the block
    row), then successive deltas — all >= 1 within a sorted unique list.
    """
    ids = np.asarray(doc_ids, dtype=np.int64)
    w = np.asarray(weights, dtype=np.float64)
    gaps = np.empty(ids.shape, dtype=np.uint64)
    gaps[0] = 0
    np.subtract(ids[1:], ids[:-1], out=gaps[1:], casting="unsafe")
    return (
        int(ids[0]),
        int(ids[-1]),
        float(w.max()),
        varbyte_encode(gaps),
        w.tobytes(),
    )


def decode_postings_block(
    first_doc: int, doc_gaps: bytes, weights: bytes
) -> tuple[np.ndarray, np.ndarray]:
    gaps = varbyte_decode(doc_gaps).astype(np.int64)
    gaps[0] = first_doc
    ids = np.cumsum(gaps)
    w = np.frombuffer(weights, dtype=np.float64)
    return ids, w


# ---------------------------------------------------------------- build

@dataclass
class BlockIndex:
    blocks: DataFrame   # BLOCK_SCHEMA
    docs: DataFrame     # doc_id, conv_id, turn_idx, doc_len
    terms: DataFrame    # term, term_id, df, ttf
    n_docs: int
    avg_doc_len: float
    ngrams: int
    block_size: int
    bucket_bits: int


def _make_block_builder(block_size: int):
    def build_blocks(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        ws = pdf["weight"].to_numpy(dtype=np.float64)
        term_id = int(pdf["term_id"].iloc[0])
        bucket = int(pdf["bucket"].iloc[0])
        rows = []
        for seq, off in enumerate(range(0, len(ids), block_size)):
            bi, bw = ids[off : off + block_size], ws[off : off + block_size]
            first, last, mx, gaps, wbytes = encode_postings_block(bi, bw)
            rows.append((term_id, bucket, seq, len(bi), first, last, mx, gaps, wbytes))
        return pd.DataFrame(
            rows,
            columns=[
                "term_id", "bucket", "block_seq", "n", "first_doc",
                "last_doc", "max_weight", "doc_gaps", "weights",
            ],
        )

    return build_blocks


def build_block_index(
    index,
    docs_with_ids: DataFrame,
    block_size: int = DEFAULT_BLOCK_SIZE,
    bucket_bits: int = DEFAULT_BUCKET_BITS,
) -> BlockIndex:
    """InvertedIndex (M1) + doc-id map → compressed block index.

    One shuffle: repartition/groupBy on (term_id, bucket). The doc-range
    bucket salt bounds any single group to <= 2^bucket_bits postings,
    independent of term hotness.
    """
    w = (
        index.weights.join(
            docs_with_ids.select("conv_id", "turn_idx", "doc_id"),
            ["conv_id", "turn_idx"],
        )
        .withColumn(
            "bucket", F.shiftright(F.col("doc_id"), bucket_bits).cast("int")
        )
        .select("term_id", "bucket", "doc_id", "weight")
    )
    blocks = w.groupBy("term_id", "bucket").applyInPandas(
        _make_block_builder(block_size), schema=BLOCK_SCHEMA
    )
    return BlockIndex(
        blocks=blocks,
        docs=docs_with_ids,
        terms=index.terms,
        n_docs=index.n_docs,
        avg_doc_len=index.avg_doc_len,
        ngrams=index.ngrams,
        block_size=block_size,
        bucket_bits=bucket_bits,
    )
