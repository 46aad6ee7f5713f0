"""Pure-Python replicas of the xxhash64-based dedup ops, for oracle use.

DuckDB has no xxhash64, so ``minhash_lsh_candidates``, ``simhash64`` and
``dedup_near`` (ops/textops.py) cannot be expressed as oracle SQL
directly. These replicas recompute the SAME results single-node from
first principles — including a from-spec XXH64 (the public xxHash
algorithm, which Spark's ``F.xxhash64`` implements with seed 42 and
per-column chaining) — so ``oracle_sql()`` can render the expected
output as a VALUES literal and the driver's full rows+schema+hash gate
applies (the ``q_transcripts_bm25_wand`` pattern).

Hash-parity with Spark is itself pytest-asserted
(tests/test_oracle_textops.py): string xxhash64, multi-long chained
xxhash64, and each op's full output are compared against the Spark
implementations on real corpus slices.
"""

from __future__ import annotations

import random
import re
from collections import Counter

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def _merge(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int = 42) -> int:
    """Reference XXH64 over ``data`` (unsigned 64-bit result)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    return _fmix(h)


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_xxhash64_str(s: str, seed: int = 42) -> int:
    """Spark ``F.xxhash64(string_col)``: XXH64 of the UTF-8 bytes,
    signed-long result."""
    return _signed(xxh64(s.encode("utf-8"), seed))


def _hash_long(inp: int, seed: int) -> int:
    # Spark's XXH64.hashLong — identical to xxh64(le8(inp), seed)
    h = (seed + _P5 + 8) & _M64
    k1 = (_rotl((inp & _M64) * _P2 & _M64, 31) * _P1) & _M64
    h ^= k1
    h = (_rotl(h, 27) * _P1 + _P4) & _M64
    return _fmix(h)


def spark_xxhash64_longs(vals, seed: int = 42) -> int:
    """Spark ``F.xxhash64(c1, .., cn)`` over long columns: per-column
    hashLong chained through the seed, signed-long result."""
    h = seed & _M64
    for v in vals:
        h = _hash_long(int(v), h)
    return _signed(h)


# ------------------------------------------------ op replicas (textops)

_SPLIT = re.compile(r"[^a-z0-9]+")
_MH_P = (1 << 31) - 1


def shingle_set(text: str, n: int = 3) -> list[str]:
    """Distinct character n-grams of lower(text) — ops/textops._shingles
    (sequence 1..max(len-n+1, 1) + substring + array_distinct)."""
    t = text.lower()
    hi = max(len(t) - (n - 1), 1)
    seen: dict[str, None] = {}
    for i in range(hi):
        seen.setdefault(t[i : i + n], None)
    return list(seen)


def _mh_coeffs(num_hashes: int):
    rnd = random.Random(20240816)
    return [
        (rnd.randrange(1, _MH_P), rnd.randrange(0, _MH_P))
        for _ in range(num_hashes)
    ]


def minhash_signatures_py(
    docs: list[tuple[int, str]], num_hashes: int = 32, shingle: int = 3
) -> dict[int, list[int]]:
    """doc_id -> MinHash signature, matching ops/textops.
    minhash_signatures: x = pmod(xxhash64(sh), p); h_i = min((x*a+b)%p).
    """
    coeffs = _mh_coeffs(num_hashes)
    out: dict[int, list[int]] = {}
    cache: dict[str, int] = {}
    for doc_id, text in docs:
        xs = []
        for sh in shingle_set(text, shingle):
            x = cache.get(sh)
            if x is None:
                x = spark_xxhash64_str(sh) % _MH_P
                cache[sh] = x
            xs.append(x)
        if not xs:
            continue
        out[doc_id] = [min((x * a + b) % _MH_P for x in xs) for a, b in coeffs]
    return out


def minhash_lsh_candidates_py(
    docs: list[tuple[int, str]],
    num_hashes: int = 32,
    bands: int = 8,
    shingle: int = 3,
) -> list[tuple[int, int]]:
    """Sorted distinct (doc_a, doc_b) candidate pairs — the MIN-ANCHOR
    emission of ops/textops.minhash_lsh_candidates (anchor = bucket min;
    pairs (anchor, other) only)."""
    rows = num_hashes // bands
    sigs = minhash_signatures_py(docs, num_hashes=num_hashes, shingle=shingle)
    pairs: set[tuple[int, int]] = set()
    for b in range(bands):
        buckets: dict[int, list[int]] = {}
        for doc_id, sig in sigs.items():
            bh = spark_xxhash64_longs(sig[b * rows : (b + 1) * rows])
            buckets.setdefault(bh, []).append(doc_id)
        for members in buckets.values():
            if len(members) < 2:
                continue
            anchor = min(members)
            for d in members:
                if d > anchor:
                    pairs.add((anchor, d))
    return sorted(pairs)


def simhash64_py(docs: list[tuple[int, str]]) -> list[tuple[int, int]]:
    """(doc_id, simhash signed-long) rows matching ops/textops.simhash64:
    per-token xxhash64 bit votes weighted by tf, sign-bit via 1<<63
    two's complement."""
    out = []
    hcache: dict[str, int] = {}
    for doc_id, text in docs:
        tf = Counter(t for t in _SPLIT.split(text.lower()) if t)
        if not tf:
            continue
        votes = [0] * 64
        for term, cnt in tf.items():
            h = hcache.get(term)
            if h is None:
                h = spark_xxhash64_str(term)
                hcache[term] = h
            for b in range(64):
                votes[b] += cnt if (h >> b) & 1 else -cnt
        u = 0
        for b in range(64):
            if votes[b] > 0:
                u |= 1 << b
        out.append((doc_id, _signed(u)))
    return out


def dedup_near_py(
    docs: list[tuple[int, str]],
    threshold: float = 0.6,
    num_hashes: int = 32,
    bands: int = 8,
    shingle: int = 3,
) -> list[tuple[int, int, int | None]]:
    """(doc_id, is_dup, dup_of|None) rows matching ops/textops.dedup_near:
    LSH min-anchor candidates -> exact shingle-set Jaccard verify ->
    min-id dup_of per removed doc."""
    cand = minhash_lsh_candidates_py(
        docs, num_hashes=num_hashes, bands=bands, shingle=shingle
    )
    sh = {doc_id: set(shingle_set(text, shingle)) for doc_id, text in docs}
    dup_of: dict[int, int] = {}
    for a, b in cand:
        sa, sb = sh[a], sh[b]
        inter = len(sa & sb)
        # same IEEE expression order as the Spark column:
        # inter / (|a| + |b| - inter)
        if inter / (len(sa) + len(sb) - inter) >= threshold:
            prev = dup_of.get(b)
            if prev is None or a < prev:
                dup_of[b] = a
    return [
        (doc_id, 1 if doc_id in dup_of else 0, dup_of.get(doc_id))
        for doc_id, _ in docs
    ]
