"""Parity of the pure-Python xxhash64-op replicas (oracle_textops) with
the Spark implementations — the load-bearing guarantee behind the
VALUES-literal oracles of the dedup_near / minhash_lsh / simhash
correctness entries (__spark_entry__._dedup_golden_sqls)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ir_base_spark.oracle_textops import (
    dedup_near_py,
    minhash_lsh_candidates_py,
    simhash64_py,
    spark_xxhash64_longs,
    spark_xxhash64_str,
)

STRINGS = [
    "",
    "a",
    "ab",
    "abc",
    "abcd",
    "spark",
    "0123456",  # 7 bytes: 4-byte word + 3-byte tail
    "01234567",  # exactly one 8-byte word
    "the quick brown fox jumps over the lazy dog",  # > 32 bytes: stripes
    "café über straße",  # multi-byte UTF-8
]


def test_xxhash64_string_parity(spark):
    got = {
        r["s"]: r["h"]
        for r in spark.createDataFrame([(v,) for v in STRINGS], "s string")
        .select("s", F.xxhash64("s").alias("h"))
        .collect()
    }
    for v in STRINGS:
        assert got[v] == spark_xxhash64_str(v), v


def test_xxhash64_multi_long_parity(spark):
    rows = [
        (0, 0, 0, 0),
        (1, 2, 3, 4),
        (-1, 2**62, -(2**62), 42),
        (123456789012345, -99999999999, 7, -7),
    ]
    df = spark.createDataFrame(rows, "a long, b long, c long, d long")
    got = [
        r["h"]
        for r in df.select(
            "a", F.xxhash64("a", "b", "c", "d").alias("h")
        ).orderBy("a").collect()
    ]
    exp = [spark_xxhash64_longs(r) for r in sorted(rows)]
    assert got == exp


def _corpus(spark):
    # dup-heavy slice: repeats + unique tails, exercises anchor emission
    base = [
        "the cat sat on the mat and looked at the window",
        "the cat sat on the mat and looked at the door",
        "completely different text about spark partitions and shuffles",
        "numbers 123 and 456 mixed with words",
        "short",
    ]
    rows = []
    for i in range(60):
        rows.append((i, base[i % len(base)] + ("" if i < 30 else f" v{i % 7}")))
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_lsh_parity(spark):
    from ir_base_spark.ops.textops import minhash_lsh_candidates

    rows, df = _corpus(spark)
    got = sorted(
        (r["doc_a"], r["doc_b"]) for r in minhash_lsh_candidates(df).collect()
    )
    assert got == minhash_lsh_candidates_py(rows)
    assert len(got) > 0


def test_simhash_parity(spark):
    from ir_base_spark.ops.textops import simhash64

    rows, df = _corpus(spark)
    got = sorted((r["doc_id"], r["simhash"]) for r in simhash64(df).collect())
    assert got == sorted(simhash64_py(rows))


def test_dedup_near_parity(spark):
    from ir_base_spark.ops.textops import dedup_near

    rows, df = _corpus(spark)
    got = sorted(
        (r["doc_id"], r["is_dup"], r["dup_of"])
        for r in dedup_near(df, threshold=0.6).collect()
    )
    exp = sorted(dedup_near_py(rows, threshold=0.6))
    assert got == exp
    assert sum(g[1] for g in got) > 0  # the fixture really has dups
