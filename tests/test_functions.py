"""Scalar/vector function library vs numpy/pure-Python ground truth."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from ir_base_spark.functions import (
    array_cosine,
    array_entropy,
    array_euclidean,
    array_jaccard,
    array_logsumexp,
    chi_square,
    clean_html,
    lcs_length,
    rbf_kernel,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_vector_functions(spark):
    a = [1.0, 2.0, 3.0]
    b = [0.5, -1.0, 2.0]
    ca, cb = F.array(*[F.lit(x) for x in a]), F.array(*[F.lit(x) for x in b])
    na, nb = np.array(a), np.array(b)

    assert abs(
        _one(spark, array_cosine(ca, cb))
        - float(na @ nb / (np.linalg.norm(na) * np.linalg.norm(nb)))
    ) < 1e-12
    assert abs(
        _one(spark, array_euclidean(ca, cb)) - float(np.linalg.norm(na - nb))
    ) < 1e-12
    assert abs(
        _one(spark, rbf_kernel(ca, cb, gamma=0.3))
        - math.exp(-0.3 * float(((na - nb) ** 2).sum()))
    ) < 1e-12


def test_jaccard_and_entropy(spark):
    ca = F.array(F.lit("a"), F.lit("b"), F.lit("c"))
    cb = F.array(F.lit("b"), F.lit("c"), F.lit("d"))
    assert abs(_one(spark, array_jaccard(ca, cb)) - 0.5) < 1e-12

    p = [0.5, 0.25, 0.25, 0.0]
    cp = F.array(*[F.lit(x) for x in p])
    want = -sum(x * math.log(x) for x in p if x > 0)
    assert abs(_one(spark, array_entropy(cp)) - want) < 1e-12


def test_logsumexp(spark):
    xs = [100.0, 101.0, 99.5]
    cx = F.array(*[F.lit(x) for x in xs])
    want = math.log(sum(math.exp(x - 101.0) for x in xs)) + 101.0
    assert abs(_one(spark, array_logsumexp(cx)) - want) < 1e-9


def test_chi_square_matches_reference_formula(spark):
    # Utils.ChiSquare(N=100, DF=20, tcDF=15, cDF=40)
    A, B, C, D = 15.0, 5.0, 25.0, 55.0
    want = 100 * (A * D - B * C) ** 2 / 40 / (B + D) / 20 / (C + D)
    got = _one(
        spark,
        chi_square(F.lit(100.0), F.lit(20.0), F.lit(15.0), F.lit(40.0)),
    )
    assert abs(got - want) < 1e-9


def test_clean_html(spark):
    html = "<!-- c --><p>Hello <b>world</b></p> see https://x.io/a?b=1 end"
    got = _one(spark, clean_html(F.lit(html)))
    assert "<" not in got and "https://" not in got
    assert "Hello" in got and "world" in got and "end" in got


def test_lcs(spark):
    df = spark.createDataFrame(
        [("ABCBDAB", "BDCABA"), ("", "x"), ("same", "same")], "a string, b string"
    )
    got = [r["l"] for r in df.select(lcs_length("a", "b").alias("l")).collect()]
    assert got == [4, 0, 4]
