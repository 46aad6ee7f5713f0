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


def test_digamma_trigamma_lgamma(spark):
    """Column expressions match a direct Python port of the reference
    routines bit-for-bit, and the approximations hit known analytic
    values (psi(1) = -euler_gamma, psi'(1) = pi^2/6, recurrences)."""
    import math

    import numpy as np
    from pyspark.sql import functions as F

    from ir_base_spark.functions.scalar import digamma, lgamma, trigamma

    def py_digamma(x):
        x = x + 6
        p = 1 / (x * x)
        p = (((0.004166666666667 * p - 0.003968253986254) * p
              + 0.008333333333333) * p - 0.083333333333333) * p
        p = (p + math.log(x) - 0.5 / x - 1 / (x - 1) - 1 / (x - 2)
             - 1 / (x - 3) - 1 / (x - 4) - 1 / (x - 5) - 1 / (x - 6))
        return p

    def py_trigamma(x):
        x = x + 6
        p = 1 / (x * x)
        p = ((((((0.075757575757576 * p - 0.033333333333333) * p
                 + 0.0238095238095238) * p - 0.033333333333333) * p
               + 0.166666666666667) * p + 1) / x + 0.5 * p)
        for _ in range(6):
            x = x - 1
            p = 1 / (x * x) + p
        return p

    def py_lgamma(x):
        a = [8.333333333333333e-02, -2.777777777777778e-03,
             7.936507936507937e-04, -5.952380952380952e-04,
             8.417508417508418e-04, -1.917526917526918e-03,
             6.410256410256410e-03, -2.955065359477124e-02,
             1.796443723688307e-01, -1.39243221690590]
        x0 = x
        n = 0
        if x <= 0.0:
            return 1e308
        if x in (1.0, 2.0):
            return 0.0
        if x <= 7.0:
            n = int(7 - x)
            x0 = x + n
        x2 = 1.0 / (x0 * x0)
        gl0 = a[9]
        for k in range(8, -1, -1):
            gl0 = gl0 * x2 + a[k]
        gl = gl0 / x0 + 0.5 * math.log(2 * math.pi) + (x0 - 0.5) * math.log(x0) - x0
        for _ in range(n):
            gl -= math.log(x0 - 1.0)
            x0 -= 1.0
        return gl

    xs = [0.1, 0.5, 1.0, 1.5, 2.0, 3.7, 6.0, 6.5, 7.0, 7.5, 25.0, 400.0]
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    rows = df.select(
        "x", digamma(F.col("x")).alias("dg"),
        trigamma(F.col("x")).alias("tg"), lgamma(F.col("x")).alias("lg"),
    ).collect()
    for r in rows:
        assert r["dg"] == py_digamma(r["x"]), r["x"]
        assert r["tg"] == py_trigamma(r["x"]), r["x"]
        assert r["lg"] == py_lgamma(r["x"]), r["x"]
    got = {r["x"]: r for r in rows}
    assert abs(got[1.0]["dg"] + 0.5772156649015329) < 1e-9
    assert abs(got[1.0]["tg"] - math.pi**2 / 6) < 1e-9
    assert abs(got[7.5]["lg"] - math.lgamma(7.5)) < 1e-10
    assert abs(got[0.5]["lg"] - math.lgamma(0.5)) < 1e-8
    # recurrence psi(x+1) = psi(x) + 1/x
    assert abs(got[2.0]["dg"] - (got[1.0]["dg"] + 1.0)) < 1e-9
