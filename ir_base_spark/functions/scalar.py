"""Scalar/vector column function library — Spark expressions for the
reference's Utils.java toolbox (SURVEY §2.9,
/root/reference/src/utils/Utils.java).

Everything except LCS is a pure Catalyst column expression (codegen, no
Python); LCS is a genuine dynamic program and ships as an Arrow-batched
pandas UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def array_cosine(a: Column, b: Column) -> Column:
    """Dense cosine similarity (Utils.cosine :372-377)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda s, v: s + v.cast("double") * v.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda s, v: s + v.cast("double") * v.cast("double"))
    )
    return dot / (na * nb)


def array_euclidean(a: Column, b: Column) -> Column:
    """Euclidean distance (Utils.euclideanDistance :850-861)."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y).cast("double") * (x - y).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def array_jaccard(a: Column, b: Column) -> Column:
    """Set Jaccard over array columns (Utils.jaccard :343-362)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def array_entropy(p: Column, normalized: bool = False) -> Column:
    """Shannon entropy of a probability array (Utils.entropy :139-149);
    zero entries contribute 0; optionally normalized by ln(len)."""
    h = -F.aggregate(
        p,
        F.lit(0.0),
        lambda acc, v: acc
        + F.when(v > 0, v.cast("double") * F.log(v.cast("double"))).otherwise(0.0),
    )
    return h / F.log(F.size(p).cast("double")) if normalized else h


def array_logsumexp(x: Column) -> Column:
    """Numerically-stable log Σ exp (Utils.logSum :151-181): max +
    ln Σ exp(x − max)."""
    m = F.array_max(x).cast("double")
    return m + F.log(
        F.aggregate(
            x, F.lit(0.0), lambda acc, v: acc + F.exp(v.cast("double") - m)
        )
    )


def rbf_kernel(a: Column, b: Column, gamma: float = 1.0) -> Column:
    """RBF similarity exp(−γ·d²) (Utils.RBF :810)."""
    d2 = F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y).cast("double") * (x - y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.exp(-F.lit(gamma) * d2)


def chi_square(n: Column, df: Column, tc_df: Column, c_df: Column) -> Column:
    """Utils.ChiSquare (:900-907): N(AD−BC)² / cDF/(B+D)/DF/(C+D)."""
    a = tc_df.cast("double")
    b = df - a
    c = c_df - a
    d = n - df - c_df + a
    return n * (a * d - b * c) * (a * d - b * c) / c_df / (b + d) / df / (c + d)


def clean_html(text: Column) -> Column:
    """Strip HTML comments, tags, and URLs (Utils.cleanHTML :508-526)."""
    no_comments = F.regexp_replace(text, r"<!--[\s\S]*?-->", " ")
    no_tags = F.regexp_replace(no_comments, r"<[^>]+>", " ")
    no_urls = F.regexp_replace(
        no_tags, r"(https?|ftp)://[^\s/$.?#].[^\s]*", " "
    )
    return F.regexp_replace(no_urls, r"\s+", " ")


def _lcs_batch(a: pd.Series, b: pd.Series) -> pd.Series:
    out = []
    for x, y in zip(a, b):
        x = x or ""
        y = y or ""
        prev = [0] * (len(y) + 1)
        for i in range(1, len(x) + 1):
            cur = [0] * (len(y) + 1)
            xi = x[i - 1]
            for j in range(1, len(y) + 1):
                if xi == y[j - 1]:
                    cur[j] = prev[j - 1] + 1
                else:
                    cur[j] = max(prev[j], cur[j - 1])
            prev = cur
        out.append(prev[len(y)])
    return pd.Series(out, dtype="int32")


_LCS_UDF = None


def lcs_length(a, b) -> Column:
    """Longest-common-subsequence length (Utils.LCSLength :863-881) —
    a real O(nm) DP, Arrow-batched. (UDF built lazily: pandas_udf
    return-type parsing needs an active SparkSession.)"""
    global _LCS_UDF
    if _LCS_UDF is None:
        _LCS_UDF = F.pandas_udf(_lcs_batch, "int")
    return _LCS_UDF(a, b)


def digamma(x: Column) -> Column:
    """ψ(x), first derivative of log-gamma — the exact Taylor
    approximation the reference ships (Utils.digamma :734-742, the
    Abramowitz & Stegun shift-by-6 form used by its variational LDA).
    Pure Catalyst arithmetic: whole-stage codegen, no UDF."""
    x6 = x.cast("double") + F.lit(6.0)
    p = F.lit(1.0) / (x6 * x6)
    p = (
        (
            (F.lit(0.004166666666667) * p - F.lit(0.003968253986254)) * p
            + F.lit(0.008333333333333)
        )
        * p
        - F.lit(0.083333333333333)
    ) * p
    out = p + F.log(x6) - F.lit(0.5) / x6
    for i in range(1, 7):
        out = out - F.lit(1.0) / (x6 - F.lit(float(i)))
    return out


def trigamma(x: Column) -> Column:
    """ψ'(x), second derivative of log-gamma (Utils.trigamma :713-726,
    A&S 6.4.11/6.4.12 with the 6.4.6 recurrence unrolled)."""
    x6 = x.cast("double") + F.lit(6.0)
    p = F.lit(1.0) / (x6 * x6)
    p = (
        (
            (
                (
                    (F.lit(0.075757575757576) * p - F.lit(0.033333333333333))
                    * p
                    + F.lit(0.0238095238095238)
                )
                * p
                - F.lit(0.033333333333333)
            )
            * p
            + F.lit(0.166666666666667)
        )
        * p
        + F.lit(1.0)
    ) / x6 + F.lit(0.5) * p
    # recurrence: six steps of p += 1/(x-1)^2 walking x6 back down to x
    for i in range(1, 7):
        xi = x6 - F.lit(float(i))
        p = F.lit(1.0) / (xi * xi) + p
    return p


def lgamma(x: Column) -> Column:
    """log Γ(x) for x > 0 — the reference's series algorithm
    (Utils.lgamma :744-783): shift x below 7 up to x0 = x + n, evaluate
    the asymptotic series at x0, subtract the n shift logs. The
    data-dependent loop count (n = int(7-x) ∈ 0..6) unrolls into a
    when-chain, keeping the whole thing a codegen'd column expression.
    Matches the Java routine's special cases (x<=0 -> 1e308,
    x in {1,2} -> 0)."""
    a = [
        8.333333333333333e-02, -2.777777777777778e-03,
        7.936507936507937e-04, -5.952380952380952e-04,
        8.417508417508418e-04, -1.917526917526918e-03,
        6.410256410256410e-03, -2.955065359477124e-02,
        1.796443723688307e-01, -1.39243221690590,
    ]
    xd = x.cast("double")

    def series(x0):
        x2 = F.lit(1.0) / (x0 * x0)
        gl0 = F.lit(a[9])
        for k in range(8, -1, -1):
            gl0 = gl0 * x2 + F.lit(a[k])
        return (
            gl0 / x0
            + F.lit(0.5) * F.log(F.lit(2.0 * 3.141592653589793))
            + (x0 - F.lit(0.5)) * F.log(x0)
            - x0
        )

    def shifted(n):
        x0 = xd + F.lit(float(n))
        out = series(x0)
        for k in range(1, n + 1):
            out = out - F.log(x0 - F.lit(float(k)))
        return out

    expr = F.when(xd <= F.lit(0.0), F.lit(1e308)).when(
        (xd == F.lit(1.0)) | (xd == F.lit(2.0)), F.lit(0.0)
    )
    for n in range(0, 7):
        # n = int(7 - x): x in (7-n-1, 7-n] -> shift by n
        expr = expr.when(xd > F.lit(float(6 - n)), shifted(n))
    return expr.otherwise(shifted(6))
