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
