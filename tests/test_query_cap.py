"""jobs/query.py enforce_query_cap: the 'query set is small by
contract' rule is enforced, not assumed."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from jobs.query import enforce_query_cap  # noqa: E402


def test_cap_passes_small_set(spark):
    qdf = spark.createDataFrame(
        [("q1", "hello world", 5)], "query_id string, query_text string, k int"
    )
    pdf = enforce_query_cap(qdf, "inline", max_queries=10)
    assert len(pdf) == 1 and list(pdf["query_id"]) == ["q1"]


def test_cap_rejects_oversized_set(spark):
    qdf = spark.range(25).selectExpr(
        "cast(id as string) as query_id", "'x' as query_text", "5 as k"
    )
    with pytest.raises(SystemExit, match="more than 10 rows"):
        enforce_query_cap(qdf, "inline", max_queries=10)
