from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from ir_base_spark.session import get_spark

    s = get_spark(app_name="ir_base_spark-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_small():
    """Small deterministic transcripts+queries fixture (fast tests)."""
    from ir_base_spark.fixtures import make_fixture

    return make_fixture(n_conversations=60, seed=42, n_queries=40)
