"""Oracle-parity tests for the reference operator surface.

Replicates the driver's gate locally at sf0.001 (fast) for every
registered query that ships an oracle.
"""

from __future__ import annotations

import pytest

from realtime_analytics_pipeline_spark import registry

from tests.conftest import SF_SMOKE, assert_matches_oracle, duck_with_views

ORACLE_QUERIES = sorted(registry.ORACLES)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    df = registry.QUERIES[name](spark, SF_SMOKE)
    con = duck_with_views(duck, SF_SMOKE)
    assert_matches_oracle(df, con, registry.ORACLES[name])


def test_all_queries_have_callables():
    assert registry.QUERIES, "registry must not be empty"
    for name in registry.ORACLES:
        assert name in registry.QUERIES
