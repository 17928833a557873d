"""Every registry query must hash-match its DuckDB oracle at sf0.01 —
the same gate the driver applies (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from neural_search_spark import registry

from .conftest import SF_CORRECT
from .oracle_check import compare


@pytest.mark.parametrize("name", sorted(registry.SPARK_QUERIES.keys()))
def test_query_matches_oracle(spark, name):
    fn = registry.SPARK_QUERIES[name]
    sql = registry.ORACLES.get(name)
    if sql is None:
        df = fn(spark, SF_CORRECT)
        assert df.count() >= 0  # rows-only check, like the driver
        return
    ok, msg = compare(fn(spark, SF_CORRECT), sql, SF_CORRECT)
    assert ok, f"{name}: {msg}"
