from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neural_search_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("neural-search-spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(scope="session", autouse=True)
def _materialized_oracles():
    """Tests read registry.ORACLES directly; build the lazily-declared
    (corpus-encoding) oracles once per session, driver-side — exactly
    what the driver's oracle_sql() access does."""
    from neural_search_spark import registry

    registry.materialize_oracles()
