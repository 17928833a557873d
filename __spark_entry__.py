"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``neural_search_spark``; this file only
re-exports the registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from neural_search_spark import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: hybrid dense+sparse with min_max/arithmetic-mean
    fusion on sf0.001 (SURVEY.md §2.3 R6 + §2.4 N1 + §2.5 C1)."""
    return registry.q_r6_hybrid_minmax(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    # expensive corpus-encoding oracles build lazily so Python WORKERS
    # importing the registry (mapInPandas kernels pickle by reference)
    # never pay for them — only this driver-side access does
    registry.materialize_oracles()
    return dict(registry.ORACLES)
