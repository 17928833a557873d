"""Every registry query's FINAL output schema must be scalar-typed.

The driver's pandas-based canonicalizer (sort_values → factorize →
hash) cannot hash list/dict cells, so an array/map/struct-typed output
column is harness-incompatible even when the values match the oracle —
this is exactly how `dsl_agg_max_bucket` failed in round 4 (its `keys`
column was array<string>; now a sorted comma-joined string). This test
builds each query's plan at sf0.001 (lazy — no execution) and rejects
any non-atomic field before the driver can trip on it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from neural_search_spark import registry

from .conftest import SF_SMOKE

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


@pytest.mark.parametrize("name", sorted(registry.SPARK_QUERIES.keys()))
def test_output_schema_is_scalar(spark, name):
    df = registry.SPARK_QUERIES[name](spark, SF_SMOKE)
    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in df.schema.fields
        if isinstance(f.dataType, _COMPLEX)
    ]
    assert not bad, f"{name} emits non-scalar output column(s): {bad}"
