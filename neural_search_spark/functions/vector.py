"""Dense-vector column expressions — pure Catalyst, no Python UDFs.

All arithmetic is double-precision (float→double cast is exact) and
sequential-fold over the array, so results are bit-reproducible and
match an oracle engine evaluating the same expression shape.

Everything here stays inside whole-stage codegen: `zip_with` /
`aggregate` are JVM higher-order functions, ~100× cheaper than a
row-at-a-time Python UDF for a 64-dim dot product.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def lit_vector(vec: list[float]) -> Column:
    """Embed a driver-side query vector into the plan as a literal array.

    This is the Spark realization of inference hoisting
    (`query/NeuralQueryBuilder.java:887-932`): one vector per query,
    shipped in the plan, no join and no broadcast needed.
    """
    return F.array(*[F.lit(float(v)).cast("double") for v in vec])


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """cosine(a, b) in double precision; 0-norm guarded to NULL."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0.0, dot(a, b) / denom)


def euclidean(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
