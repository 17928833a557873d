"""Skew-handling join/aggregation helpers for hot keys.

AQE's skew-join split (enabled in session.py) handles most cases at
runtime; these explicit helpers cover the cases AQE can't — e.g. a
broadcast-ineligible dimension joined on a pathologically hot key
(one token carrying 10% of all postings at 100 TB).

`salted_join`: replicate the small side `salt` times, scatter the big
side's hot keys across salts deterministically, join on (key, salt) —
each hot key's rows spread over `salt` tasks instead of one straggler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salt-scattered hot keys.

    Result is identical to `big.join(small, on, how)`; only the
    physical distribution changes: the big side's rows get a
    deterministic salt in [0, salt), the small side is replicated once
    per salt value, and the shuffle key becomes (on, salt).
    """
    salted_big = big.withColumn(
        "_salt", F.pmod(F.crc32(F.col(on).cast("string")) + F.spark_partition_id(), salt)
    )
    replicated_small = small.crossJoin(
        F.broadcast(
            big.sparkSession.range(salt).select(F.col("id").cast("int").alias("_salt"))
        )
    )
    out = salted_big.join(replicated_small, [on, "_salt"], how)
    return out.drop("_salt")


def skewed_key_stats(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Diagnostic: the heaviest keys and their share of total rows —
    run this before choosing a salt factor."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("cnt"))
        .withColumn("share", F.round(F.col("cnt") / F.lit(float(total)), 4))
        .orderBy(F.col("cnt").desc())
        .limit(top)
    )
