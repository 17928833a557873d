"""Salted join: identical results to a plain join, hot keys scattered."""

from __future__ import annotations

from pyspark.sql import functions as F

from neural_search_spark.operators.skew import salted_join, skewed_key_stats


def test_salted_join_equals_plain_join(spark):
    # hot key 'x' carries 90% of the big side
    big = spark.createDataFrame(
        [("x", i) for i in range(900)] + [(f"k{i}", i) for i in range(100)],
        "key string, v long",
    )
    small = spark.createDataFrame(
        [("x", 1.0)] + [(f"k{i}", float(i)) for i in range(100)], "key string, w double"
    )
    plain = big.join(small, "key").groupBy("key").agg(
        F.count("*").alias("n"), F.sum(F.col("v") * F.col("w")).alias("s")
    )
    salted = salted_join(big, small, "key", salt=4).groupBy("key").agg(
        F.count("*").alias("n"), F.sum(F.col("v") * F.col("w")).alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_skewed_key_stats_finds_hot_key(spark):
    df = spark.createDataFrame(
        [("hot", i) for i in range(95)] + [("cold", i) for i in range(5)],
        "key string, v long",
    )
    top = skewed_key_stats(df, "key", top=1).collect()
    assert top[0]["key"] == "hot" and top[0]["share"] == 0.95
