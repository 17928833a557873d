"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]``; the settings below are the ones that
matter at cluster scale too: AQE on (runtime re-plan, skew-join
handling), Arrow for the pandas-UDF model paths, and a shuffle
partition count sized to the environment rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "neural-search-spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # point-lookup reads (forward-index rescore, mget) push literal
        # IN lists into the parquet scan; above this threshold Spark
        # silently degrades In to a min/max RANGE predicate, which a
        # shortlist of ids scattered over the id space cannot prune
        # (measured 2.4x slower on the dim-384 forward rescore)
        .config("spark.sql.parquet.pushdown.inFilterThreshold", "1024")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
