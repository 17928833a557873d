"""Physical table layouts — the write-side of the 100 TB design.

The claims in README/SURVEY become concrete here:
- postings tables are BUCKETED by token → a sparse query's token join
  is co-located, no corpus shuffle (S4 analogue of the reference's
  per-token posting lists);
- IVF-assigned corpora are PARTITIONED by cluster_id → probe filters
  become partition pruning, ~(1 − nprobe/ncells) of the data is never
  read (the Spark analogue of shard routing).

Tests assert the pruning/bucketing is visible in the physical plan,
not just claimed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_postings_bucketed(
    postings: DataFrame, table_name: str, path: str, buckets: int = 32
) -> None:
    """Write (doc_id, token, weight) postings bucketed+sorted by token.

    Joins on `token` against another table bucketed the same way (or a
    broadcast query-token list) read only matching buckets and skip the
    shuffle entirely.
    """
    (
        postings.write.bucketBy(buckets, "token")
        .sortBy("token")
        .option("path", path)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table_name)
    )


def save_ivf_partitioned(
    assigned: DataFrame, path: str
) -> None:
    """Write a corpus with its `cluster_id` assignment as the partition
    column. `WHERE cluster_id IN (probes)` then prunes directories
    before any file is opened."""
    assigned.write.partitionBy("cluster_id").mode("overwrite").parquet(path)


def load_ivf(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
