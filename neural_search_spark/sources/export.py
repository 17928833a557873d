"""Training-data export: sharded JSONL with bounded shard sizes and a
read-back manifest — the hand-off format between a curation run and a
training job's data loader.

Scale shape: `maxRecordsPerFile` bounds every shard without a global
sort or repartition-by-count (each task splits its own output);
`repartition(n)` first when a target shard COUNT matters more than
bound. The manifest is computed by reading the written files back with
`input_file_name()` — one scan of the export, grouped per shard — so
it reflects what is actually on disk, not what the writer intended.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    max_rows_per_shard: int = 100_000,
    shards: int | None = None,
) -> None:
    """Write `df` as JSONL under `path`: ≤ max_rows_per_shard rows per
    file; `shards` additionally fixes the parallel file count."""
    out = df
    if shards is not None:
        out = out.repartition(shards)
    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", max_rows_per_shard)
        .json(path)
    )


def export_manifest(spark: SparkSession, path: str) -> DataFrame:
    """(shard, n_rows, n_bytes) per written JSONL file, from the files
    themselves. n_bytes is the on-disk file size (driver-side listing
    of the export dir — file COUNT-sized, not data-sized)."""
    rows = (
        spark.read.json(path)
        .select(F.element_at(F.split(F.input_file_name(), "/"), -1).alias("shard"))
        .groupBy("shard")
        .agg(F.count("*").alias("n_rows"))
    )
    sizes = [
        (name, os.path.getsize(os.path.join(path, name)))
        for name in os.listdir(path)
        if name.endswith(".json")
    ]
    size_df = spark.createDataFrame(sizes, "shard string, n_bytes long")
    return rows.join(size_df, "shard").orderBy("shard")
