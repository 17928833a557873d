"""S7 stats: engine counters via Spark accumulators.

Parity: `rest/RestNeuralStatsAction.java` / `stats/events/
EventStatName.java` — node-level event counters aggregated across the
cluster. Spark accumulators ARE the cross-executor aggregation; the
`snapshot()` dict is the stats endpoint payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class EngineStats:
    """Named counters accumulated across executors."""

    def __init__(self, spark: SparkSession):
        self._sc = spark.sparkContext
        self._acc: dict[str, object] = {}

    def counter(self, name: str):
        if name not in self._acc:
            self._acc[name] = self._sc.accumulator(0)
        return self._acc[name]

    def incr(self, name: str, n: int = 1) -> None:
        self.counter(name).add(n)

    def count_rows(self, df: DataFrame, name: str) -> DataFrame:
        """Instrument a frame: counts rows as they flow (one accumulator
        add per row via a cheap foreach-free trick: map-side count)."""
        acc = self.counter(name)

        def _bump(it):
            n = 0
            for row in it:
                n += 1
                yield row
            acc.add(n)

        return df.rdd.mapPartitions(_bump).toDF(df.schema)

    def snapshot(self) -> dict[str, int]:
        return {k: v.value for k, v in self._acc.items()}


def corpus_stats(docs: DataFrame, text_col: str = "text") -> dict[str, float]:
    """Info-stats block: corpus-level aggregates in one pass."""
    row = docs.agg(
        F.count("*").alias("docs"),
        F.sum(F.length(text_col)).alias("chars"),
        F.avg(F.length(text_col)).alias("avg_chars"),
    ).first()
    return {"docs": int(row[0]), "chars": int(row[1]), "avg_chars": float(row[2])}


def warmup(*dfs: DataFrame) -> None:
    """S6 warmup: pin frames in executor memory
    (`rest/RestNeuralSparseWarmupHandler.java:70` analogue)."""
    for df in dfs:
        df.persist().count()


def clear_cache(spark: SparkSession) -> None:
    """S6 clear-cache: evict everything (`clearCache` transport)."""
    spark.catalog.clearCache()
