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


# ---------------------------------------------------------------------------
# Typed event counters — the reference's full EventStatName enumeration
# (`stats/events/EventStatName.java:23-…`), name-for-name. Query-side
# stats count per REQUEST and are incremented on the driver at compile
# time (the reference increments in the coordinator's processor/builder
# code paths — same place); row-level instrumentation stays available
# through EngineStats.count_rows.
# ---------------------------------------------------------------------------

EVENT_STAT_NAMES = frozenset({
    "text_embedding_processor_executions",
    "skip_existing_executions",
    "text_chunking_processor_executions",
    "text_chunking_fixed_token_length_executions",
    "text_chunking_delimiter_executions",
    "text_chunking_fixed_char_length_executions",
    "semantic_field_processor_executions",
    "semantic_field_processor_chunking_executions",
    "semantic_highlighting_request_count",
    "semantic_highlighting_batch_request_count",
    "normalization_processor_executions",
    "agentic_query_translator_processor_executions",
    "agentic_context_processor_executions",
    "norm_technique_l2_executions",
    "norm_technique_minmax_executions",
    "norm_technique_norm_zscore_executions",
    "comb_technique_arithmetic_executions",
    "comb_technique_geometric_executions",
    "comb_technique_harmonic_executions",
    "rrf_processor_executions",
    "comb_technique_rrf_executions",
    "hybrid_query_requests",
    "hybrid_query_inner_hits_requests",
    "hybrid_query_filter_requests",
    "hybrid_query_pagination_requests",
    "neural_query_requests",
    "neural_query_against_knn_requests",
    "neural_query_against_semantic_dense_requests",
    "neural_query_against_semantic_sparse_requests",
    "neural_sparse_query_requests",
    "text_image_embedding_processor_executions",
    "sparse_encoding_processor_executions",
    "neural_query_enricher_processor_executions",
    "neural_sparse_two_phase_processor_executions",
    "rerank_by_field_processor_executions",
    "rerank_ml_processor_executions",
    "agentic_query_requests",
    "seismic_query_requests",
    "sparse_encoding_processor_seismic_executions",
    "mmr_neural_query_transformer",
})


class EventStats:
    """Typed per-request counters: every name must be a member of the
    reference's EventStatName enumeration — unknown names raise, so
    the stats surface can't silently drift from parity."""

    def __init__(self) -> None:
        self._counts: dict[str, int] = {}

    def incr(self, name: str, n: int = 1) -> None:
        if name not in EVENT_STAT_NAMES:
            raise ValueError(f"unknown event stat: {name!r}")
        self._counts[name] = self._counts.get(name, 0) + n

    def snapshot(self) -> dict[str, int]:
        """The `_plugins/_neural/stats` events payload: every typed
        counter, zero-filled like the reference's node response."""
        return {n: self._counts.get(n, 0) for n in sorted(EVENT_STAT_NAMES)}

    def nonzero(self) -> dict[str, int]:
        return dict(sorted(self._counts.items()))
