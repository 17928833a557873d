"""Structured Streaming ingest (§2.12 parity-plus).

The reference has NO streaming semantics — ingest is synchronous
request batching (`processor/InferenceProcessor.java:190-246`). The
Spark engine exposes the exact same batch ingest transform under
`foreachBatch`, so a document stream (Kafka/files/rate) is continuously
chunked + embedded + appended with exactly-once sink semantics, and a
windowed-aggregation path with watermarking covers late events.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..sources.ingest import SemanticFieldConfig, ingest_transform


def streaming_ingest(
    stream: DataFrame,
    cfg: SemanticFieldConfig,
    sink: Callable[[DataFrame, int], None] | None = None,
    output_path: str | None = None,
    checkpoint: str | None = None,
    id_col: str = "doc_id",
) -> StreamingQuery:
    """readStream → (chunk → embed → prune) per micro-batch → sink.

    The per-batch function is the SAME compiled transform as batch
    ingest — foreachBatch hands us a normal DataFrame, so nothing forks
    between batch and streaming paths.
    """

    def _process(batch: DataFrame, batch_id: int) -> None:
        out = ingest_transform(batch, cfg, id_col=id_col)
        if sink is not None:
            sink(out, batch_id)
        elif output_path is not None:
            out.write.mode("append").parquet(output_path)

    writer = stream.writeStream.foreachBatch(_process).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling-window aggregation for a late-data event
    stream — works identically on a batch frame (watermark is a no-op)
    and under readStream."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), key_col)
        .agg(F.count("*").alias("cnt"), F.avg("value").alias("avg_value"))
        .select(F.col("w.start").alias("window_start"), key_col, "cnt", "avg_value")
    )


def session_window_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows via the native `F.session_window` operator —
    Spark's stateful merging-session aggregation (batch AND streaming;
    under readStream, state merges sessions across micro-batches and
    the watermark bounds state size — the scale path for sessionizing
    an unbounded event stream without a per-user sort).

    Same semantics as the batch gaps-and-islands sessionize
    (operators/batch_retrieval.py) except `session_end` here is
    last_event + gap (the window's exclusive end), not last_event.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), key_col)
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def stream_stream_band_join(
    left,
    right,
    on: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "r_ts",
    band_seconds: int = 300,
    watermark: str = "10 minutes",
):
    """Watermarked stream-stream inner join: left rows match right rows
    with the same key within ±band_seconds. Both sides carry a
    watermark so the join state is BOUNDED — Spark evicts buffered rows
    once the watermark passes their band window (without the time-range
    predicate the state would grow forever; Structured Streaming
    requires exactly this shape for stream-stream joins at scale).

    The batch twin is operators/temporal.py::band_join (bucketed hash
    join) — same semantics, tested equivalent in
    tests/test_stream_stream_join.py."""
    from pyspark.sql import functions as F

    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[on] == rw[f"r_{on}"])
        & (rw[right_ts] >= lw[left_ts] - F.expr(f"INTERVAL {band_seconds} SECONDS"))
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {band_seconds} SECONDS"))
    )
    return lw.join(rw, cond, "inner")


class IncrementalPostingsIndex:
    """Continuously-maintained lexical index (S5 at scale): each
    micro-batch appends a postings *segment* plus a mergeable stats
    partial; `compact()` is the segment-merge job (re-truncating
    per-token posting lists, A2/K6) that the reference schedules on
    Lucene merges (`sparse/codec/MergeHelper.java`,
    `BatchClusteringTask`).

    Layout on disk (all append-only parquet — object-store friendly):
      base_dir/postings/  (doc_id, token, tf)   one dir of segment files
      base_dir/stats/     (n, total_dl)         one partial row per batch
    Readers aggregate the stats partials (associative sums → exact
    corpus N/avgdl at any point) and union the segments; neither path
    ever rewrites existing files, so writers never block readers — the
    same LSM-ish contract Lucene segments give the reference.
    """

    def __init__(self, base_dir: str):
        self.base = str(base_dir).rstrip("/")
        self.postings_dir = self.base + "/postings"
        self.stats_dir = self.base + "/stats"

    # -- writer side -------------------------------------------------------
    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        """Idempotent per-batch write: each micro-batch lands in its own
        `batch=<id>` subdirectory with overwrite, so a replayed batch
        (foreachBatch re-delivers after a crash-restart) REPLACES its
        previous attempt instead of double-appending — the standard
        exactly-once recipe for foreachBatch sinks without transactional
        tables."""
        from ..functions.sparse import tf_postings, tokens

        seg = tf_postings(batch).withColumnRenamed("weight", "tf")
        seg.write.mode("overwrite").parquet(f"{self.postings_dir}/batch={batch_id}")
        partial = batch.agg(
            F.count("*").alias("n"),
            F.sum(F.size(tokens(F.col("text")))).cast("double").alias("total_dl"),
        )
        partial.write.mode("overwrite").parquet(f"{self.stats_dir}/batch={batch_id}")

    def attach(self, stream: DataFrame, checkpoint: str) -> StreamingQuery:
        return (
            stream.writeStream.foreachBatch(self.apply_batch)
            .outputMode("update")
            .option("checkpointLocation", checkpoint)
            .start()
        )

    # -- reader side -------------------------------------------------------
    def postings(self, spark) -> DataFrame:
        # `batch` is a partition-discovery column (the segment id), not
        # index data — readers see the union of LIVE segments without
        # it. A raw segment superseded by a compacted segment's
        # merged-batches manifest (a foreachBatch replay re-delivered a
        # batch AFTER compact() absorbed and deleted it) is excluded:
        # its tf rows already live in the compacted copy, and postings
        # rows are sums, not distinct-able (ADVICE r9).
        from .dedup_index import _live_segments

        live, merged = _live_segments(spark, self.postings_dir)
        if not merged:
            return spark.read.parquet(self.postings_dir).drop("batch")
        return (
            spark.read.option("basePath", self.postings_dir)
            .parquet(*[f"{self.postings_dir}/{s}" for s in live])
            .drop("batch")
        )

    def stats(self, spark) -> tuple[int, float]:
        n, total = (
            spark.read.parquet(self.stats_dir)
            .agg(F.sum("n"), F.sum("total_dl"))
            .first()
        )
        return int(n), float(total) / float(n)

    def bm25_index(self, spark):
        from ..operators.bm25 import BM25Index

        p = self.postings(spark)
        doclen = p.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
        return BM25Index(postings=p, doclen=doclen, stats=self.stats(spark))

    # -- segment merge (S5) ------------------------------------------------
    def compact(self, spark, n_postings: int | None = None) -> None:
        """Merge segments into one sorted set of files; optionally
        re-truncate to the top `n_postings` docs per token by tf
        (A2/K6 `PostingsProcessingUtils.java:38-55`). At cluster scale
        this is the periodic OPTIMIZE job: repartition by token so each
        output file is one token range (query-side pruning), written to
        a fresh dir then swapped in."""
        from pyspark.sql import Window

        # SNAPSHOT-ALONGSIDE swap (same contract as the dedup index's
        # compact, ADVICE r8): the segment list is SNAPSHOTTED first so
        # a segment a concurrent batch writes mid-compaction is neither
        # merged nor deleted; the compacted segment lands ALONGSIDE
        # under a fresh `batch=c<n>` name and only the snapshotted
        # segments are deleted (Hadoop FS API — hdfs://s3a:// safe).
        # Crash-safe: no window loses state; a reader overlapping the
        # swap may transiently see duplicate postings rows (identical
        # values), so schedule compaction off query windows.
        #
        # REPLAY-AFTER-COMPACTION (ADVICE r9): the compacted segment
        # carries a `_merged_batches.json` manifest listing every raw
        # batch id it absorbed (cumulative across generations), so a
        # foreachBatch replay that re-writes `batch=<id>` after this
        # compaction deleted it is EXCLUDED by readers and by the next
        # compaction's snapshot — postings rows are additive tf sums,
        # so without the manifest the replayed copy would double-count
        # beside its compacted twin. Leftover superseded segments are
        # garbage-collected here too (they are inert either way).
        from .dedup_index import (
            _fs_and_path,
            _live_segments,
            _segment_names,
            _write_merged_manifest,
        )

        snapshot, prior_merged = _live_segments(spark, self.postings_dir)
        if not snapshot:
            return
        merged = spark.read.parquet(
            *[f"{self.postings_dir}/{s}" for s in snapshot]
        )
        if n_postings is not None:
            w = Window.partitionBy("token").orderBy(
                F.col("tf").desc(), F.col("doc_id")
            )
            merged = (
                merged.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") <= n_postings)
                .drop("_rn")
            )
        c_nums = [
            int(s[len("batch=c"):])
            for s in snapshot
            if s.startswith("batch=c") and s[len("batch=c"):].isdigit()
        ]
        out_name = f"batch=c{max(c_nums) + 1 if c_nums else 0}"
        merged.repartition("token").write.mode("overwrite").parquet(
            f"{self.postings_dir}/{out_name}"
        )
        covered = prior_merged | {
            int(sid)
            for s in snapshot
            if (sid := s[len("batch="):]).isdigit()
        }
        _write_merged_manifest(
            spark, f"{self.postings_dir}/{out_name}", sorted(covered)
        )
        fs, _ = _fs_and_path(spark, self.postings_dir)
        jvm_path = spark._jvm.org.apache.hadoop.fs.Path
        current = set(_segment_names(spark, self.postings_dir))
        leftovers = {
            s
            for s in current - set(snapshot) - {out_name}
            if (sid := s[len("batch="):]).isdigit() and int(sid) in covered
        }
        for s in set(snapshot) | leftovers:
            fs.delete(jvm_path(f"{self.postings_dir}/{s}"), True)
