"""F.session_window sessionization: batch/stream equivalence and
boundary semantics (exactly-gap-apart events merge, matching the batch
gaps-and-islands `diff > gap` break rule)."""

from __future__ import annotations

from pyspark.sql import functions as F

from neural_search_spark.streaming.ingest import session_window_agg

ROWS = [
    (1, "2024-01-01 00:00:00"),
    (1, "2024-01-01 00:20:00"),
    (1, "2024-01-01 01:20:00"),  # 60 min gap → new session
    (2, "2024-01-01 00:00:00"),
    (2, "2024-01-01 00:30:00"),  # exactly the gap → SAME session
]
SCHEMA = "user_id long, ts_s string"


def _frame(spark, rows):
    return spark.createDataFrame(rows, SCHEMA).select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts")
    )


def _key(rows):
    return sorted((r["user_id"], str(r["session_start"]), r["n_events"]) for r in rows)


def test_session_window_boundary(spark):
    got = _key(session_window_agg(_frame(spark, ROWS)).collect())
    assert got == [
        (1, "2024-01-01 00:00:00", 2),
        (1, "2024-01-01 01:20:00", 1),
        (2, "2024-01-01 00:00:00", 2),
    ]


def test_session_window_stream_matches_batch(spark, tmp_path):
    """Two micro-batches split MID-SESSION: streaming state must merge
    the session across batches and agree with the batch result."""
    src = str(tmp_path / "src")
    _frame(spark, ROWS[:2] + ROWS[3:4]).coalesce(1).write.parquet(src + "/f1")
    _frame(spark, ROWS[2:3] + ROWS[4:]).coalesce(1).write.parquet(src + "/f2")

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    batches = {}
    q = (
        session_window_agg(stream)
        .writeStream.foreachBatch(lambda df, bid: batches.__setitem__(bid, df.collect()))
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    final = batches[max(batches)]
    batch_rows = session_window_agg(_frame(spark, ROWS)).collect()
    assert _key(final) == _key(batch_rows)
