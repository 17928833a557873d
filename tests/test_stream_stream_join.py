"""Stream-stream watermarked band join: same pairs as the batch
band_join twin, state bounded by watermark + time-range condition."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from neural_search_spark.operators.temporal import band_join
from neural_search_spark.streaming.ingest import stream_stream_band_join

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _rows():
    sec = lambda s: T0 + dt.timedelta(seconds=s)
    left = [(1, 7, sec(0)), (2, 7, sec(1000)), (3, 8, sec(0))]
    right = [(10, 7, sec(100)), (11, 7, sec(400)), (12, 7, sec(1100)), (13, 9, sec(0))]
    return left, right


def test_stream_matches_batch_band_join(spark, tmp_path):
    left_rows, right_rows = _rows()
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    ldf = spark.createDataFrame(left_rows, "lid long, user_id long, ts timestamp")
    rdf = spark.createDataFrame(
        right_rows, "rid long, r_user_id long, r_ts timestamp"
    )
    ldf.coalesce(1).write.parquet(lsrc)
    rdf.coalesce(1).write.parquet(rsrc)

    lstream = spark.readStream.schema(ldf.schema).parquet(lsrc)
    rstream = spark.readStream.schema(rdf.schema).parquet(rsrc)
    joined = stream_stream_band_join(
        lstream, rstream, on="user_id", band_seconds=300
    ).select("lid", "rid")

    got = []
    q = (
        joined.writeStream.foreachBatch(lambda df, bid: got.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    stream_pairs = sorted((r.lid, r.rid) for r in got)

    batch = band_join(
        ldf,
        rdf.withColumnRenamed("r_user_id", "user_id"),
        on="user_id",
        left_ts="ts",
        right_ts="r_ts",
        band=300,
    )
    batch_pairs = sorted((r.lid, r.rid) for r in batch.collect())
    assert stream_pairs == batch_pairs == [(1, 10), (2, 12)]


def test_stream_plan_has_bounded_state(spark, tmp_path):
    """The unsupported-operation checker only admits this join because
    both watermark + time-bound exist; assert it starts and uses a
    stream-stream join node."""
    left_rows, right_rows = _rows()
    ldf = spark.createDataFrame(left_rows, "lid long, user_id long, ts timestamp")
    rdf = spark.createDataFrame(right_rows, "rid long, r_user_id long, r_ts timestamp")
    lsrc, rsrc = str(tmp_path / "l2"), str(tmp_path / "r2")
    ldf.coalesce(1).write.parquet(lsrc)
    rdf.coalesce(1).write.parquet(rsrc)
    lstream = spark.readStream.schema(ldf.schema).parquet(lsrc)
    rstream = spark.readStream.schema(rdf.schema).parquet(rsrc)
    joined = stream_stream_band_join(lstream, rstream, on="user_id", band_seconds=300)
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_plan")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    q.processAllAvailable()
    plan = q.lastProgress or {}
    q.stop()
    assert plan.get("stateOperators"), "expected stateful join operator in progress"
