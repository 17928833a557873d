"""Streaming exact dedup: duplicates dropped ACROSS micro-batches via
Spark's stateful dropDuplicates — the streaming face of the exact-dedup
operator (state = seen content hashes)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_streaming_dedup_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "same text"), (2, "other text")], "doc_id long, text string"
    ).coalesce(1).write.parquet(src + "/f1")
    spark.createDataFrame(
        [(3, "same text"), (4, "third text")], "doc_id long, text string"
    ).coalesce(1).write.parquet(src + "/f2")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    deduped = stream.withColumn("content_hash", F.md5("text")).dropDuplicates(
        ["content_hash"]
    )
    got = []
    q = (
        deduped.writeStream.foreachBatch(lambda df, bid: got.extend(df.collect()))
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    texts = sorted(r["text"] for r in got)
    # doc 3 (duplicate content of doc 1, arriving in a LATER batch) is
    # dropped by cross-batch state
    assert texts == ["other text", "same text", "third text"]
    assert {r["doc_id"] for r in got} == {1, 2, 4}
