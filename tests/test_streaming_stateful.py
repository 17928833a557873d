"""Stateful streaming top-k: state must carry across micro-batches."""

from __future__ import annotations

from neural_search_spark.streaming.stateful import streaming_topk


def test_streaming_topk_state_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    # batch 1 and batch 2 as separate files; maxFilesPerTrigger=1
    # forces two micro-batches
    spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 5.0), ("b", 7, 3.0)],
        "key string, doc_id long, score double",
    ).coalesce(1).write.parquet(src + "/f1")
    spark.createDataFrame(
        [("a", 3, 7.0), ("a", 1, 1.0), ("b", 8, 9.0)],
        "key string, doc_id long, score double",
    ).coalesce(1).write.parquet(src + "/f2")

    stream = (
        spark.readStream.schema("key string, doc_id long, score double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    seen = []
    q = (
        streaming_topk(stream, k=2)
        .writeStream.foreachBatch(lambda df, bid: seen.append((bid, df.collect())))
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    assert len(seen) >= 2  # two micro-batches fired
    final = {}
    for _, rows in seen:
        for r in rows:
            final.setdefault(r["key"], {})
            final[r["key"]][r["rank"]] = (r["doc_id"], r["score"])
    # key a: batch1 top = [1:10, 2:5]; after batch2 merge with {3:7}
    # → [1:10, 3:7]; duplicate doc 1 keeps its max (10), not 1.0
    assert final["a"][1] == (1, 10.0)
    assert final["a"][2] == (3, 7.0)
    # key b: merged across batches → [8:9, 7:3]
    assert final["b"][1] == (8, 9.0)
    assert final["b"][2] == (7, 3.0)
