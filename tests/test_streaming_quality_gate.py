"""Streaming curation gate: the Gopher quality rules are a stateless
codegen projection, so the SAME frame builder runs unchanged on a
readStream source (ordered=False skips the batch contract sort, which
streaming forbids). Verifies micro-batch results equal the batch run
row-for-row — the composability the 100 TB ingest path relies on."""

from __future__ import annotations

from neural_search_spark.registry import gopher_quality_frame


def test_stream_matches_batch(spark, tmp_path):
    rows = [
        (1, " ".join(["the quick brown fox jumps and runs with glee"] * 7)),
        (2, "too short"),
        (3, " ".join(["#x ..."] * 40)),
        (4, " ".join(f"word{i:03d}" for i in range(80))),
    ]
    src = str(tmp_path / "src")
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.parquet(src + "/f1")

    batch = {
        r["doc_id"]: r.asDict()
        for r in gopher_quality_frame(df).collect()
    }

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    got = []
    q = (
        gopher_quality_frame(stream, ordered=False)
        .writeStream.foreachBatch(lambda bdf, bid: got.extend(bdf.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    assert len(got) == len(rows)
    for r in got:
        assert r.asDict() == batch[r["doc_id"]]
    # the gate actually discriminates on this stream
    keeps = {r["doc_id"]: r["keep_core"] for r in got}
    assert keeps[1] and keeps[4]
    assert not keeps[2] and not keeps[3]
