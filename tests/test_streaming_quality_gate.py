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


def test_repetition_stream_matches_batch(spark, tmp_path):
    """The Gopher repetition kernel is a stateless 1:1 mapInPandas, so
    with ordered=False it runs unchanged on a readStream source —
    micro-batch union must equal the batch frame row-for-row."""
    from neural_search_spark.registry import gopher_repetition_frame

    phrase = "alpha beta gamma delta epsilon"
    rows = [
        (1, " ".join([phrase] * 12)),           # fails dup5..10 + top2
        (2, " ".join(f"w{i:03d}" for i in range(60))),  # all-distinct
        (3, "solo"),                             # no 2-gram at all
        (4, " ".join(["x y"] * 30)),             # top2 dominated
    ]
    src = str(tmp_path / "rep_src")
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.parquet(src + "/f1")
    df.coalesce(1).write.parquet(src + "/f2")  # second micro-batch (dup ids ok: stateless)

    batch = {
        r["doc_id"]: r.asDict()
        for r in gopher_repetition_frame(df, ordered=False).collect()
    }

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    got = []
    q = (
        gopher_repetition_frame(stream, ordered=False)
        .writeStream.foreachBatch(lambda bdf, bid: got.extend(bdf.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "rep_ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    assert len(got) == 2 * len(rows)
    for r in got:
        assert r.asDict() == batch[r["doc_id"]]
    keeps = {r["doc_id"]: r["rep_keep"] for r in got}
    assert not keeps[1] and keeps[2] and keeps[3] and not keeps[4]


def test_classifier_gate_stream_matches_batch(spark, tmp_path):
    """Model-scored quality gate as a streaming stage: the logistic
    regression trains BATCH-side (multi-pass GD cannot stream), the
    learned weights broadcast into the stream, and the scoring
    projection (logreg_predict — one codegen select) runs per
    micro-batch. Stream scores must equal the batch scores
    row-for-row — the FineWeb-EDU-style train-offline / score-in-
    stream split a 100 TB ingest pipeline uses."""
    from pyspark.sql import functions as F

    from neural_search_spark.operators import classify as CLF
    from neural_search_spark.registry import gopher_quality_frame

    rows = [
        (i, " ".join(
            ["the quick brown fox jumps and runs with glee"] * (3 + i % 5)
        ) if i % 3 else "short text " * 2)
        for i in range(24)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def feats_of(frame):
        from neural_search_spark.functions.sparse import tokens as _toks

        return frame.select(
            "doc_id",
            F.lit(1.0).alias("x0"),
            (F.length("text").cast("double") / F.lit(1000.0)).alias("x1"),
            (F.size(_toks(F.col("text"))).cast("double") / F.lit(100.0))
            .alias("x2"),
        )

    labels = gopher_quality_frame(df, ordered=False).select(
        "doc_id", F.col("keep_core").cast("double").alias("y")
    )
    train = feats_of(df).join(labels, "doc_id")
    w = CLF.logreg_train(train, rounds=20, lr=1.0)  # batch-side training

    batch = {
        r["doc_id"]: r.asDict()
        for r in CLF.logreg_predict(feats_of(df), w).collect()
    }

    src = str(tmp_path / "clf_src")
    df.coalesce(1).write.parquet(src + "/f1")
    df.coalesce(1).write.parquet(src + "/f2")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    got = []
    q = (
        CLF.logreg_predict(feats_of(stream), w)
        .writeStream.foreachBatch(lambda bdf, bid: got.extend(bdf.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "clf_ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    assert len(got) == 2 * len(rows)
    for r in got:
        assert r.asDict() == batch[r["doc_id"]]
    # the gate discriminates on this stream (both classes present)
    preds = {r["doc_id"]: r["p"] if "p" in r.asDict() else None for r in got}
    assert preds, "no predictions collected"


def test_soft_dedup_weights_stream_matches_batch(spark, tmp_path):
    """Round-7: soft-dedup weighting in-stream. The connected-components
    clique frame is a STATIC ingest artifact (the batch dedup job's
    output); dedup.soft_weights applies it to a readStream docs source
    as a stream-static broadcast join — micro-batch union must equal
    the batch frame row-for-row, including left-join singletons."""
    from neural_search_spark.operators import dedup as DD

    # pairs: {1,2,3} one clique (transitive), {7,8} another, 4/5 singletons
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "a long, b long"
    )
    cc = DD.connected_components(pairs)

    rows = [(i, f"doc {i}") for i in (1, 2, 3, 4, 5, 7, 8)]
    src = str(tmp_path / "soft_src")
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.parquet(src + "/f1")
    df.coalesce(1).write.parquet(src + "/f2")  # second micro-batch

    batch = {
        r["doc_id"]: r.asDict()
        for r in DD.soft_weights(df, cc, ordered=False).collect()
    }

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    got = []
    q = (
        DD.soft_weights(stream, cc, ordered=False)
        .writeStream.foreachBatch(lambda bdf, bid: got.extend(bdf.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "soft_ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    assert len(got) == 2 * len(rows)
    for r in got:
        assert r.asDict() == batch[r["doc_id"]]
    w = {r["doc_id"]: (r["cluster_size"], r["weight"]) for r in got}
    assert w[1] == (3, 0.3333) and w[2] == (3, 0.3333) and w[3] == (3, 0.3333)
    assert w[7] == (2, 0.5) and w[4] == (1, 1.0) and w[5] == (1, 1.0)


def test_curation_pipeline_stream_matches_batch(spark, tmp_path):
    """Round-8: the COMPOSED curation pipeline (C4 → Gopher →
    repetition → soft-dedup weights) as one streaming stage. Each
    component already streams individually; production runs the whole
    gate per micro-batch under ONE foreachBatch, where the micro-batch
    is a plain DataFrame so the composition's doc_id equi-joins incur
    no stream-stream join state. The CC clique frame stays the static
    ingest artifact. Micro-batch union must equal the batch
    curation_frame row-for-row."""
    from neural_search_spark.operators import dedup as DD
    from neural_search_spark.registry import curation_frame

    vocab = [
        "river", "stone", "cloud", "meadow", "tiger", "planet",
        "bridge", "candle", "forest", "window", "garden", "mirror",
        "spiral", "harbor", "lantern", "valley", "meteor", "canyon",
        "marble", "falcon", "orchid", "thunder", "velvet", "crystal",
        "harvest", "journey", "pattern", "quiver", "ribbon", "sunset",
        "temple", "umbrella", "violet", "whisper", "yonder", "zephyr",
    ]
    good = " ".join(
        f"the {w[0]} and {w[1]} went to {w[2]} with {w[3]} near that"
        f" {w[4]} by {w[5]}."
        for w in (vocab[i * 6:(i + 1) * 6] for i in range(6))
    )  # 84 words, 6 sentences, diverse n-grams: passes every gate
    rows = [
        (1, good),                                   # passes everything
        (2, good),                                   # clique with 1 and 3
        (3, good),
        (4, "too short"),                            # fails Gopher floor
        (5, " ".join(["alpha beta gamma delta epsilon"] * 12) + "."),  # repetition
        (6, "Lorem ipsum dolor sit amet. " + good),  # C4 page drop only
    ]
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    cc = DD.connected_components(pairs)

    src = str(tmp_path / "cur_src")
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.parquet(src + "/f1")
    df.coalesce(1).write.parquet(src + "/f2")  # second micro-batch

    batch = {
        r["doc_id"]: r.asDict()
        for r in curation_frame(df, cc, ordered=False).collect()
    }

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    got = []
    q = (
        stream.writeStream.foreachBatch(
            lambda bdf, bid: got.extend(
                curation_frame(bdf, cc, ordered=False).collect()
            )
        )
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cur_ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    assert len(got) == 2 * len(rows)
    for r in got:
        assert r.asDict() == batch[r["doc_id"]]
    by = {r["doc_id"]: r for r in got}
    # the composed gate discriminates per-component on this stream
    assert by[1]["keep_final"] and by[1]["keep_web"]
    assert by[1]["sample_weight"] == 0.3333  # clique of 3
    assert not by[4]["keep_core"] and by[4]["sample_weight"] == 0.0
    assert not by[5]["rep_keep"] and not by[5]["keep_final"]
    assert by[6]["keep_final"] and not by[6]["keep_c4"] and not by[6]["keep_web"]
    assert by[6]["sample_weight"] == 1.0  # singleton, structurally kept
