"""Incremental postings maintenance (S5 at scale): per-batch segment
appends + mergeable stats partials must equal a from-scratch batch
build, and compaction must preserve query results while truncating."""

from __future__ import annotations

from pyspark.sql import functions as F

from neural_search_spark.operators.bm25 import bm25_topk, build_bm25
from neural_search_spark.streaming.ingest import IncrementalPostingsIndex


def _results(idx, query="alpha beta", k=5):
    return [
        (r["doc_id"], round(r["score"], 6))
        for r in bm25_topk(idx, query, k=k).collect()
    ]


def test_incremental_equals_batch_build(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha alpha delta"),
            (3, "beta beta beta epsilon"),
            (4, "gamma delta"),
            (5, "alpha beta alpha beta"),
        ],
        "doc_id long, text string",
    )
    inc = IncrementalPostingsIndex(str(tmp_path / "idx"))
    # two micro-batches (split 3 / 2)
    inc.apply_batch(docs.where("doc_id <= 3"), 0)
    inc.apply_batch(docs.where("doc_id > 3"), 1)

    got = _results(inc.bm25_index(spark))
    want = _results(build_bm25(docs))
    assert got == want

    # stats partials merge to exact corpus stats
    n, avgdl = inc.stats(spark)
    assert n == 5
    assert abs(avgdl - docs.select(F.avg(F.size(F.split("text", r"\s+")))).first()[0]) < 1e-9


def test_streaming_attach_then_compact(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha gamma")], "doc_id long, text string"
    ).coalesce(1).write.parquet(src + "/f1")
    spark.createDataFrame(
        [(3, "beta gamma alpha")], "doc_id long, text string"
    ).coalesce(1).write.parquet(src + "/f2")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    inc = IncrementalPostingsIndex(str(tmp_path / "idx"))
    q = inc.attach(stream, str(tmp_path / "ck"))
    q.processAllAvailable()
    q.stop()

    n, _ = inc.stats(spark)
    assert n == 3
    before = _results(inc.bm25_index(spark), query="alpha")
    inc.compact(spark)
    assert _results(inc.bm25_index(spark), query="alpha") == before

    # truncating compaction keeps only the top-tf doc per token
    inc.compact(spark, n_postings=1)
    per_token = (
        inc.postings(spark).groupBy("token").agg(F.count("*").alias("c")).collect()
    )
    assert all(r["c"] == 1 for r in per_token)


def test_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch re-delivers a batch after crash-restart; the
    per-batch overwrite layout must make the replay a no-op."""
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha gamma")], "doc_id long, text string"
    )
    inc = IncrementalPostingsIndex(str(tmp_path / "idx"))
    inc.apply_batch(docs, 0)
    once = sorted(
        (r["doc_id"], r["token"], r["tf"]) for r in inc.postings(spark).collect()
    )
    n_once, avgdl_once = inc.stats(spark)
    inc.apply_batch(docs, 0)  # replay of the SAME batch id
    twice = sorted(
        (r["doc_id"], r["token"], r["tf"]) for r in inc.postings(spark).collect()
    )
    assert twice == once
    assert inc.stats(spark) == (n_once, avgdl_once)


def test_replay_after_compaction_is_superseded(spark, tmp_path):
    """ADVICE r9: a foreachBatch replay landing AFTER compact() merged
    and deleted that batch's segment must not double-count tf — the
    compacted segment's `_merged_batches.json` manifest supersedes the
    replayed copy for readers and for the next compaction."""
    import os

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha alpha delta"),
            (3, "beta beta beta epsilon"),
            (4, "gamma delta"),
            (5, "alpha beta alpha beta"),
        ],
        "doc_id long, text string",
    )
    inc = IncrementalPostingsIndex(str(tmp_path / "idx"))
    inc.apply_batch(docs.where("doc_id <= 3"), 0)
    inc.apply_batch(docs.where("doc_id > 3"), 1)
    inc.compact(spark)
    inc.apply_batch(docs.where("doc_id > 3"), 1)  # replay after compaction

    want_idx = build_bm25(docs)
    assert _results(inc.bm25_index(spark)) == _results(want_idx)
    # postings totals exact — the double-counted-tf failure mode
    got_tf = inc.postings(spark).agg(F.sum("tf")).first()[0]
    want_tf = want_idx.postings.agg(F.sum("tf")).first()[0]
    assert got_tf == want_tf
    # the next compaction absorbs cleanly and GCs the inert leftover
    inc.compact(spark)
    segs = [
        s
        for s in sorted(os.listdir(str(tmp_path / "idx/postings")))
        if s.startswith("batch=")
    ]
    assert segs == ["batch=c1"]
    assert _results(inc.bm25_index(spark)) == _results(want_idx)
