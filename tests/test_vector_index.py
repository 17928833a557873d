"""Incremental dense vector index (streaming IVF segments): segment
writes must be idempotent, probes must equal brute-force within the
probed cells, recluster must retrain + compact without changing the
full-probe answer."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from neural_search_spark.functions.vector import as_double, cosine, lit_vector
from neural_search_spark.streaming.vector_index import IncrementalVectorIndex


def _vec_df(spark, ids, dim=8, seed=0):
    rows = [
        (int(i), [float(x) for x in np.random.RandomState(seed + int(i)).randn(dim)])
        for i in ids
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _seeds(spark, df, k=4):
    rows = df.orderBy("vec_id").limit(k).collect()
    return [(i, [float(x) for x in r["embedding"]]) for i, r in enumerate(rows)]


def _brute(df, qv, k=5):
    scored = df.select(
        F.col("vec_id").alias("doc_id"),
        cosine(as_double(F.col("embedding")), lit_vector(qv)).alias("score"),
    )
    return [
        (r["doc_id"], round(r["score"], 6))
        for r in scored.orderBy(F.col("score").desc(), "doc_id").limit(k).collect()
    ]


def test_full_probe_equals_brute_force(spark, tmp_path):
    df = _vec_df(spark, range(40))
    idx = IncrementalVectorIndex(str(tmp_path / "vidx"))
    idx.seed_centroids(spark, _seeds(spark, df))
    idx.apply_batch(df.where("vec_id < 20"), 0)
    idx.apply_batch(df.where("vec_id >= 20"), 1)
    qv = [0.5] * 8
    # nprobe = ncells → identical to brute force over everything
    got = [
        (r["doc_id"], round(r["score"], 6))
        for r in idx.search(spark, qv, k=5, nprobe=4).collect()
    ]
    assert got == _brute(df, qv, k=5)


def test_partial_probe_is_subset_and_pruned(spark, tmp_path):
    df = _vec_df(spark, range(60))
    idx = IncrementalVectorIndex(str(tmp_path / "vidx"))
    idx.seed_centroids(spark, _seeds(spark, df))
    idx.apply_batch(df, 0)
    qv = [1.0] + [0.0] * 7
    hits = idx.search(spark, qv, k=5, nprobe=1)
    plan = hits._jdf.queryExecution().executedPlan().toString()
    # the cell filter must reach partition pruning, not a post-scan filter
    assert "PartitionFilters: [" in plan and "cluster_id" in plan
    all_ids = {r["doc_id"] for r in idx.search(spark, qv, k=60, nprobe=4).collect()}
    assert {r["doc_id"] for r in hits.collect()} <= all_ids


def test_batch_replay_is_idempotent(spark, tmp_path):
    df = _vec_df(spark, range(10))
    idx = IncrementalVectorIndex(str(tmp_path / "vidx"))
    idx.seed_centroids(spark, _seeds(spark, df, k=2))
    idx.apply_batch(df, 0)
    idx.apply_batch(df, 0)  # crash-restart replay
    assert idx.vectors(spark).count() == 10


def test_recluster_compacts_and_preserves_answers(spark, tmp_path):
    df = _vec_df(spark, range(50))
    idx = IncrementalVectorIndex(str(tmp_path / "vidx"))
    idx.seed_centroids(spark, _seeds(spark, df))
    for b in range(5):
        idx.apply_batch(df.where(f"vec_id % 5 = {b}"), b)
    qv = [0.3] * 8
    before = _brute(df, qv, k=5)
    idx.recluster(spark, rounds=2)
    assert idx.centroid_version() == 1
    got = [
        (r["doc_id"], round(r["score"], 6))
        for r in idx.search(spark, qv, k=5, nprobe=4).collect()
    ]
    assert got == before  # full probe unchanged by retrain+compact
    # exactly one compacted segment remains
    import os

    segs = [d for d in os.listdir(str(tmp_path / "vidx" / "vectors"))
            if d.startswith("batch=")]
    assert segs == ["batch=c0"]
    # a second recluster picks a FRESH name (snapshot-alongside swap
    # never reuses a live segment dir)
    idx.recluster(spark, rounds=1)
    segs = [d for d in os.listdir(str(tmp_path / "vidx" / "vectors"))
            if d.startswith("batch=")]
    assert segs == ["batch=c1"]


def test_streaming_attach(spark, tmp_path):
    src = str(tmp_path / "src")
    df = _vec_df(spark, range(12))
    df.where("vec_id < 6").coalesce(1).write.parquet(src + "/f1")
    df.where("vec_id >= 6").coalesce(1).write.parquet(src + "/f2")
    idx = IncrementalVectorIndex(str(tmp_path / "vidx"))
    idx.seed_centroids(spark, _seeds(spark, df, k=2))
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = idx.attach(stream, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    assert idx.vectors(spark).count() == 12
    qv = [0.1] * 8
    got = [
        (r["doc_id"], round(r["score"], 6))
        for r in idx.search(spark, qv, k=3, nprobe=2).collect()
    ]
    assert len(got) == 3


def test_replay_after_recluster_is_superseded(spark, tmp_path):
    """ADVICE r9: a foreachBatch replay landing AFTER recluster()
    absorbed and deleted that batch's segment must not resurrect
    duplicate vec_ids — the compacted segment's merged-batches
    manifest supersedes the replayed copy for vectors() and for the
    next recluster snapshot."""
    df = _vec_df(spark, range(40))
    idx = IncrementalVectorIndex(str(tmp_path / "vidx"))
    idx.seed_centroids(spark, _seeds(spark, df))
    idx.apply_batch(df.where("vec_id < 20"), 0)
    idx.apply_batch(df.where("vec_id >= 20"), 1)
    idx.recluster(spark)
    idx.apply_batch(df.where("vec_id >= 20"), 1)  # replay after recluster
    assert idx.vectors(spark).count() == 40  # no duplicate vec_ids
    qv = [0.5] * 8
    got = [
        (r["doc_id"], round(r["score"], 6))
        for r in idx.search(spark, qv, k=5, nprobe=4).collect()
    ]
    assert got == _brute(df, qv, k=5)
    idx.recluster(spark)
    assert idx.vectors(spark).count() == 40
