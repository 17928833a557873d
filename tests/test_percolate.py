"""Percolator: batch matching semantics + continuous foreachBatch."""

from __future__ import annotations

from pyspark.sql import functions as F

from neural_search_spark.streaming import percolate as PERC


def _queries(spark):
    return spark.createDataFrame(
        [
            (1, {"spark": 2.0, "join": 1.0}, 3.0),
            (2, {"window": 1.0}, 1.0),
        ],
        "query_id long, tokens map<string,double>, min_score double",
    )


def test_percolate_batch_scores_and_threshold(spark):
    docs = spark.createDataFrame(
        [
            (10, "spark join spark"),      # q1: 2*2 + 1*1 = 5 ≥ 3 ✓
            (11, "spark"),                 # q1: 2 < 3 ✗
            (12, "window window"),         # q2: 2 ≥ 1 ✓
            (13, "nothing relevant here"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in PERC.percolate_batch(docs, _queries(spark)).collect()
    }
    assert got == {(1, 10): 5.0, (2, 12): 2.0}


def test_percolate_batch_no_corpus_shuffle_join(spark):
    docs = spark.createDataFrame([(1, "spark")], "doc_id long, text string")
    plan = (
        PERC.percolate_batch(docs, _queries(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_percolate_stream_matches_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    docs = spark.createDataFrame(
        [(i, "spark join window" if i % 2 == 0 else "noise") for i in range(10)],
        "doc_id long, text string",
    )
    docs.write.parquet(src)
    got = []

    def sink(matches, bid):
        got.extend(matches.collect())

    q = PERC.percolate_stream(
        spark.readStream.schema(docs.schema).parquet(src),
        _queries(spark),
        sink,
        checkpoint=str(tmp_path / "ck"),
    )
    q.processAllAvailable()
    q.stop()
    # even docs match both queries (score 3 ≥ 3 and 1 ≥ 1)
    assert sorted((r["query_id"], r["doc_id"]) for r in got) == sorted(
        [(1, d) for d in range(0, 10, 2)] + [(2, d) for d in range(0, 10, 2)]
    )


def test_percolate_dense_batch(spark):
    docs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.7, 0.7])],
        "doc_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(100, [1.0, 0.0], 0.6)],
        "query_id long, qvec array<double>, min_score double",
    )
    got = {
        (r["query_id"], r["doc_id"]): round(r["score"], 4)
        for r in PERC.percolate_dense_batch(docs, queries).collect()
    }
    # doc1 cos=1.0 ✓, doc2 cos=0.0 ✗, doc3 cos=0.7071 ✓
    assert set(got) == {(100, 1), (100, 3)}
    assert abs(got[(100, 3)] - 0.7071) < 1e-3


def test_percolate_partitioned_equivalence(spark, sf_dir):
    """The shuffle-join spill path (query set too big to broadcast)
    must produce exactly the broadcast path's matches, and its plan
    must NOT broadcast the query side."""
    from neural_search_spark import catalog

    docs = catalog.table(spark, sf_dir, "documents")
    qs = _queries(spark)
    bc = PERC.percolate_batch(docs, qs)
    pt = PERC.percolate_batch_partitioned(docs, qs)
    assert (
        bc.exceptAll(pt).count() == 0 and pt.exceptAll(bc).count() == 0
    ), "partitioned percolation diverges from broadcast path"
    plan = pt._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan
