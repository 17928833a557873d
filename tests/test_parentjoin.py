"""Parent/child join-field family: has_child (score modes,
min/max_children), has_parent (score inheritance), parent_id,
children agg — over the chunk child-corpus (operators/parentjoin.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neural_search_spark.operators import parentjoin as PJ
from neural_search_spark.plans.compiler import CHILD_ID_BASE, Engine

from .conftest import SF_CORRECT


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(spark, SF_CORRECT)


@pytest.fixture(scope="module")
def child_scores(spark):
    # parent 1: children 2.0, 3.0; parent 2: one child 10.0;
    # parent 3: three children 1.0 each
    return spark.createDataFrame(
        [(1, 2.0), (1, 3.0), (2, 10.0), (3, 1.0), (3, 1.0), (3, 1.0)],
        "doc_id long, score double",
    )


def test_has_child_score_modes(child_scores):
    got = {
        mode: {r["doc_id"]: r["score"] for r in
               PJ.has_child_topk(child_scores, score_mode=mode, k=10).collect()}
        for mode in ("max", "sum", "avg", "min")
    }
    assert got["max"] == {1: 3.0, 2: 10.0, 3: 1.0}
    assert got["sum"] == {1: 5.0, 2: 10.0, 3: 3.0}
    assert got["avg"] == {1: 2.5, 2: 10.0, 3: 1.0}
    assert got["min"] == {1: 2.0, 2: 10.0, 3: 1.0}


def test_has_child_children_count_bounds(child_scores):
    ge2 = {r["doc_id"] for r in
           PJ.has_child_topk(child_scores, min_children=2, k=10).collect()}
    assert ge2 == {1, 3}
    between = {r["doc_id"] for r in PJ.has_child_topk(
        child_scores, min_children=2, max_children=2, k=10).collect()}
    assert between == {1}


def test_has_child_rejects_unknown_mode(child_scores):
    with pytest.raises(ValueError):
        PJ.has_child_topk(child_scores, score_mode="median")


def test_chunks_artifact_denormalizes_parent_attrs(eng):
    ch = eng.chunks()
    assert {"doc_id", "source", "chunk_idx", "chunk", "child_id"} <= set(ch.columns)
    row = ch.where(F.col("chunk_idx") > 0).first()
    assert row["child_id"] == row["doc_id"] * CHILD_ID_BASE + row["chunk_idx"]
    # cached: same object on re-access
    assert eng.chunks() is ch


def test_has_parent_inherits_parent_score(eng):
    q = {"match": {"field": "text", "query": "spark join stream window"}}
    parents = {r["doc_id"]: r["score"] for r in
               eng.search(q, size=10).collect()}
    out = eng.search({"has_parent": {"query": q, "score": True}},
                     size=10).collect()
    for r in out:
        if r["doc_id"] in parents:
            assert r["score"] == pytest.approx(parents[r["doc_id"]], rel=1e-9)


def test_has_parent_score_false_is_constant(eng):
    q = {"match": {"field": "text", "query": "spark join stream window"}}
    out = eng.search({"has_parent": {"query": q, "score": False}},
                     size=10).collect()
    assert out and all(r["score"] == 1.0 for r in out)


def test_parent_id_returns_ordered_children(eng):
    out = eng.search({"parent_id": {"id": 7}}, size=10).collect()
    assert out
    assert all(r["doc_id"] == 7 for r in out)
    idxs = [r["chunk_idx"] for r in out]
    assert idxs == sorted(idxs)


def test_children_agg_counts_match_chunk_frame(eng):
    agg = {r["source"]: r["doc_count"] for r in
           PJ.children_agg(eng.chunks(), "source").collect()}
    direct = {r["source"]: r["cnt"] for r in
              eng.chunks().groupBy("source").agg(F.count("*").alias("cnt"))
              .collect()}
    assert agg == direct


def test_nested_reverse_nested_parent_counts(eng, spark):
    from neural_search_spark import catalog

    docs = catalog.table(spark, SF_CORRECT, "documents")
    out = eng._compile_agg(docs, {
        "nested": {"path": "chunks"},
        "aggs": {"by_idx": {
            "terms": {"field": "chunk_idx", "size": 5},
            "aggs": {"parents": {"reverse_nested": {}}},
        }},
    }).collect()
    assert out
    for r in out:
        # distinct parents never exceeds children; chunk_idx buckets
        # have exactly one chunk per parent so they must be equal
        assert r["parents"] == r["doc_count"]


def test_nested_requires_single_subagg(eng, spark):
    from neural_search_spark import catalog

    docs = catalog.table(spark, SF_CORRECT, "documents")
    with pytest.raises(ValueError):
        eng._compile_agg(docs, {"nested": {"path": "chunks"}})
