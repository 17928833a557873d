"""Aggregation-tree semantics: nested buckets, top_hits, samplers,
sibling pipeline aggs, adjacency matrix, global — behaviors the SQL
oracles can't pin down alone (per-parent limits, determinism, tie
handling, query-context escape).

Reference surface: OpenSearch core `search.aggregations` collectors
(forwarded hybrid hits: `search/query/HybridAggregationProcessor.java:45`).
"""

from __future__ import annotations

import pytest

from neural_search_spark import catalog
from neural_search_spark.plans.compiler import Engine

ALL_DOCS = {"bool": {"filter": {"range": {"n_chars": {"gte": 0}}}}}


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    return Engine(spark, sf_dir)


def test_nested_terms_respects_per_parent_child_limit(engine):
    out = engine.search_aggs(
        ALL_DOCS,
        {"a": {"terms": {"field": "source", "size": 4},
               "aggs": {"by_lang": {"terms": {"field": "lang", "size": 2}}}}},
    )["a"].collect()
    parents = {r["key"] for r in out}
    assert len(parents) <= 4
    for p in parents:
        children = [r for r in out if r["key"] == p]
        assert len(children) <= 2
        # per-parent children are ordered by doc_count desc
        counts = [r["doc_count"] for r in children]
        assert counts == sorted(counts, reverse=True)


def test_nested_child_counts_partition_parent(engine, spark, sf_dir):
    out = engine.search_aggs(
        ALL_DOCS,
        {"a": {"terms": {"field": "lang", "size": 3},
               "aggs": {"by_src": {"terms": {"field": "source", "size": 1000}}}}},
    )["a"].collect()
    # with an unbounded child size, children sum to the parent count
    docs = catalog.table(spark, sf_dir, "documents")
    for p in {r["key"] for r in out}:
        total = sum(r["doc_count"] for r in out if r["key"] == p)
        assert total == docs.where(f"lang = '{p}'").count()
        assert all(
            r["parent_doc_count"] == total for r in out if r["key"] == p
        )


def test_top_hits_rank_and_sort(engine):
    out = engine.search_aggs(
        ALL_DOCS,
        {"a": {"terms": {"field": "lang", "size": 2},
               "aggs": {"h": {"top_hits": {
                   "size": 3, "sort": [{"n_chars": "desc"}],
                   "_source": ["doc_id", "n_chars"]}}}}},
    )["a"].collect()
    for p in {r["key"] for r in out}:
        hits = sorted((r for r in out if r["key"] == p), key=lambda r: r["rank"])
        assert [h["rank"] for h in hits] == list(range(1, len(hits) + 1))
        chars = [h["n_chars"] for h in hits]
        assert chars == sorted(chars, reverse=True)


def test_sampler_is_deterministic(engine):
    spec = {"a": {"sampler": {"shard_size": 40},
                  "aggs": {"s": {"terms": {"field": "source", "size": 50}}}}}
    r1 = engine.search_aggs(ALL_DOCS, spec)["a"].collect()
    r2 = engine.search_aggs(ALL_DOCS, spec)["a"].collect()
    assert r1 == r2
    assert sum(r["doc_count"] for r in r1) == 40


def test_diversified_sampler_caps_per_value(engine):
    out = engine.search_aggs(
        ALL_DOCS,
        {"a": {"diversified_sampler": {
            "shard_size": 500, "field": "lang", "max_docs_per_value": 3},
            "aggs": {"s": {"terms": {"field": "lang", "size": 50}}}}},
    )["a"].collect()
    assert out and all(r["doc_count"] <= 3 for r in out)


def test_bucket_selector_filters_buckets(engine, spark, sf_dir):
    docs = catalog.table(spark, sf_dir, "documents")
    parent = {"terms": {"field": "source", "size": 1000}}
    kept = engine._compile_agg(
        docs, {"bucket_selector": {"of": parent, "script": "doc_count >= 3"}}
    ).collect()
    everything = engine._compile_agg(docs, dict(parent)).collect()
    assert {r["key"] for r in kept} == {
        r["key"] for r in everything if r["doc_count"] >= 3
    }


def test_max_bucket_returns_all_tied_keys(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 2), ("b", 2), ("c", 1)], "k string, v int"
    )
    out = eng._compile_agg(
        df, {"max_bucket": {"of": {"terms": {"field": "k", "size": 10}},
                            "metric": "doc_count", "key": "key"}}
    ).collect()
    assert len(out) == 1
    assert out[0]["value"] == 2.0
    # both attain the max, sorted — emitted as a joined STRING so the
    # final schema stays scalar-typed (harness canonicalizer contract)
    assert out[0]["keys"] == "a,b"


def test_adjacency_matrix_drops_empty_intersections(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    out = eng.search_aggs(
        ALL_DOCS,
        {"m": {"adjacency_matrix": {"filters": {
            "en": {"term": {"lang": "en"}},
            "never": {"range": {"n_chars": {"gte": 10_000_000}}},
        }}}},
    )["m"].collect()
    keys = {r["key"] for r in out}
    assert "en" in keys and "never" not in keys and "en&never" not in keys
    assert all(r["doc_count"] > 0 for r in out)


def test_global_ignores_query_context(engine, spark, sf_dir):
    out = engine.search_aggs(
        {"bool": {"filter": {"term": {"lang": "de"}}}},
        {"g": {"global": {}, "aggs": {"c": {"value_count": {"field": "doc_id"}}}}},
    )["g"].collect()
    n_all = catalog.table(spark, sf_dir, "documents").count()
    assert out[0]["value"] == n_all


def test_serial_diff_lags_by_n(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    df = spark.createDataFrame(
        [(float(i), 1) for i in range(5) for _ in range(i + 1)], "b double, x int"
    )
    out = eng._compile_agg(
        df, {"serial_diff": {"of": {"histogram": {"field": "b", "interval": 1.0}},
                             "lag": 2, "sort": "bucket"}}
    ).orderBy("bucket").collect()
    # doc_counts are 1..5; lag-2 diff = 2 for every bucket past the 2nd
    assert [r["serial_diff"] for r in out][2:] == [2.0, 2.0, 2.0]


def test_date_histogram_fixed_interval_buckets(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    ev = catalog.table(spark, sf_dir, "events")
    out = eng._compile_agg(
        ev, {"date_histogram": {"field": "ts", "fixed_interval": "6h"}}
    ).collect()
    assert sum(r["doc_count"] for r in out) == ev.count()
    # bucket starts sit on 6h boundaries
    for r in out:
        assert r["bucket"].hour % 6 == 0
        assert r["bucket"].minute == 0 and r["bucket"].second == 0


def test_bucket_sort_orders_and_truncates(engine, spark, sf_dir):
    docs = catalog.table(spark, sf_dir, "documents")
    out = engine._compile_agg(
        docs,
        {"bucket_sort": {
            "of": {"terms": {"field": "source", "size": 1000},
                   "aggs": {"avg_chars": {"avg": {"field": "n_chars"}}}},
            "sort": [{"avg_chars": "desc"}], "size": 3}},
    ).collect()
    assert len(out) == 3
    avgs = [r["avg_chars"] for r in out]
    assert avgs == sorted(avgs, reverse=True)
