"""S7 typed event counters: name-for-name parity with the reference's
EventStatName enumeration (`stats/events/EventStatName.java`) —
validated names, request-scoped increments at the same lifecycle
points (query compile / pipeline stages / ingest processors)."""

from __future__ import annotations

import pytest

from neural_search_spark import catalog
from neural_search_spark.plans.compiler import Engine
from neural_search_spark.sources.ingest import SemanticFieldConfig, ingest_transform
from neural_search_spark.stats import EVENT_STAT_NAMES, EventStats


def test_enumeration_matches_reference_cardinality():
    # the reference enum carries 40 event stats; every one is present
    assert len(EVENT_STAT_NAMES) == 40
    assert "hybrid_query_requests" in EVENT_STAT_NAMES
    assert "seismic_query_requests" in EVENT_STAT_NAMES


def test_unknown_name_rejected():
    es = EventStats()
    with pytest.raises(ValueError):
        es.incr("not_a_real_stat")


def test_snapshot_zero_fills_like_node_response():
    es = EventStats()
    snap = es.snapshot()
    assert len(snap) == 40 and all(v == 0 for v in snap.values())


def test_query_side_counters(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    eng.search({
        "hybrid": {
            "queries": [
                {"neural": {"query_text": "spark join"}},
                {"neural_sparse": {"query_text": "spark join", "two_phase": True}},
            ],
            "filter": "lang = 'en'",
        }
    }, pipeline={
        "normalization": {"technique": "min_max"},
        "combination": {"technique": "arithmetic_mean"},
        "rerank": {"type": "by_field", "target_field": "n_chars"},
    })
    eng.search({"agentic": {"query_text": "find documents similar to spark"}})
    nz = eng.event_stats.nonzero()
    assert nz["hybrid_query_requests"] == 1
    assert nz["hybrid_query_filter_requests"] == 1
    assert nz["neural_query_requests"] >= 1
    assert nz["neural_query_against_knn_requests"] >= 1
    assert nz["neural_sparse_query_requests"] == 1
    assert nz["neural_sparse_two_phase_processor_executions"] == 1
    assert nz["normalization_processor_executions"] == 1
    assert nz["norm_technique_minmax_executions"] == 1
    assert nz["comb_technique_arithmetic_executions"] == 1
    assert nz["rerank_by_field_processor_executions"] == 1
    assert nz["agentic_query_requests"] == 1
    assert nz["agentic_query_translator_processor_executions"] == 1
    assert "rrf_processor_executions" not in nz


def test_rrf_routes_to_rrf_counter(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    eng.search(
        {"hybrid": {"queries": [
            {"neural": {"query_text": "spark"}},
            {"match": {"field": "text", "query": "spark"}},
        ]}},
        pipeline={"normalization": {"technique": "rrf"},
                  "combination": {"technique": "rrf"}},
    )
    nz = eng.event_stats.nonzero()
    assert nz["rrf_processor_executions"] == 1
    assert nz["comb_technique_rrf_executions"] == 1
    assert "normalization_processor_executions" not in nz


def test_ingest_side_counters(spark, sf_dir):
    es = EventStats()
    docs = catalog.table(spark, sf_dir, "documents").limit(5)
    cfg = SemanticFieldConfig(
        raw_field="text", mode="dense", chunking="fixed_token",
        chunk_param=16,
    )
    ingest_transform(docs, cfg, event_stats=es).collect()
    nz = es.nonzero()
    assert nz["semantic_field_processor_executions"] == 1
    assert nz["text_chunking_processor_executions"] == 1
    assert nz["text_chunking_fixed_token_length_executions"] == 1
    assert nz["text_embedding_processor_executions"] == 1
