"""P2 hybrid-filter pushdown across EVERY leaf family (ADVICE r3):
a hybrid-level filter must restrict each sub-query's results — the
reference pushes the filter into all sub-queries
(`query/HybridQueryBuilder.java:117-128`). Round 3 left the span /
intervals / parent-child / match_bool_prefix / combined_fields /
terms_lookup / sloppy-phrase / nested-bool legs unfiltered."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neural_search_spark.plans.compiler import Engine

FILTER = "lang = 'en'"


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    return Engine(spark, sf_dir)


@pytest.fixture(scope="module")
def allowed(engine):
    return {
        r["doc_id"]
        for r in engine.documents().where(FILTER).select("doc_id").collect()
    }


def _hybrid_ids(engine, leg, size=20):
    out = engine.search(
        {"hybrid": {"queries": [leg], "filter": FILTER}}, size=size
    )
    return [r["doc_id"] for r in out.collect()]


LEGS = [
    pytest.param({"span_or": {"terms": ["spark", "merge"]}}, id="span_or"),
    pytest.param({"span_first": {"term": "spark", "end": 12}}, id="span_first"),
    pytest.param(
        {"span_not": {"include": "join", "exclude": "window", "pre": 1, "post": 1}},
        id="span_not",
    ),
    pytest.param(
        {"span_near": {"terms": ["join", "window"], "slop": 4, "in_order": False}},
        id="span_near",
    ),
    pytest.param(
        {
            "span_containing": {
                "big": {"terms": ["join", "window"], "slop": 6},
                "little": "the",
            }
        },
        id="span_containing",
    ),
    pytest.param(
        {
            "span_within": {
                "big": {"terms": ["join", "window"], "slop": 6},
                "little": "the",
            }
        },
        id="span_within",
    ),
    pytest.param(
        {"intervals": {"terms": ["join", "window"], "max_gaps": 6}},
        id="intervals",
    ),
    pytest.param(
        {"match_phrase": {"query": "join window", "slop": 3}},
        id="match_phrase_sloppy",
    ),
    pytest.param(
        {"match_bool_prefix": {"query": "join wind"}}, id="match_bool_prefix"
    ),
    pytest.param(
        {"combined_fields": {"fields": ["text^1.0"], "query": "spark join"}},
        id="combined_fields",
    ),
    pytest.param(
        {"has_child": {"query": {"match": {"query": "spark join"}}}},
        id="has_child",
    ),
    pytest.param(
        {
            "bool": {
                "must": [{"match": {"field": "text", "query": "spark join"}}],
            }
        },
        id="nested_bool",
    ),
]


@pytest.mark.parametrize("leg", LEGS)
def test_hybrid_filter_restricts_leg(engine, allowed, leg):
    ids = _hybrid_ids(engine, leg)
    assert ids, "leg returned no rows — test term choice is broken"
    assert set(ids) <= allowed


def test_hybrid_filter_has_parent_restricts_parents(engine, allowed):
    # has_parent returns CHILD rows keyed by the parent doc_id — the
    # hybrid filter (a parent-attribute predicate) must drop children
    # of excluded parents
    out = engine.search(
        {
            "hybrid": {
                "queries": [
                    {"has_parent": {"query": {"match": {"query": "spark join"}}}}
                ],
                "filter": FILTER,
            }
        },
        size=20,
    )
    ids = [r["doc_id"] for r in out.collect()]
    assert ids and set(ids) <= allowed


def test_filtered_leg_ranks_from_filtered_corpus(engine, allowed):
    """The filter must apply BEFORE top-k (docs outside the filter must
    not occupy result slots): the filtered hybrid's span_or leg equals
    the span_or ranking computed over candidate-filtered postings."""
    from neural_search_spark.operators import bm25 as B

    cand = engine.documents().where(FILTER).select("doc_id")
    direct = B.span_or_topk(
        engine.positional_index(),
        engine.bm25_index(),
        ["spark", "merge"],
        k=20,
        candidate_ids=cand,
    )
    via_hybrid = _hybrid_ids(engine, {"span_or": {"terms": ["spark", "merge"]}})
    assert via_hybrid == [r["doc_id"] for r in direct.collect()]


def test_match_phrase_slop_single_term_degenerates(engine):
    # OpenSearch accepts a single-term sloppy phrase (degenerates to a
    # term match); round-3 raised ValueError through intervals_topk
    out = engine.search({"match_phrase": {"query": "spark", "slop": 2}})
    term = engine.search({"match": {"field": "text", "query": "spark"}})
    assert [r["doc_id"] for r in out.collect()] == [
        r["doc_id"] for r in term.collect()
    ]


def test_rescore_match_phrase_honors_slop(engine):
    """rescore with a sloppy match_phrase must use the intervals path
    (slop-0 phrase scores differ): docs where the pair only co-occurs
    non-adjacently get rescore credit under slop>0 but not slop=0."""
    base = {"match": {"field": "text", "query": "join"}}
    r0 = engine.rescore(
        base, {"match_phrase": {"query": "join window"}}, window_size=50
    )
    r3 = engine.rescore(
        base,
        {"match_phrase": {"query": "join window", "slop": 6}},
        window_size=50,
    )
    s0 = {r["doc_id"]: r["score"] for r in r0.collect()}
    s3 = {r["doc_id"]: r["score"] for r in r3.collect()}
    assert s0 != s3  # the sloppy variant must actually change scores


def test_nested_agg_scopes_to_query_matches(engine):
    """ADVICE r3: a nested agg under a query context must aggregate
    only children of the matching parents, not the whole child
    corpus."""
    scoped_parents = engine.documents().where("lang = 'fr'")
    out = engine._compile_agg(
        scoped_parents,
        {
            "nested": {"path": "chunks"},
            "aggs": {
                "c": {"value_count": {"field": "child_id"}}
            },
        },
    )
    n_scoped = out.collect()[0][0]
    n_all = engine.chunks().count()
    expected = (
        engine.chunks()
        .join(scoped_parents.select("doc_id"), "doc_id", "semi")
        .count()
    )
    assert n_scoped == expected
    assert n_scoped < n_all


def test_child_id_no_int_overflow(engine):
    # doc_id is cast to long before the CHILD_ID_BASE multiply: every
    # child_id must recover its parent exactly
    bad = (
        engine.chunks()
        .where(
            F.floor(F.col("child_id") / F.lit(100000)).cast("long")
            != F.col("doc_id").cast("long")
        )
        .count()
    )
    assert bad == 0


def test_request_cache_evicts_lru(spark, sf_dir):
    import neural_search_spark.plans.compiler as C

    eng = Engine(spark, sf_dir)
    old_cap = C.REQUEST_CACHE_CAP
    C.REQUEST_CACHE_CAP = 2
    try:
        q = lambda t: {"match": {"field": "text", "query": t}}  # noqa: E731
        eng.cached_search(q("spark"))
        eng.cached_search(q("join"))
        eng.cached_search(q("window"))  # evicts "spark"
        assert len(eng._request_cache) == 2
        eng.cached_search(q("join"))  # hit
        stats = eng.request_cache_stats()
        assert stats["hits"] == 1 and stats["misses"] == 3
        eng.clear_caches()
        assert len(eng._request_cache) == 0
    finally:
        C.REQUEST_CACHE_CAP = old_cap
