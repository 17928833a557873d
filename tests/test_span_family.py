"""Span-family depth: span_or, span_first, intervals (ordered,
max_gaps), match_bool_prefix, combined_fields (BM25F-style unified
stats), terms lookup.

Golden micro-corpus cases pin the positional semantics exactly;
corpus-level invariants run at sf0.01 through the Engine DSL."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neural_search_spark.operators import bm25 as B
from neural_search_spark.plans.compiler import Engine

from .conftest import SF_CORRECT


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(spark, SF_CORRECT)


@pytest.fixture(scope="module")
def micro(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c"),          # adjacent ordered chain
            (2, "a x b c"),        # chain with one gap
            (3, "c b a"),          # terms present, wrong order
            (4, "a a b b c"),      # two chain starts
            (5, "a b"),            # missing final term
        ],
        "doc_id long, text string",
    )
    return B.build_positional(docs), B.build_bm25(docs)


def _ids(df):
    return {r["doc_id"] for r in df.collect()}


def test_intervals_adjacent_only_at_zero_gaps(micro):
    pos, idx = micro
    out = B.intervals_topk(pos, idx, ["a", "b", "c"], max_gaps=0, k=10)
    # doc 1 (a b c) and doc 4 (…b b c: a@1→b@2? a@0→b@2 gap; greedy
    # from a@0 chains b@2,c@4 span 4 > 2; from a@1 chains b@2,c@4 span 3 > 2)
    assert _ids(out) == {1}


def test_intervals_gap_widens_matches(micro):
    pos, idx = micro
    g0 = _ids(B.intervals_topk(pos, idx, ["a", "b", "c"], max_gaps=0, k=10))
    g2 = _ids(B.intervals_topk(pos, idx, ["a", "b", "c"], max_gaps=2, k=10))
    assert g0 <= g2
    assert 2 in g2  # a x b c needs one gap
    assert 3 not in g2  # wrong order never matches
    assert 5 not in g2  # missing term never matches


def test_intervals_order_is_required(micro):
    pos, idx = micro
    out = B.intervals_topk(pos, idx, ["c", "b", "a"], max_gaps=0, k=10)
    assert _ids(out) == {3}


def test_span_or_tf_is_total_occurrences(micro):
    pos, idx = micro
    out = {r["doc_id"]: r["score"] for r in
           B.span_or_topk(pos, idx, ["a", "b"], k=10).collect()}
    # doc 4 has a,a,b,b (tf 4) — must outscore doc 1 (tf 2, same dl? no,
    # dl differs; just assert membership and that tf>0 docs all appear)
    assert set(out) == {1, 2, 3, 4, 5}


def test_span_first_counts_only_early_positions(micro):
    pos, idx = micro
    # "b" at pos<1 appears in no doc; at pos<2 in docs 1, 3, 5 (b@1)
    assert _ids(B.span_first_topk(pos, idx, "b", end=1, k=10)) == set()
    assert _ids(B.span_first_topk(pos, idx, "b", end=2, k=10)) == {1, 3, 5}


def test_span_first_subset_of_wider_window(eng):
    narrow = {r["doc_id"] for r in eng.search(
        {"span_first": {"term": "spark", "end": 2}}, size=1000).collect()}
    wide = {r["doc_id"] for r in eng.search(
        {"span_first": {"term": "spark", "end": 10}}, size=1000).collect()}
    assert narrow <= wide


def test_match_bool_prefix_matches_either_side(eng, spark):
    hits = eng.search(
        {"match_bool_prefix": {"field": "text", "query": "stream win"}}, size=10
    )
    docs = eng.documents().select("doc_id", "text")
    joined = hits.join(docs, "doc_id").collect()
    for r in joined:
        toks = r["text"].lower().split()
        assert "stream" in toks or any(t.startswith("win") for t in toks)


def test_combined_fields_single_field_equals_bm25(eng):
    cf = eng.search(
        {"combined_fields": {"query": "spark join", "fields": ["text"]}}, size=10
    ).collect()
    bm = eng.search(
        {"match": {"field": "text", "query": "spark join"}}, size=10
    ).collect()
    assert [(r["doc_id"], round(r["score"], 4)) for r in cf] == [
        (r["doc_id"], round(r["score"], 4)) for r in bm
    ]


def test_combined_fields_title_constant_matches_engine_projection():
    from neural_search_spark import registry

    assert registry.CF_TITLE_TOKENS == Engine.TITLE_TOKENS


def test_terms_lookup_matches_manual_filter(eng):
    out = eng.search(
        {"terms_lookup": {"field": "lang", "id": 7, "path": "lang"}}, size=1000
    )
    lang = eng.documents().where(F.col("doc_id") == 7).first()["lang"]
    manual = eng.documents().where(F.col("lang") == lang).count()
    assert out.count() == min(manual, 1000)


def test_combined_fields_index_cached_across_queries(spark):
    eng2 = Engine(spark, SF_CORRECT)
    eng2.search({"combined_fields": {
        "query": "spark join", "fields": ["text", "title^2.0"]}}, size=5).collect()
    assert len(eng2._combined_idx) == 1
    eng2.search({"combined_fields": {
        "query": "window merge", "fields": ["text", "title^2.0"]}}, size=5).collect()
    assert len(eng2._combined_idx) == 1  # same field set → cached artifact
    eng2.search({"combined_fields": {
        "query": "spark", "fields": ["text"]}}, size=5).collect()
    assert len(eng2._combined_idx) == 2  # new field set → new artifact


# -- batch-5: vector script_score, weighted rescore, indices_boost ----------


def test_rescore_zero_weight_equals_plain_search(eng):
    q = {"match": {"field": "text", "query": "spark join stream window"}}
    plain = [(r["doc_id"], round(r["score"], 4)) for r in
             eng.search(q, size=10).collect()]
    rescored = [(r["doc_id"], round(r["score"], 4)) for r in
                eng.rescore(q, {"match_phrase": {"query": "table scan"}},
                            window_size=10, query_weight=1.0,
                            rescore_query_weight=0.0, size=10).collect()]
    assert rescored == plain


def test_rescore_promotes_phrase_matches(eng):
    q = {"match": {"field": "text", "query": "spark join stream window"}}
    out = eng.rescore(q, {"match_phrase": {"query": "table scan"}},
                      window_size=30, query_weight=1.0,
                      rescore_query_weight=5.0, size=30)
    rows = out.join(eng.documents().select("doc_id", "text"), "doc_id") \
              .orderBy(F.col("score").desc(), "doc_id").collect()
    has_phrase = ["table scan" in r["text"] for r in rows]
    # with a heavy rescore weight, every phrase-matching doc in the
    # window must outrank every non-matching one it ties with on base
    if any(has_phrase):
        first_without = has_phrase.index(False) if False in has_phrase else len(rows)
        assert any(has_phrase[:max(first_without, 1)])


def test_script_score_cosine_range(eng, spark):
    from neural_search_spark import catalog as cat

    qv = cat.query_vector(spark, SF_CORRECT, 42)
    out = eng.search({"script_score": {
        "query": {"match": {"field": "text", "query": "spark join"}},
        "script": "cosine_sim + 1.0",
        "params": {"query_vector": qv}, "window": 20,
    }}, size=20).collect()
    for r in out:
        assert 0.0 <= r["score"] <= 2.0 + 1e-9


def test_cross_index_boost_scales_remote(eng, spark):
    from neural_search_spark.plans.compiler import Engine, cross_index_search

    remote = Engine(spark, "/root/testdata/sf0.001")
    q = {"match": {"field": "text", "query": "spark join stream window"}}
    plain = {(r["idx"], r["doc_id"]): r["score"] for r in cross_index_search(
        {"local": eng, "remote": remote}, q, size=50).collect()}
    boosted = {(r["idx"], r["doc_id"]): r["score"] for r in cross_index_search(
        {"local": eng, "remote": remote}, q, size=50,
        indices_boost={"remote": 3.0}).collect()}
    for key, s in boosted.items():
        if key in plain:
            factor = 3.0 if key[0] == "remote" else 1.0
            assert s == pytest.approx(plain[key] * factor, rel=1e-9)


# -- batch-6: span_not / span_containing / span_within, distance_feature,
#    moving_percentiles ------------------------------------------------------


@pytest.fixture(scope="module")
def micro_not(spark):
    docs = spark.createDataFrame(
        [
            (1, "x y x"),        # two x, no exclusion -> tf 2
            (2, "x z y"),        # z right after x excludes that x
            (3, "x z x y x z"),  # x@0 excluded (z@1), x@2 kept (y@3), x@4 excluded
            (4, "z z z"),        # no include term
        ],
        "doc_id long, text string",
    )
    return B.build_positional(docs), B.build_bm25(docs)


def test_span_not_excludes_windowed_positions(micro_not):
    pos, idx = micro_not
    out = {r["doc_id"]: None for r in
           B.span_not_topk(pos, idx, "x", "z", pre=0, post=1, k=10).collect()}
    assert set(out) == {1, 3}  # doc 2's only x is excluded; doc 4 has no x


def test_span_not_no_exclude_term_keeps_all(micro_not):
    pos, idx = micro_not
    # excluding a term absent from the corpus = plain term tf
    out = B.span_not_topk(pos, idx, "x", "missing", pre=0, post=5, k=10)
    assert {r["doc_id"] for r in out.collect()} == {1, 2, 3}


@pytest.fixture(scope="module")
def micro_span3(spark):
    docs = spark.createDataFrame(
        [
            (1, "a m b"),     # big span a..b (slop 1), m inside
            (2, "a x b m"),   # big span a..b, m OUTSIDE the span
            (3, "a m x y b"), # gap 4 > slop+1 -> no big span
            (4, "m a b m"),   # big span a..b adjacent; both m outside
            (5, "a m b a b"), # first span contains m, second doesn't
        ],
        "doc_id long, text string",
    )
    return B.build_positional(docs), B.build_bm25(docs)


def test_span_containing_semantics(micro_span3):
    pos, idx = micro_span3
    out = {r["doc_id"] for r in B.span_containing_topk(
        pos, idx, ("a", "b", 1), "m", k=10).collect()}
    assert out == {1, 5}


def test_span_within_semantics(micro_span3):
    pos, idx = micro_span3
    out = {r["doc_id"] for r in B.span_within_topk(
        pos, idx, ("a", "b", 1), "m", k=10).collect()}
    assert out == {1, 5}


def test_span_within_counts_positions_not_spans(spark):
    # one big span holding TWO little matches: within tf=2, containing tf=1
    docs = spark.createDataFrame(
        [(1, "a m m b"), (2, "a b")], "doc_id long, text string"
    )
    pos, idx = B.build_positional(docs), B.build_bm25(docs)
    within = B.span_within_topk(pos, idx, ("a", "b", 2), "m", k=10)
    containing = B.span_containing_topk(pos, idx, ("a", "b", 2), "m", k=10)
    assert {r["doc_id"] for r in within.collect()} == {1}
    assert {r["doc_id"] for r in containing.collect()} == {1}


def test_distance_feature_peaks_at_origin(eng):
    out = eng.search({"distance_feature": {
        "field": "n_chars", "origin": 500, "pivot": 100, "boost": 2.0,
    }}, size=20).collect()
    assert all(0.0 < r["score"] <= 2.0 + 1e-9 for r in out)
    # hits sort by closeness to origin
    docs = {r["doc_id"]: r["n_chars"] for r in
            eng.documents().select("doc_id", "n_chars").collect()}
    dists = [abs(docs[r["doc_id"]] - 500) for r in out]
    assert dists == sorted(dists)


def test_moving_percentiles_window_bounds(eng, spark):
    from neural_search_spark import catalog
    from .conftest import SF_CORRECT

    ev = catalog.table(spark, SF_CORRECT, "events")
    out = eng._compile_agg(ev, {"moving_percentiles": {
        "of": {"date_histogram": {"field": "ts", "fixed_interval": "1d"}},
        "metric": "doc_count", "window": 7, "percents": [50.0, 90.0],
        "sort": "bucket",
    }}).orderBy("bucket").collect()
    for r in out:
        assert r["moving_p50"] <= r["moving_p90"]
