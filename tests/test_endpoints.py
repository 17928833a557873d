"""Endpoint parity: _mget, _field_caps, _scroll, _search/template,
fetch phase (_source + script_fields), and the round-3-session-4
aggregations (auto_date_histogram, top_metrics, MAD, boxplot,
scripted_metric, bucket_script, cumulative_cardinality, date_range,
geo_centroid).

Reference surface: the REST action layer the survey maps to engine
methods (SURVEY.md §4) — scroll/PIT pagination, mustache search
templates, field capabilities, multi-get, and the fetch phase's
source filtering + script fields.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neural_search_spark import catalog
from neural_search_spark.plans.compiler import Engine

from .conftest import SF_CORRECT

MATCH = {"match": {"field": "text", "query": "spark join stream window"}}


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(spark, SF_CORRECT)


# -- _mget ------------------------------------------------------------------


def test_mget_returns_exactly_requested_ids(eng):
    ids = [5, 11, 400]
    rows = eng.mget(ids).collect()
    assert [r["doc_id"] for r in rows] == sorted(ids)


def test_mget_missing_ids_are_absent_not_errors(eng):
    rows = eng.mget([5, 10_000_000]).collect()
    assert [r["doc_id"] for r in rows] == [5]


# -- _field_caps ------------------------------------------------------------


def test_field_caps_types_and_aggregatability(eng):
    caps = {
        (r["tbl"], r["field"]): r
        for r in eng.field_caps(tables=("documents", "embeddings")).collect()
    }
    assert caps[("documents", "text")]["type"] == "text"
    assert caps[("documents", "text")]["aggregatable"] is False
    assert caps[("documents", "n_chars")]["type"] == "long"
    assert caps[("documents", "n_chars")]["aggregatable"] is True
    assert caps[("embeddings", "embedding")]["type"] == "knn_vector"
    # every field is searchable (the engine can filter on any column)
    assert all(r["searchable"] for r in caps.values())


# -- _scroll ----------------------------------------------------------------


def test_scroll_pages_concatenate_to_deep_search(eng):
    deep = [
        (r["doc_id"], round(r["score"], 4))
        for r in eng.search(MATCH, size=30).collect()
    ]
    paged = []
    for i, page in enumerate(eng.scroll(MATCH, size=10)):
        paged.extend(
            (r["doc_id"], round(r["score"], 4)) for r in page.collect()
        )
        if i == 2:
            break
    assert paged == deep


def test_scroll_terminates_on_exhaustion(eng):
    # a filter-only bool matches a fixed finite set; scroll must stop
    n = eng.count({"bool": {"filter": {"term": {"lang": "de"}}}})
    pages = list(
        eng.scroll(
            {"bool": {"filter": {"term": {"lang": "de"}}}}, size=max(1, n // 2 + 1)
        )
    )
    assert 1 <= len(pages) <= 3
    assert sum(p.count() for p in pages) == n


# -- _search/template -------------------------------------------------------


def test_search_template_native_type_substitution(eng):
    out = eng.search_template(
        {"query": {"match": {"field": "text", "query": "{{q}}"}}, "size": "{{k}}"},
        {"q": "spark join", "k": 3},
    )
    assert out.count() == 3


def test_search_template_string_embedding(eng):
    # placeholder inside a longer string substitutes textually
    direct = eng.search(
        {"match": {"field": "text", "query": "spark join"}}, size=5
    ).collect()
    templated = eng.search_template(
        '{"query": {"match": {"field": "text", "query": "spark {{w}}"}}, "size": 5}',
        {"w": "join"},
    ).collect()
    assert [r["doc_id"] for r in templated] == [r["doc_id"] for r in direct]


def test_search_template_equals_direct_query(eng):
    direct = eng.search(MATCH, size=10).collect()
    templated = eng.search_template(
        {"query": MATCH, "size": 10}, {}
    ).collect()
    assert [(r["doc_id"], round(r["score"], 4)) for r in templated] == [
        (r["doc_id"], round(r["score"], 4)) for r in direct
    ]


# -- fetch phase ------------------------------------------------------------


def test_fetch_projects_only_requested_source(eng):
    hits = eng.search(MATCH, size=5)
    out = eng.fetch(hits, source=["lang"], script_fields={"dbl": "n_chars * 2"})
    assert out.columns == ["doc_id", "score", "lang", "dbl"]
    row = out.first()
    assert row["dbl"] is not None


def test_fetch_prunes_text_column_from_scan(eng, spark):
    # _source filtering must reach the reader: a fetch that never asks
    # for `text` must not read it (column pruning in ReadSchema)
    hits = eng.search(MATCH, size=5)
    plan = (
        eng.fetch(hits, source=["n_chars"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scans = [
        ln for ln in plan.splitlines() if "ReadSchema" in ln and "documents" in ln
    ]
    fetch_scans = [ln for ln in scans if "n_chars" in ln]
    assert fetch_scans, "expected a documents scan with ReadSchema"
    assert any("text" not in ln for ln in fetch_scans)


# -- new aggregations -------------------------------------------------------


def test_auto_date_histogram_respects_bucket_target(eng, spark):
    ev = catalog.table(spark, SF_CORRECT, "events")
    out = eng._compile_agg(
        ev, {"auto_date_histogram": {"field": "ts", "buckets": 12}}
    ).collect()
    assert 1 <= len(out) <= 12
    ivs = {r["interval_s"] for r in out}
    assert len(ivs) == 1
    from neural_search_spark.plans.compiler import _AUTO_DH_LADDER

    assert ivs.pop() in _AUTO_DH_LADDER
    assert sum(r["doc_count"] for r in out) == ev.count()


def test_auto_date_histogram_narrow_span_picks_finer_interval(eng, spark):
    # restricting the frame to one day must select a smaller interval
    ev = catalog.table(spark, SF_CORRECT, "events")
    day = ev.where(F.col("ts") < F.lit("2024-01-02").cast("timestamp"))
    wide = eng._compile_agg(
        ev, {"auto_date_histogram": {"field": "ts", "buckets": 12}}
    ).first()["interval_s"]
    narrow = eng._compile_agg(
        day, {"auto_date_histogram": {"field": "ts", "buckets": 12}}
    ).first()["interval_s"]
    assert narrow < wide


def test_date_range_buckets_partition_the_frame(eng, spark):
    ev = catalog.table(spark, SF_CORRECT, "events")
    out = {
        r["key"]: r["doc_count"]
        for r in eng._compile_agg(ev, {"date_range": {"field": "ts", "ranges": [
            {"to": "2024-01-15 00:00:00", "key": "a"},
            {"from": "2024-01-15 00:00:00", "key": "b"},
        ]}}).collect()
    }
    assert out["a"] + out["b"] == ev.count()


def test_top_metrics_matches_manual_sort(eng, spark):
    ev = catalog.table(spark, SF_CORRECT, "events")
    out = eng._compile_agg(ev, {"top_metrics": {
        "sort": {"value": "desc"}, "size": 3, "id_field": "event_id",
        "metrics": [{"field": "user_id"}],
    }}).collect()
    manual = (
        ev.orderBy(F.col("value").desc(), "event_id")
        .select("event_id", "value", "user_id")
        .limit(3)
        .collect()
    )
    assert [tuple(r) for r in out] == [tuple(r) for r in manual]


def test_mad_matches_numpy(eng, spark):
    import numpy as np

    d = catalog.table(spark, SF_CORRECT, "documents")
    vals = np.array([r["n_chars"] for r in d.select("n_chars").collect()], float)
    expect = float(np.median(np.abs(vals - np.median(vals))))
    got = eng._compile_agg(
        d, {"median_absolute_deviation": {"field": "n_chars"}}
    ).first()["mad"]
    assert got == pytest.approx(expect, abs=1e-3)


def test_boxplot_quartiles_ordered(eng, spark):
    ev = catalog.table(spark, SF_CORRECT, "events")
    r = eng._compile_agg(ev, {"boxplot": {"field": "value"}}).first()
    assert r["min"] <= r["q1"] <= r["q2"] <= r["q3"] <= r["max"]


def test_scripted_metric_reduce_modes(eng, spark):
    d = catalog.table(spark, SF_CORRECT, "documents")
    total = eng._compile_agg(d, {"scripted_metric": {
        "map_script": "n_chars", "reduce_script": "sum"}}).first()["value"]
    mx = eng._compile_agg(d, {"scripted_metric": {
        "map_script": "n_chars", "reduce_script": "max"}}).first()["value"]
    agg = d.agg(F.sum("n_chars"), F.max("n_chars")).first()
    assert total == float(agg[0])
    assert mx == float(agg[1])


def test_bucket_script_computes_ratio(eng, spark):
    d = catalog.table(spark, SF_CORRECT, "documents")
    out = eng._compile_agg(d, {"bucket_script": {
        "of": {"terms": {"field": "lang", "size": 5},
               "aggs": {"s": {"sum": {"field": "n_chars"}}}},
        "script": "s / doc_count", "as": "ratio",
    }}).collect()
    for r in out:
        assert r["ratio"] == pytest.approx(r["s"] / r["doc_count"], abs=1e-3)


def test_cumulative_cardinality_monotone_and_exact_total(eng, spark):
    ev = catalog.table(spark, SF_CORRECT, "events")
    out = eng._compile_agg(ev, {"cumulative_cardinality": {
        "field": "ts", "fixed_interval": "1d", "value_field": "user_id",
    }}).collect()
    cum = [r["cumulative_cardinality"] for r in out]
    assert cum == sorted(cum)
    assert cum[-1] == ev.select("user_id").distinct().count()


def test_geo_centroid_mean(eng, spark):
    d = catalog.table(spark, SF_CORRECT, "documents").select(
        "doc_id",
        (F.col("doc_id") % 10).cast("double").alias("lat"),
        (F.col("doc_id") % 7).cast("double").alias("lon"),
    )
    r = eng._compile_agg(d, {"geo_centroid": {}}).first()
    m = d.agg(F.avg("lat"), F.avg("lon"), F.count("*")).first()
    assert r["lat"] == pytest.approx(float(m[0]), abs=1e-3)
    assert r["lon"] == pytest.approx(float(m[1]), abs=1e-3)
    assert r["count"] == m[2]


def test_single_leaf_pagination_offsets(eng):
    # the default search branch must honor from_ (round-2 ADVICE noted
    # function_score; this covers the single-leaf path)
    top20 = [r["doc_id"] for r in eng.search(MATCH, size=20).collect()]
    page2 = [r["doc_id"] for r in eng.search(MATCH, size=10, from_=10).collect()]
    assert page2 == top20[10:]


# -- batch-3 pipeline/statistical aggs ---------------------------------------


def test_percentiles_bucket_monotone(eng, spark):
    ev = catalog.table(spark, SF_CORRECT, "events")
    out = eng._compile_agg(ev, {"percentiles_bucket": {
        "of": {"date_histogram": {"field": "ts", "fixed_interval": "1d"}},
        "metric": "doc_count", "percents": [10, 50, 90],
    }}).collect()
    vals = [r["value"] for r in sorted(out, key=lambda r: r["percent"])]
    assert vals == sorted(vals)


def test_normalize_percent_of_sum_sums_to_one(eng, spark):
    ev = catalog.table(spark, SF_CORRECT, "events")
    out = eng._compile_agg(ev, {"normalize": {
        "of": {"terms": {"field": "event_type", "size": 10}},
        "metric": "doc_count", "method": "percent_of_sum", "as": "share",
    }}).collect()
    assert sum(r["share"] for r in out) == pytest.approx(1.0, abs=1e-3)


def test_normalize_rescale_bounds(eng, spark):
    ev = catalog.table(spark, SF_CORRECT, "events")
    out = eng._compile_agg(ev, {"normalize": {
        "of": {"terms": {"field": "event_type", "size": 10}},
        "metric": "doc_count", "method": "rescale_0_1", "as": "r",
    }}).collect()
    rs = [r["r"] for r in out]
    assert min(rs) == 0.0 and max(rs) == 1.0


def test_moving_fn_max_dominates_value(eng, spark):
    ev = catalog.table(spark, SF_CORRECT, "events")
    out = eng._compile_agg(ev, {"moving_fn": {
        "of": {"date_histogram": {"field": "ts", "fixed_interval": "1d"}},
        "metric": "doc_count", "fn": "max", "window": 7, "sort": "bucket",
    }}).collect()
    for r in out:
        assert r["moving_max"] >= r["doc_count"]


def test_rate_scales_doc_count(eng, spark):
    ev = catalog.table(spark, SF_CORRECT, "events")
    out = eng._compile_agg(ev, {"rate": {
        "field": "ts", "fixed_interval": "1d", "unit": "1h"}}).collect()
    for r in out:
        assert r["rate"] == pytest.approx(r["doc_count"] / 24.0, abs=1e-3)


def test_t_test_zero_for_identical_samples(eng, spark):
    ev = catalog.table(spark, SF_CORRECT, "events")
    r = eng._compile_agg(ev, {"t_test": {
        "field": "value",
        "a": {"term": {"event_type": "click"}},
        "b": {"term": {"event_type": "click"}},
    }}).first()
    assert r["t"] == pytest.approx(0.0, abs=1e-6)
    assert r["n_a"] == r["n_b"]


def test_geo_bounds_contains_centroid(eng, spark):
    d = catalog.table(spark, SF_CORRECT, "documents").select(
        "doc_id",
        (F.col("doc_id") % 10).cast("double").alias("lat"),
        (F.col("doc_id") % 7).cast("double").alias("lon"),
    )
    box = eng._compile_agg(d, {"geo_bounds": {}}).first()
    cen = eng._compile_agg(d, {"geo_centroid": {}}).first()
    assert box["bottom"] <= cen["lat"] <= box["top"]
    assert box["left"] <= cen["lon"] <= box["right"]


# -- batch-4: profile, request cache, cross-index, sloppy phrase -------------


def test_profile_reports_plan_features(eng):
    prof = eng.profile(MATCH)
    assert set(prof) == {
        "shuffles", "broadcast_joins", "sort_merge_joins", "top_k_nodes",
        "nested_loop_joins", "single_partition_exchanges",
    }
    assert prof["top_k_nodes"] >= 1  # every search ends in a TakeOrdered
    assert prof["single_partition_exchanges"] == 0  # scale red flag


def test_cached_search_hits_and_equals_uncached(eng):
    q = {"match": {"field": "text", "query": "spark join"}}
    base = eng.request_cache_stats()
    a = eng.cached_search(q, size=5).collect()
    b = eng.cached_search(q, size=5).collect()
    stats = eng.request_cache_stats()
    assert stats["misses"] == base["misses"] + 1
    assert stats["hits"] == base["hits"] + 1
    direct = eng.search(q, size=5).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b] == [tuple(r) for r in direct]


def test_cached_search_distinct_keys_miss(eng):
    q = {"match": {"field": "text", "query": "spark join"}}
    before = eng.request_cache_stats()["misses"]
    eng.cached_search(q, size=7).collect()   # different size → new key
    assert eng.request_cache_stats()["misses"] == before + 1


def test_cross_index_search_provenance_and_per_index_stats(eng, spark):
    from neural_search_spark.plans.compiler import cross_index_search

    remote = Engine(spark, "/root/testdata/sf0.001")
    out = cross_index_search(
        {"local": eng, "remote": remote}, MATCH, size=20
    ).collect()
    idxs = {r["idx"] for r in out}
    assert idxs <= {"local", "remote"}
    # per-index scoring: the same doc_id can appear once per index with
    # DIFFERENT scores (different corpus stats) — assert no (idx, doc)
    # duplicates rather than global doc uniqueness
    assert len({(r["idx"], r["doc_id"]) for r in out}) == len(out)


def test_match_phrase_slop_superset_of_exact(eng):
    exact = {r["doc_id"] for r in eng.search(
        {"match_phrase": {"field": "text", "query": "table scan"}},
        size=1000).collect()}
    sloppy = {r["doc_id"] for r in eng.search(
        {"match_phrase": {"field": "text", "query": "table scan", "slop": 3}},
        size=1000).collect()}
    assert exact <= sloppy
    assert len(sloppy) > len(exact)  # slop must widen on this corpus


def test_nested_inner_hits_chunk_contains_scoring_token(spark):
    from neural_search_spark import registry

    out = registry.SPARK_QUERIES["nested_inner_hits"](spark, SF_CORRECT).collect()
    assert len(out) == 10
    for r in out:
        if r["score"] > 0:
            assert any(t in r["chunk"].split() for t in ("spark", "join"))


# -- wrapper query + sliced scroll ------------------------------------------


def test_wrapper_decodes_to_same_plan(eng):
    import base64
    import json

    inner = {"match": {"field": "text", "query": "spark join stream window"}}
    b64 = base64.b64encode(json.dumps(inner).encode()).decode()
    direct = [(r["doc_id"], round(r["score"], 4)) for r in
              eng.search(inner, size=10).collect()]
    wrapped = [(r["doc_id"], round(r["score"], 4)) for r in
               eng.search({"wrapper": {"query": b64}}, size=10).collect()]
    assert wrapped == direct


def test_sliced_scroll_slices_are_disjoint_and_complete(eng):
    q = {"match": {"field": "text", "query": "spark join stream window"}}
    full = set()
    for r in eng.search(
        {"bool": {"must": [q], "pagination_depth": 1_000_000}},
        size=1_000_000,
    ).collect():
        full.add(r["doc_id"])
    sliced = []
    for i in range(2):
        ids = set()
        for page in eng.scroll(q, size=100, slice_spec={"id": i, "max": 2}):
            ids |= {r["doc_id"] for r in page.collect()}
        sliced.append(ids)
    assert sliced[0].isdisjoint(sliced[1])
    assert sliced[0] | sliced[1] == full


def test_sliced_scroll_rejects_bad_slice(eng):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        next(eng.scroll({"match": {"field": "text", "query": "spark"}},
                        slice_spec={"id": 2, "max": 2}))


def test_track_total_hits_threshold_and_exact(eng):
    f = {"range": {"n_chars": {"gte": 0}}}
    exact = eng.count(f)
    got_true = eng.total_hits(f, track_total_hits=True)
    assert got_true == {"value": exact, "relation": "eq"}
    low = eng.total_hits(f, track_total_hits=5)
    assert low == {"value": 5, "relation": "gte"}
    high = eng.total_hits(f, track_total_hits=exact + 10)
    assert high == {"value": exact, "relation": "eq"}


def test_track_total_hits_scored_query(eng):
    q = {"match": {"field": "text", "query": "spark join stream window"}}
    res = eng.total_hits(q, track_total_hits=3)
    assert res["relation"] in ("eq", "gte")
    if res["relation"] == "gte":
        assert res["value"] == 3
