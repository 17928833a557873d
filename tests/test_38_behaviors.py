"""Reference 3.8 behaviors: custom previous-score field on by_field
rerank (#1880), two-phase rescore skipped for sorted requests
(#1898), hybrid rejected under dfs_query_then_fetch (#1873)."""

from __future__ import annotations

import pytest

from neural_search_spark.plans.compiler import Engine, _strip_two_phase


def test_previous_score_field_custom_name(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    out = eng.search(
        {"match": {"field": "text", "query": "spark join"}},
        pipeline={
            "rerank": {
                "type": "by_field",
                "target_field": "n_chars",
                "keep_previous_score": True,
                "previous_score_field": "bm25_score",
            }
        },
        size=5,
    )
    assert "bm25_score" in out.columns and "previous_score" not in out.columns
    rows = out.collect()
    # rerank re-sorts by the target field value
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r["bm25_score"] is not None for r in rows)


def test_strip_two_phase_recurses_hybrid():
    q = {
        "hybrid": {
            "queries": [
                {"neural_sparse": {"query_text": "a", "two_phase": True}},
                {"bool": {"must": [
                    {"neural_sparse": {"query_text": "b",
                                       "two_phase": {"prune_ratio": 0.2}}},
                ]}},
                {"match": {"field": "text", "query": "c"}},
            ]
        }
    }
    s = _strip_two_phase(q)
    subs = s["hybrid"]["queries"]
    assert "two_phase" not in subs[0]["neural_sparse"]
    assert "two_phase" not in subs[1]["bool"]["must"][0]["neural_sparse"]
    assert subs[2] == {"match": {"field": "text", "query": "c"}}
    # original untouched
    assert q["hybrid"]["queries"][0]["neural_sparse"]["two_phase"] is True


def test_sorted_request_runs_single_phase(spark, sf_dir):
    # with a field sort, two_phase must produce the EXACT hit set —
    # identical to the same query without two_phase
    eng = Engine(spark, sf_dir)
    pipeline = {"sort": {"fields": [{"field": "n_chars", "asc": False}]}}
    q = {"neural_sparse": {"query_text": "spark join stream"}}
    q_tp = {"neural_sparse": {"query_text": "spark join stream",
                              "two_phase": {"expansion_rate": 0.1,
                                            "max_window_size": 1}}}
    a = [(r["doc_id"]) for r in eng.search(q, pipeline=pipeline, size=5).collect()]
    b = [(r["doc_id"]) for r in eng.search(q_tp, pipeline=pipeline, size=5).collect()]
    assert a == b  # the 1-candidate window was ignored under sort


def test_hybrid_blocked_under_dfs_query_then_fetch(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    with pytest.raises(ValueError, match="dfs_query_then_fetch"):
        eng.search(
            {"hybrid": {"queries": [
                {"match": {"field": "text", "query": "spark"}}]}},
            search_type="dfs_query_then_fetch",
        )
    # non-hybrid passes through
    out = eng.search(
        {"match": {"field": "text", "query": "spark"}},
        search_type="dfs_query_then_fetch",
        size=3,
    )
    assert out.count() > 0


def test_hybrid_blocked_inside_compound(spark, sf_dir):
    # 3.6 fix (#1791): hybrid nested in function_score / script_score
    eng = Engine(spark, sf_dir)
    hybrid = {"hybrid": {"queries": [
        {"match": {"field": "text", "query": "spark"}}]}}
    with pytest.raises(ValueError, match="function_score"):
        eng.search({"function_score": {"query": hybrid, "functions": []}})
    with pytest.raises(ValueError, match="script_score"):
        eng.search({"script_score": {"query": hybrid, "script": "_score"}})


def test_previous_score_field_collision_rejected(spark, sf_dir):
    """previous_score_field exists to AVOID collisions (#1880) — a name
    that collides with score/id/target must raise, not produce
    duplicate columns."""
    import pytest

    from neural_search_spark.operators.rerank import rerank_by_field
    from neural_search_spark import catalog

    docs = catalog.table(spark, sf_dir, "documents")
    results = docs.selectExpr("doc_id", "1.0 as score").limit(3)
    for bad in ("score", "doc_id", "n_tokens"):
        with pytest.raises(ValueError, match="collides"):
            rerank_by_field(
                results,
                docs.selectExpr("doc_id", "doc_id as n_tokens"),
                target_field="n_tokens",
                keep_previous_score=True,
                previous_score_field=bad,
            )
