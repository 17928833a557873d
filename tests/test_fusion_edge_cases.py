"""Exact-arithmetic unit tests for the fusion semantics traps
(SURVEY.md §4): re-derived from the reference formulas, not from its
test files."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from neural_search_spark.operators import fusion as FU
from neural_search_spark.operators.rerank import mmr_diversify


def _sub(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, score double")


def _norm_scores(spark, rows_list, technique):
    subs = [_sub(spark, r) for r in rows_list]
    u = FU.union_subqueries(subs)
    n = FU.normalize(u, technique=technique)
    return {(r["subquery_idx"], r["doc_id"]): r["norm_score"] for r in n.collect()}


def test_minmax_single_score_list_is_one(spark):
    # MinMaxScoreNormalizationTechnique: single score → 1.0
    out = _norm_scores(spark, [[(1, 0.7)], [(1, 0.2), (2, 0.9)]], "min_max")
    assert out[(0, 1)] == 1.0


def test_minmax_floor_at_min(spark):
    # normalized 0 → 0.001 floor
    out = _norm_scores(spark, [[(1, 0.2), (2, 0.9)]], "min_max")
    assert out[(0, 1)] == pytest.approx(0.001)
    assert out[(0, 2)] == pytest.approx(1.0)


def test_l2_zero_norm_is_zero(spark):
    out = _norm_scores(spark, [[(1, 0.0), (2, 0.0)]], "l2")
    assert out[(0, 1)] == 0.0


def test_l2_formula(spark):
    out = _norm_scores(spark, [[(1, 3.0), (2, 4.0)]], "l2")
    assert out[(0, 1)] == pytest.approx(3.0 / 5.0)


def test_zscore_equal_mean_gets_max(spark):
    # all scores equal → s == mean → sub-query max (raw)
    out = _norm_scores(spark, [[(1, 0.5), (2, 0.5)]], "z_score")
    assert out[(0, 1)] == pytest.approx(0.5)


def test_zscore_nonpositive_clamp(spark):
    out = _norm_scores(spark, [[(1, 1.0), (2, 2.0), (3, 3.0)]], "z_score")
    # z(1.0) < 0 → 0.001 ; z(2.0)=0 → equals mean → max raw (3.0)
    assert out[(0, 1)] == pytest.approx(0.001)
    assert out[(0, 2)] == pytest.approx(3.0)
    # sample stddev (n−1) of [1,2,3] is exactly 1.0 — matches
    # commons-math DescriptiveStatistics.getStandardDeviation()
    # used by ZScoreNormalizationTechnique.java:130-141
    assert out[(0, 3)] == pytest.approx(1.0)


def test_rrf_rank_scores(spark):
    out = _norm_scores(spark, [[(1, 0.9), (2, 0.8), (3, 0.8)]], "rrf")
    assert out[(0, 1)] == pytest.approx(1.0 / 61.0)
    # tie at 0.8 → doc_id ascending
    assert out[(0, 2)] == pytest.approx(1.0 / 62.0)
    assert out[(0, 3)] == pytest.approx(1.0 / 63.0)


def test_missing_subquery_scores_are_skipped_not_zero(spark):
    # doc 2 appears only in sub-query 0; weighted mean over PRESENT
    # scores only (ArithmeticMeanScoreCombinationTechnique.java:43-60)
    subs = [_sub(spark, [(1, 0.5), (2, 1.0)]), _sub(spark, [(1, 1.0)])]
    u = FU.union_subqueries(subs)
    # bypass normalization: treat raw as norm
    n = u.withColumn("norm_score", F.col("raw_score"))
    c = {r["doc_id"]: r["score"] for r in FU.combine(n, "arithmetic_mean", [0.7, 0.3]).collect()}
    assert c[2] == pytest.approx(1.0)  # 0.7*1.0/0.7 — NOT (0.7*1.0)/(1.0)
    assert c[1] == pytest.approx((0.7 * 0.5 + 0.3 * 1.0) / 1.0)


def test_geometric_harmonic_skip_nonpositive(spark):
    subs = [_sub(spark, [(1, 0.0), (2, 4.0)]), _sub(spark, [(1, 9.0), (2, 1.0)])]
    u = FU.union_subqueries(subs)
    n = u.withColumn("norm_score", F.col("raw_score"))
    g = {r["doc_id"]: r["score"] for r in FU.combine(n, "geometric_mean").collect()}
    assert g[1] == pytest.approx(9.0)  # 0.0 skipped entirely
    assert g[2] == pytest.approx(2.0)  # sqrt(4*1)
    h = {r["doc_id"]: r["score"] for r in FU.combine(n, "harmonic_mean").collect()}
    assert h[1] == pytest.approx(9.0)
    assert h[2] == pytest.approx(2.0 / (1.0 / 4.0 + 1.0 / 1.0))


def test_rrf_combination_is_weighted_sum(spark):
    subs = [_sub(spark, [(1, 0.5)]), _sub(spark, [(1, 0.25)])]
    u = FU.union_subqueries(subs)
    n = u.withColumn("norm_score", F.col("raw_score"))
    c = {r["doc_id"]: r["score"] for r in FU.combine(n, "rrf", [2.0, 1.0]).collect()}
    assert c[1] == pytest.approx(2.0 * 0.5 + 1.0 * 0.25)  # sum, NOT mean


def test_max_subqueries_enforced(spark):
    subs = [_sub(spark, [(1, 1.0)])] * 6
    with pytest.raises(ValueError):
        FU.union_subqueries(subs)


def test_collapse_subquery_cap(spark):
    # two groups; sub-query 0 has 3 docs in group g1 → cap 2 keeps the
    # 2 best per (subquery, group)
    union = spark.createDataFrame(
        [(1, 0.9, 0), (2, 0.8, 0), (3, 0.7, 0), (4, 0.6, 0), (1, 0.5, 1)],
        "doc_id long, raw_score double, subquery_idx int",
    )
    corpus = spark.createDataFrame(
        [(1, "g1"), (2, "g1"), (3, "g1"), (4, "g2")], "doc_id long, grp string"
    )
    capped = FU.collapse_subquery_cap(union, corpus, "grp", docs_per_group=2)
    rows = {(r["subquery_idx"], r["doc_id"]) for r in capped.collect()}
    assert rows == {(0, 1), (0, 2), (0, 4), (1, 1)}  # doc 3 dropped from g1/sub0


def test_mmr_diversify_prefers_diverse(spark):
    # candidates: two near-identical high scorers + one distinct
    results = spark.createDataFrame(
        [(1, 0.95), (2, 0.94), (3, 0.80)], "doc_id long, score double"
    )
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.999, 0.01]),
            (3, [0.0, 1.0]),
        ],
        "doc_id long, embedding array<float>",
    )
    picked = mmr_diversify(results, corpus, k=2, lambda_=0.5)
    assert picked == [1, 3]  # 2 is redundant with 1 → 3 wins diversity
