"""N-scaled flagship dedup knobs (VERDICT r3 item 1): the graded
emb_neardup_scaled / semantic_dedup_scaled must hash-match a
dynamically-built DuckDB oracle at TWO scale factors, with the knob
value derived from each corpus's size by the same formula — the
demonstration that the knob actually moves with N (sf0.01 N=500 →
4 planes / 16 cells; sf0.1 N=2000 → 6 planes / 63 cells) while
results stay exact for the chosen config."""

from __future__ import annotations

import pytest

from neural_search_spark import registry as R

from .oracle_check import compare

SF_SMALL = "/root/testdata/sf0.01"
SF_BIG = "/root/testdata/sf0.1"


def test_knobs_scale_with_corpus():
    n_small = R._table_count(SF_SMALL, "embeddings")
    n_big = R._table_count(SF_BIG, "embeddings")
    assert n_big > n_small
    assert R.neardup_planes(n_big) > R.neardup_planes(n_small)
    assert R.semdedup_cells(n_big) > R.semdedup_cells(n_small)
    # constant expected bucket/cell size (within 2× of target)
    assert n_big / 2 ** R.neardup_planes(n_big) <= 2 * R.NEARDUP_TARGET_BUCKET
    assert n_big / R.semdedup_cells(n_big) <= 2 * R.SEMDEDUP_CELL_TARGET


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_BIG])
def test_emb_neardup_scaled_matches_dynamic_oracle(spark, sf_dir):
    n = R._table_count(sf_dir, "embeddings")
    sql = R.emb_neardup_oracle_sql(R.neardup_planes(n))
    ok, msg = compare(R.q_emb_neardup_scaled(spark, sf_dir), sql, sf_dir)
    assert ok, msg


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_BIG])
def test_semantic_dedup_scaled_matches_dynamic_oracle(spark, sf_dir):
    n = R._table_count(sf_dir, "embeddings")
    sql = R.semantic_dedup_oracle_sql(R.semdedup_cells(n))
    ok, msg = compare(R.q_semantic_dedup_scaled(spark, sf_dir), sql, sf_dir)
    assert ok, msg


def test_static_registration_matches_formula(spark):
    # the driver-graded static oracle must be the formula's value for
    # the graded SF (guards against testdata regeneration drift)
    n = R._table_count(SF_SMALL, "embeddings")
    assert R.ORACLES["emb_neardup_scaled"] == R.emb_neardup_oracle_sql(
        R.neardup_planes(n)
    )
    assert R.ORACLES["semantic_dedup_scaled"] == R.semantic_dedup_oracle_sql(
        R.semdedup_cells(n)
    )


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_BIG])
def test_emb_neardup_grid_matches_dynamic_oracle(spark, sf_dir):
    """The hot-bucket grid variant shares the scaled plane formula and
    oracle — it must match at both SFs with the per-SF knob value."""
    n = R._table_count(sf_dir, "embeddings")
    sql = R.emb_neardup_oracle_sql(R.neardup_planes(n))
    ok, msg = compare(R.q_emb_neardup_grid(spark, sf_dir), sql, sf_dir)
    assert ok, msg
