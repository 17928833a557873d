"""Approximate aggregates are rows-only in the driver contract; here
they are gated against exact answers with tight error bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from neural_search_spark import registry

from .conftest import SF_CORRECT


def test_hll_estimate_within_5pct(spark):
    approx = {
        r.event_type: r.approx_users
        for r in registry.q_events_approx_distinct(spark, SF_CORRECT).collect()
    }
    from neural_search_spark import catalog

    exact = {
        r.event_type: r.exact
        for r in catalog.table(spark, SF_CORRECT, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for t, e in exact.items():
        assert abs(approx[t] - e) / e <= 0.05, (t, approx[t], e)


def test_approx_quantiles_close_to_exact(spark):
    from neural_search_spark import catalog

    rows = {r.event_type: r for r in registry.q_events_approx_quantiles(spark, SF_CORRECT).collect()}
    ev = catalog.table(spark, SF_CORRECT, "events")
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
            F.expr("percentile(value, 0.99)").alias("p99"),
        )
        .collect()
    }
    for t, ex in exact.items():
        for q in ["p50", "p95", "p99"]:
            a, e = getattr(rows[t], q), getattr(ex, q)
            assert abs(a - e) <= max(0.02 * abs(e), 0.5), (t, q, a, e)
