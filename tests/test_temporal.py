"""asof_join edge semantics: exact-match toggle, tie-break, no-match,
and multi-key partitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from neural_search_spark.operators import temporal as TJ
from neural_search_spark.operators.temporal import asof_join


def _frames(spark):
    probe = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "a"), (3, 5, "b")],
        "pid long, ts long, k string",
    )
    build = spark.createDataFrame(
        [(100, 10, "a"), (101, 10, "a"), (102, 15, "a"), (103, 50, "b")],
        "bid long, ts long, k string",
    )
    return probe, build


def test_allow_exact_picks_equal_ts_max_tiebreak(spark):
    probe, build = _frames(spark)
    out = asof_join(probe, build, on="k", ts="ts", carry=["bid"], tiebreak="bid")
    rows = {r.pid: r.asof_bid for r in out.collect()}
    # pid 1 at ts=10: builds 100 and 101 tie at ts=10 → max bid (101)
    assert rows[1] == 101
    # pid 2 at ts=20: latest build ≤ 20 is 102 (ts=15)
    assert rows[2] == 102
    # pid 3 at ts=5 on key b: only build is at ts=50 (future) → null
    assert rows[3] is None


def test_strict_excludes_equal_ts(spark):
    probe, build = _frames(spark)
    out = asof_join(
        probe, build, on="k", ts="ts", carry=["bid"], tiebreak="bid",
        allow_exact=False,
    )
    rows = {r.pid: r.asof_bid for r in out.collect()}
    assert rows[1] is None  # equal-ts builds excluded, nothing earlier
    assert rows[2] == 102


def test_probe_columns_and_row_count_preserved(spark):
    probe, build = _frames(spark)
    out = asof_join(probe, build, on="k", ts="ts", carry=["bid", "ts"], tiebreak="bid")
    assert out.count() == probe.count()
    assert set(out.columns) == {"pid", "ts", "k", "asof_bid", "asof_ts"}
    # carried ts comes from the matched build row
    row = {r.pid: r for r in out.collect()}
    assert row[2].asof_ts == 15


def test_single_shuffle_plan(spark):
    """The plan must contain exactly one exchange (hash by key) and no
    nested-loop join — the property that makes it viable at scale."""
    probe, build = _frames(spark)
    out = asof_join(probe, build, on="k", ts="ts", carry=["bid"], tiebreak="bid")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_band_join_matches_naive(spark):
    """Bucketed band join ≡ naive cross-filter on a small frame."""
    from neural_search_spark.operators.temporal import band_join

    left = spark.createDataFrame(
        [(1, 100.0, "a"), (2, 500.0, "a"), (3, 100.0, "b")],
        "lid long, ts double, k string",
    )
    right = spark.createDataFrame(
        [(10, 50.0, "a"), (11, 199.0, "a"), (12, 201.0, "a"), (13, 100.0, "b")],
        "rid long, ts double, k string",
    )
    got = sorted(
        (r.lid, r.rid)
        for r in band_join(
            left, right, on="k", left_ts="ts", right_ts="ts", band=100
        ).collect()
    )
    naive = sorted(
        (lr.lid, rr.rid)
        for lr in left.collect()
        for rr in right.collect()
        if lr.k == rr.k and abs(lr.ts - rr.ts) <= 100
    )
    assert got == naive == [(1, 10), (1, 11), (3, 13)]


def test_band_join_no_nested_loop(spark):
    from neural_search_spark.operators.temporal import band_join

    left = spark.createDataFrame([(1, 100.0, "a")], "lid long, ts double, k string")
    right = spark.createDataFrame([(10, 50.0, "a")], "rid long, ts double, k string")
    plan = band_join(left, right, on="k", left_ts="ts", right_ts="ts", band=100)
    s = plan._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in s
    assert "CartesianProduct" not in s


def _rand_events(spark, n_users=5, n=400, seed=7):
    import random

    rnd = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append((i, rnd.randrange(n_users), float(rnd.randrange(0, 10_000)),
                     rnd.random()))
    return spark.createDataFrame(rows, "event_id long, user_id long, ts double, value double")


def test_asof_join_bucketed_equiv_random(spark):
    ev = _rand_events(spark)
    probe = ev.where("event_id % 3 = 0").select("event_id", "user_id", "ts", "value")
    build = ev.where("event_id % 3 != 0").select(
        "user_id", "ts", F.col("event_id").alias("bid"), F.col("value").alias("bval")
    )
    for exact in (True, False):
        a = TJ.asof_join(probe, build, on="user_id", ts="ts",
                         carry=["bid", "bval"], tiebreak="bid", allow_exact=exact)
        b = TJ.asof_join_bucketed(probe, build, on="user_id", ts="ts",
                                  carry=["bid", "bval"], tiebreak="bid",
                                  bucket_seconds=500.0, allow_exact=exact)
        ra = sorted(map(tuple, a.collect()))
        rb = sorted(map(tuple, b.collect()))
        assert ra == rb


def test_asof_join_bucketed_cross_bucket_carry(spark):
    # build only in bucket 0; probes in later empty buckets must still
    # see the carry from bucket 0 (and pre-build probes stay null)
    probe = spark.createDataFrame(
        [(1, 1, 50.0), (2, 1, 5000.0), (3, 1, 9000.0), (4, 1, 10.0)],
        "event_id long, user_id long, ts double")
    build = spark.createDataFrame(
        [(1, 20.0, 100), (1, 30.0, 101)], "user_id long, ts double, bid long")
    out = TJ.asof_join_bucketed(probe, build, on="user_id", ts="ts",
                                carry=["bid"], tiebreak="bid",
                                bucket_seconds=100.0)
    got = {r["event_id"]: r["asof_bid"] for r in out.collect()}
    assert got == {1: 101, 2: 101, 3: 101, 4: None}


def test_asof_join_bucketed_window_is_bucket_partitioned(spark):
    ev = _rand_events(spark, n_users=1, n=100)
    probe = ev.select("event_id", "user_id", "ts")
    build = ev.select("user_id", "ts", F.col("event_id").alias("bid"))
    plan = TJ.asof_join_bucketed(
        probe, build, on="user_id", ts="ts", carry=["bid"],
        tiebreak="bid", bucket_seconds=100.0,
    )._jdf.queryExecution().executedPlan().toString()
    # the big within-bucket window must partition by (user_id, __bkt)
    assert "__bkt" in plan


def test_asof_join_bucketed_timestamp_ntz(spark):
    # parquet micros timestamps read as TIMESTAMP_NTZ must not crash
    # the bucket computation (regression: cast NTZ→double is illegal)
    probe = spark.createDataFrame(
        [(1, 1, "2024-01-01 10:00:00")], "event_id long, user_id long, ts string"
    ).select("event_id", "user_id", F.col("ts").cast("timestamp_ntz").alias("ts"))
    build = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00", 7)], "user_id long, ts string, bid long"
    ).select("user_id", F.col("ts").cast("timestamp_ntz").alias("ts"), "bid")
    out = TJ.asof_join_bucketed(probe, build, on="user_id", ts="ts",
                                carry=["bid"], tiebreak="bid",
                                bucket_seconds=3600.0)
    assert out.collect()[0]["asof_bid"] == 7
