"""Sequence packing, source mixing, and function_score decay."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from neural_search_spark.operators import packing as PK
from neural_search_spark.operators import relevance as REL


def test_pack_sequences_start_fit(spark):
    # one bucket (n_buckets=1) → pure cumsum packing, budget 10:
    # tokens 4,5,3,9,2 → starts 0,4,9,12,21 → seq 0,0,0,1,2
    rows = [(i, t) for i, t in enumerate([4, 5, 3, 9, 2])]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    out = PK.pack_sequences(df, F.col("n"), budget=10, n_buckets=1)
    got = {r["doc_id"]: r["seq_id"] for r in out.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 2}


def test_pack_sequences_buckets_are_independent(spark):
    rows = [(i, 7) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    out = PK.pack_sequences(df, F.col("n"), budget=14, n_buckets=4).collect()
    # each bucket holds doc_ids ≡ b (mod 4) in doc_id order; 7-token
    # docs → exactly 2 docs per sequence in every bucket
    for r in out:
        assert r["pack_bucket"] == r["doc_id"] % 4
    per_bucket = {}
    for r in sorted(out, key=lambda r: (r["pack_bucket"], r["doc_id"])):
        per_bucket.setdefault(r["pack_bucket"], []).append(r["seq_id"])
    for seqs in per_bucket.values():
        assert seqs == [0, 0, 1, 1, 2]


def test_pack_sequences_no_single_partition_exchange(spark):
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 17 + 1).alias("n")
    )
    plan = PK.pack_sequences(df, F.col("n"), budget=64)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_mix_sources_budget_binds_on_scarcest(spark):
    # a: 100 tokens at weight .5 → budget cap 200; b: 300 at .5 → cap
    # 600 → B=200, keep 100 tokens of each (a whole, b truncated)
    rows = [("a", i, 10) for i in range(10)] + [("b", 100 + i, 10) for i in range(30)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n long")
    out = {
        r["source"]: r
        for r in PK.mix_sources(df, F.col("n"), {"a": 0.5, "b": 0.5}).collect()
    }
    assert out["a"]["kept_tokens"] == 100 and out["a"]["kept_docs"] == 10
    assert out["b"]["kept_tokens"] == 100 and out["b"]["kept_docs"] == 10
    assert abs(out["a"]["share"] - 0.5) < 1e-9


def test_mix_sources_prefix_is_doc_id_ordered(spark):
    # uneven doc sizes: the kept set must be the doc_id-ordered prefix,
    # never a re-ordering that fits more tokens
    rows = [("a", 0, 50), ("a", 1, 50), ("a", 2, 1), ("b", 3, 100)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n long")
    out = {
        r["source"]: r
        for r in PK.mix_sources(df, F.col("n"), {"a": 0.5, "b": 0.5}).collect()
    }
    # B = min(101/.5, 100/.5) = 200 → a keeps cum ≤ 100 → docs 0,1
    assert out["a"]["kept_docs"] == 2 and out["a"]["kept_tokens"] == 100


def test_function_score_gauss_shape(spark):
    rows = [
        (0, "2024-01-15 12:00:00"),  # at origin → decay 1
        (1, "2024-01-16 11:00:00"),  # inside 1-day offset → decay 1
        (2, "2024-01-23 12:00:00"),  # |dt|-offset = scale → decay 0.5
        (3, "2024-01-07 12:00:00"),  # symmetric (left side) → 0.5
    ]
    df = spark.createDataFrame(rows, "event_id long, ts string").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts")
    )
    out = {
        r["event_id"]: r["fs_score"]
        for r in REL.function_score_gauss(
            df, "ts", "2024-01-15 12:00:00", scale_s=7 * 86400.0,
            offset_s=86400.0, decay=0.5,
        ).collect()
    }
    assert math.isclose(out[0], 1.0)
    assert math.isclose(out[1], 1.0)
    assert math.isclose(out[2], 0.5)
    assert math.isclose(out[3], 0.5)


def test_function_score_gauss_no_shuffle(spark):
    df = spark.range(10).select(
        F.col("id").alias("event_id"),
        F.lit("2024-01-15 12:00:00").cast("timestamp").alias("ts"),
    )
    plan = REL.function_score_gauss(
        df, "ts", "2024-01-15 12:00:00", 100.0
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_shuffle_deterministic_reproducible_and_partitioned(spark):
    df = spark.range(500).select(F.col("id").alias("doc_id"))
    a = PK.shuffle_deterministic(df, "epoch0:", n_buckets=16).collect()
    b = PK.shuffle_deterministic(df, "epoch0:", n_buckets=16).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    c = PK.shuffle_deterministic(df, "epoch1:", n_buckets=16).collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))
    # per-bucket positions are a contiguous 1..n ranking
    per = {}
    for r in a:
        per.setdefault(r["shuffle_bucket"], []).append(r["pos"])
    for poss in per.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    plan = PK.shuffle_deterministic(df, "s:")._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_pack_sequences_properties_random(spark):
    """Start-fit invariants on random inputs: deterministic, seq ids
    contiguous-monotone per bucket, every closed sequence reaches the
    budget, overflow bounded by one document."""
    import random

    rnd = random.Random(123)
    budget = 50
    rows = [(i, rnd.randrange(1, 40)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    out = PK.pack_sequences(df, F.col("n"), budget=budget, n_buckets=4).collect()
    again = PK.pack_sequences(df, F.col("n"), budget=budget, n_buckets=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    per = {}
    for r in sorted(out, key=lambda r: (r["pack_bucket"], r["doc_id"])):
        per.setdefault(r["pack_bucket"], []).append(r)
    for rows_b in per.values():
        seqs = [r["seq_id"] for r in rows_b]
        assert seqs == sorted(seqs)           # monotone in doc order
        assert seqs[0] == 0
        # exact start-fit recurrence: seq = floor(cum_start / budget),
        # so consecutive seq ids never jump by more than
        # ceil(max_doc/budget) and the span covered by each closed bin
        # ends at or past its boundary
        cum = 0
        for r in rows_b:
            assert r["seq_id"] == cum // budget
            cum += r["n_tokens"]


def test_mix_sources_never_exceeds_budget_share(spark):
    import random

    rnd = random.Random(7)
    rows = [(f"s{j}", j * 1000 + i, rnd.randrange(1, 30))
            for j in range(3) for i in range(50)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n long")
    targets = {"s0": 0.5, "s1": 0.3, "s2": 0.2}
    out = {r["source"]: r for r in PK.mix_sources(df, F.col("n"), targets).collect()}
    totals = {}
    for s, _d, n in rows:
        totals[s] = totals.get(s, 0) + n
    budget = min(totals[s] / w for s, w in targets.items())
    for s, w in targets.items():
        assert out[s]["kept_tokens"] <= budget * w + 1e-9  # prefix never over
    # the binding source is kept whole
    binding = min(targets, key=lambda s: totals[s] / targets[s])
    assert out[binding]["kept_tokens"] == totals[binding]
