"""Unit tests for the round-3 curation operators: distributed k-means,
SemDeDup semantic dedup, repeated-span removal, per-key frequency cap,
BPE pair counting. (Registry-level hash parity vs the DuckDB oracles is
covered by test_oracle_parity.py; these pin the operator semantics on
hand-built frames.)"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from neural_search_spark.functions.text import char_pairs
from neural_search_spark.operators import cluster as CL
from neural_search_spark.operators import dedup as DD
from neural_search_spark.operators import packing as PK


# --- k-means ---------------------------------------------------------------


def _emb_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")


def test_kmeans_assign_argmin_and_tiebreak(spark):
    embs = _emb_df(
        spark,
        [
            (0, [0.0, 0.0]),
            (1, [10.0, 10.0]),
            (2, [5.0, 5.0]),  # exactly equidistant → lowest cid wins
        ],
    )
    cents = [(0, [0.0, 0.0]), (1, [10.0, 10.0])]
    got = {
        r["vec_id"]: r["cluster_id"]
        for r in CL.kmeans_assign(embs, cents).collect()
    }
    assert got == {0: 0, 1: 1, 2: 0}


def test_kmeans_lloyd_converges_to_true_centers(spark):
    # two tight blobs; seeds both start inside blob A — one round must
    # still separate them because the far blob pulls its nearest seed
    blob_a = [(i, [0.0 + 0.01 * i, 0.0]) for i in range(5)]
    blob_b = [(10 + i, [100.0 + 0.01 * i, 0.0]) for i in range(5)]
    embs = _emb_df(spark, blob_a + blob_b)
    seeds = [(0, [0.0, 0.0]), (1, [100.0, 0.0])]
    assigned, cents = CL.kmeans_lloyd(embs, seeds, rounds=2)
    by_cluster = {
        r["cluster_id"]: r["n"]
        for r in assigned.groupBy("cluster_id").agg(F.count("*").alias("n")).collect()
    }
    assert by_cluster == {0: 5, 1: 5}
    # recomputed centroids are the blob means (quantized)
    assert cents[0][1][0] == pytest.approx(0.02, abs=1e-6)
    assert cents[1][1][0] == pytest.approx(100.02, abs=1e-6)


def test_kmeans_lloyd_empty_cluster_keeps_previous_centroid(spark):
    # all points near one seed: the other cluster goes empty and must
    # retain its previous centroid (deterministic Lloyd's fallback)
    embs = _emb_df(spark, [(i, [float(i) * 0.1, 0.0]) for i in range(4)])
    seeds = [(0, [0.0, 0.0]), (1, [1000.0, 0.0])]
    _assigned, cents = CL.kmeans_lloyd(embs, seeds, rounds=1)
    assert cents[1][1] == [1000.0, 0.0]


# --- semantic dedup --------------------------------------------------------


def test_semantic_dedup_pairs_only_within_cluster(spark):
    # v0≈v1 (same cell), v2 is v0's duplicate but lands in the OTHER
    # cell → the within-cell scan must NOT pair (0,2): that recall gap
    # is the documented SemDeDup tradeoff, and (0,1) must be found.
    embs = _emb_df(
        spark,
        [
            (0, [1.0, 0.0]),
            (1, [1.0, 0.001]),
            (2, [0.0, 1.0]),
            (3, [0.001, 1.0]),
        ],
    )
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    pairs = {
        (r["a"], r["b"])
        for r in DD.semantic_dedup_pairs(embs, cents, threshold=0.99).collect()
    }
    assert pairs == {(0, 1), (2, 3)}


def test_semantic_dedup_keep_min_id_keeper(spark):
    embs = _emb_df(
        spark,
        [(0, [1.0, 0.0]), (1, [1.0, 0.0001]), (2, [1.0, 0.0002]), (5, [0.0, 1.0])],
    )
    cents = [(0, [1.0, 0.0])]
    kept = sorted(
        r["vec_id"]
        for r in DD.semantic_dedup_keep(embs, cents, threshold=0.999).collect()
    )
    # 1 and 2 are near-dups of 0 → dropped; 5 is orthogonal → kept
    assert kept == [0, 5]


# --- span dedup ------------------------------------------------------------


def test_span_dedup_removes_globally_repeated_spans(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c x y z"),
            (2, "a b c q r s"),
            (3, ""),
        ],
        "doc_id: long, text: string",
    )
    rows = {r["doc_id"]: r for r in DD.span_dedup(docs, span_tokens=3).collect()}
    assert rows[1]["n_spans"] == 2 and rows[1]["n_dup_spans"] == 1
    assert rows[1]["kept_text"] == "x y z"
    assert rows[2]["kept_text"] == "q r s"
    # empty doc: no spans at all (guard against descending sequence)
    assert 3 not in rows or rows[3]["n_spans"] == 0


def test_span_dedup_partial_tail_span(spark):
    docs = spark.createDataFrame([(1, "a b c d")], "doc_id: long, text: string")
    row = DD.span_dedup(docs, span_tokens=3).collect()[0]
    assert row["n_spans"] == 2  # "a b c" + tail "d"
    assert row["kept_text"] == "a b c d"


# --- frequency cap ---------------------------------------------------------


def test_cap_per_key_exact_cap_and_determinism(spark):
    docs = spark.createDataFrame(
        [(i, f"src{i % 3}") for i in range(30)], "doc_id: long, source: string"
    )
    kept1 = PK.cap_per_key(docs, "source", 4).collect()
    kept2 = PK.cap_per_key(docs, "source", 4).collect()
    assert sorted(r["doc_id"] for r in kept1) == sorted(r["doc_id"] for r in kept2)
    counts = (
        PK.cap_per_key(docs, "source", 4)
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert all(r["n"] == 4 for r in counts)


def test_cap_per_key_under_cap_keeps_all(spark):
    docs = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id: long, source: string"
    )
    assert PK.cap_per_key(docs, "source", 10).count() == 3


# --- BPE pairs -------------------------------------------------------------


def test_char_pairs_expression(spark):
    df = spark.createDataFrame(
        [("spark",), ("ab",), ("x",), ("",)], "w: string"
    )
    got = {r["w"]: r["p"] for r in df.select("w", char_pairs(F.col("w")).alias("p")).collect()}
    assert got["spark"] == ["sp", "pa", "ar", "rk"]
    assert got["ab"] == ["ab"]
    assert got["x"] == []
    assert got[""] == []
