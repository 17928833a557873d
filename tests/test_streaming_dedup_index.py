"""Incremental streaming MinHash-LSH dedup index
(streaming/dedup_index.py): after any prefix of micro-batches, the
union of emitted near-dup pairs must equal the batch twin
(operators/dedup.py::minhash_lsh_dedup_sig) over the union of the
documents — within-batch pairs via the self-join, cross-batch pairs
via the new-vs-index band join. The estimator and band scheme are
shared code, so the equality is exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from neural_search_spark.operators import dedup as DD
from neural_search_spark.streaming.dedup_index import IncrementalLSHDedupIndex


def _corpus(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while rain "
        "falls on the quiet meadow beyond the old stone bridge"
    )
    rows = [
        (1, base),
        (2, base + " tonight"),                       # near-dup of 1
        (3, "completely different text about spark partitions and "
            "shuffle behavior at scale with adaptive execution"),
        (4, base),                                    # exact dup of 1 (cross-batch)
        (5, "completely different text about spark partitions and "
            "shuffle behavior at scale with adaptive planning"),  # near-dup of 3
        (6, "yet another unrelated document mentioning lakes "
            "mountains rivers and long hiking trails in autumn"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs_set(df):
    return {
        (r["a"], r["b"], r["sig_sim"]) for r in df.select("a", "b", "sig_sim").collect()
    }


def test_incremental_equals_batch(spark, tmp_path):
    docs = _corpus(spark)
    b1 = docs.where(F.col("doc_id") <= 3)   # contains the 1-2 pair
    b2 = docs.where(F.col("doc_id") > 3)    # 4 dups 1 (cross), 5 near-dups 3 (cross)

    idx = IncrementalLSHDedupIndex(str(tmp_path / "lsh"))
    idx.apply_batch(b1, 0)
    # prefix equivalence after batch 1
    assert _pairs_set(idx.pairs(spark)) == _pairs_set(
        DD.minhash_lsh_dedup_sig(b1)
    )
    idx.apply_batch(b2, 1)
    got = _pairs_set(idx.pairs(spark))
    want = _pairs_set(DD.minhash_lsh_dedup_sig(docs))
    assert got == want
    # the interesting pairs actually exist: exact cross-batch dup at 1.0
    assert (1, 4, 1.0) in got
    assert any(a == 1 and b == 2 for a, b, _ in got)
    assert idx.doc_ids_seen(spark).count() == 6


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """foreachBatch re-delivers a batch after crash-restart; the
    per-batch overwrite must REPLACE, not double-append."""
    docs = _corpus(spark)
    b1 = docs.where(F.col("doc_id") <= 3)
    b2 = docs.where(F.col("doc_id") > 3)
    idx = IncrementalLSHDedupIndex(str(tmp_path / "lsh"))
    idx.apply_batch(b1, 0)
    idx.apply_batch(b2, 1)
    before = _pairs_set(idx.pairs(spark))
    idx.apply_batch(b2, 1)  # replay
    assert _pairs_set(idx.pairs(spark)) == before
    assert idx.doc_ids_seen(spark).count() == 6


def test_compact_preserves_results(spark, tmp_path):
    docs = _corpus(spark)
    idx = IncrementalLSHDedupIndex(str(tmp_path / "lsh"))
    idx.apply_batch(docs.where(F.col("doc_id") <= 2), 0)
    idx.apply_batch(docs.where(F.col("doc_id").between(3, 4)), 1)
    idx.compact(spark)
    idx.apply_batch(docs.where(F.col("doc_id") >= 5), 2)
    assert _pairs_set(idx.pairs(spark)) == _pairs_set(
        DD.minhash_lsh_dedup_sig(docs)
    )


def test_attach_readstream(spark, tmp_path):
    """End-to-end through writeStream: the gate runs as a streaming
    sink and produces the batch-equivalent pair set."""
    docs = _corpus(spark)
    src = str(tmp_path / "src")
    docs.where(F.col("doc_id") <= 3).coalesce(1).write.parquet(src + "/f1")
    docs.where(F.col("doc_id") > 3).coalesce(1).write.parquet(src + "/f2")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    idx = IncrementalLSHDedupIndex(str(tmp_path / "lsh"))
    q = idx.attach(stream, str(tmp_path / "ck"))
    q.processAllAvailable()
    q.stop()
    assert _pairs_set(idx.pairs(spark)) == _pairs_set(
        DD.minhash_lsh_dedup_sig(docs)
    )


def test_contract_query_oracle(spark):
    """dedup_minhash_sig is a contract query — the driver's own
    comparison at the correctness SF."""
    from neural_search_spark import registry
    from tests.oracle_check import compare

    sf = "/root/testdata/sf0.01"
    ok, msg = compare(
        registry.SPARK_QUERIES["dedup_minhash_sig"](spark, sf),
        registry.ORACLES["dedup_minhash_sig"],
        sf,
    )
    assert ok, msg
