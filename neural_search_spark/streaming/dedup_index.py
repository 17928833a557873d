"""Incremental near-duplicate gate for a live ingest stream.

The production question a 100 TB crawl pipeline asks per micro-batch
is "which of these NEW documents duplicate anything ingested SO FAR?"
— the batch MinHash-LSH job (operators/dedup.py) answers all-pairs
over a frozen corpus, but re-running it per batch is O(corpus) per
batch. This module maintains the LSH index incrementally, the same
continuously-maintained-artifact contract as
streaming/ingest.py::IncrementalPostingsIndex (the reference's
segment model, `sparse/codec/MergeHelper.java`) applied to dedup
state:

- per batch, the new docs' signatures + band keys are computed once;
- candidates = new-vs-INDEX band equi-join + new-vs-new self-join;
- verification uses the signature-agreement Jaccard estimator
  (operators/dedup.py::signature_jaccard) — the index stores only the
  H-component signature per doc (H×8 hex chars), never the shingle
  sets, so corpus state is O(docs), not O(tokens);
- the batch's bands/signatures then append to the index as their own
  `batch=<id>` parquet segment (idempotent overwrite — a replayed
  foreachBatch REPLACES its previous attempt).

Equivalence contract: after any prefix of batches, the union of
emitted pairs equals operators/dedup.py::minhash_lsh_dedup_sig over
the union of documents — every pair (a, b) is either within one batch
(caught by the self-join) or across batches (caught by the
new-vs-index join when the later doc arrives). The estimator and the
band scheme are shared code, so the equality is exact, not
approximate (tests/test_streaming_dedup_index.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators import dedup as DD


class IncrementalLSHDedupIndex:
    """Streaming MinHash-LSH dedup index.

    Layout on disk (append-only parquet segments):
      base_dir/sigs/batch=<id>/   (doc_id, h0..h{H-1})
      base_dir/bands/batch=<id>/  (doc_id, band_idx, band_hash)
      base_dir/pairs/batch=<id>/  (a, b, sig_sim)  — the verdicts

    At cluster scale the bands segments are the hot join side: they
    are tiny rows (id + 2 small keys) hash-partitioned by the band
    key at read time by the equi-join itself, so each micro-batch's
    probe cost is ~|batch| × n_bands lookups, independent of corpus
    size. A periodic compact() (same role as the postings index's)
    re-buckets the accumulated segments by band_hash so the join
    reads only matching buckets.
    """

    def __init__(
        self,
        base_dir: str,
        shingle_n: int = 3,
        num_hashes: int = DD.NUM_MINHASHES,
        band_size: int = DD.BAND_SIZE,
        threshold: float = 0.5,
    ):
        self.base = str(base_dir).rstrip("/")
        self.sigs_dir = self.base + "/sigs"
        self.bands_dir = self.base + "/bands"
        self.pairs_dir = self.base + "/pairs"
        self.shingle_n = shingle_n
        self.num_hashes = num_hashes
        self.band_size = band_size
        self.threshold = threshold

    # -- writer side --------------------------------------------------------
    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        """Gate one micro-batch and grow the index. Runs inside
        foreachBatch, where `batch` is a plain DataFrame — the
        new-vs-index join is an ordinary batch equi-join against the
        parquet state, no stream-stream join state."""
        import os

        spark = batch.sparkSession
        sh = DD.shingle_sets(batch, self.shingle_n)
        sigs = DD.minhash_signatures(sh, self.num_hashes).persist()
        bands = DD.band_frame(sigs, self.num_hashes, self.band_size)

        # new-vs-new (within the batch)
        self_pairs = DD.lsh_candidate_pairs(
            sigs, self.num_hashes, self.band_size
        )
        # new-vs-index (across batches): any band collision, oriented
        # a < b so cross and self pairs share the dedup key
        if os.path.exists(self.bands_dir):
            old_bands = spark.read.parquet(self.bands_dir).drop("batch")
            cross = (
                bands.alias("n")
                .join(
                    old_bands.alias("o"),
                    (F.col("n.band_idx") == F.col("o.band_idx"))
                    & (F.col("n.band_hash") == F.col("o.band_hash"))
                    & (F.col("n.doc_id") != F.col("o.doc_id")),
                )
                .select(
                    F.least("n.doc_id", "o.doc_id").alias("a"),
                    F.greatest("n.doc_id", "o.doc_id").alias("b"),
                )
                .distinct()
            )
            all_sigs = spark.read.parquet(self.sigs_dir).drop("batch").unionByName(sigs)
            cands = self_pairs.unionByName(cross).distinct()
        else:
            all_sigs = sigs
            cands = self_pairs

        pairs = DD.signature_jaccard(cands, all_sigs, self.num_hashes).where(
            F.col("sig_sim") >= self.threshold
        )
        pairs.write.mode("overwrite").parquet(f"{self.pairs_dir}/batch={batch_id}")
        sigs.write.mode("overwrite").parquet(f"{self.sigs_dir}/batch={batch_id}")
        bands.write.mode("overwrite").parquet(f"{self.bands_dir}/batch={batch_id}")
        sigs.unpersist()

    def attach(self, stream: DataFrame, checkpoint: str) -> StreamingQuery:
        return (
            stream.writeStream.foreachBatch(self.apply_batch)
            .outputMode("update")
            .option("checkpointLocation", checkpoint)
            .start()
        )

    # -- reader side ----------------------------------------------------------
    def pairs(self, spark: SparkSession) -> DataFrame:
        """All near-dup verdicts so far: (a, b, sig_sim), a < b,
        distinct across segments (a replayed batch overwrites its own
        segment, and cross/self pairs never coincide, so segments are
        disjoint by construction — the distinct is a safety net)."""
        return spark.read.parquet(self.pairs_dir).drop("batch").distinct()

    def doc_ids_seen(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.sigs_dir).drop("batch").select("doc_id")

    # -- maintenance ----------------------------------------------------------
    def compact(self, spark: SparkSession) -> None:
        """Re-bucket the accumulated band segments by band_hash (the
        join key) so the per-batch probe join reads co-located
        buckets — the dedup-state analogue of the postings index's
        segment merge."""
        import os
        import shutil

        merged = spark.read.parquet(self.bands_dir).drop("batch")
        tmp = self.base + "/bands_compacted"
        merged.repartition("band_hash").write.mode("overwrite").parquet(tmp)
        shutil.rmtree(self.bands_dir)
        os.makedirs(self.bands_dir)
        shutil.move(tmp, self.bands_dir + "/batch=compacted")
