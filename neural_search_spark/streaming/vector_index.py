"""Incrementally-maintained dense vector index (the IVF analogue of
IncrementalPostingsIndex — S5's segment lifecycle applied to
embeddings instead of postings).

Reference scope: the reference maintains its sparse ANN structures on
Lucene segment writes and merges (`sparse/codec/SparsePostingsConsumer.java`,
`MergeHelper.java`); dense vectors delegate to the k-NN plugin's
per-segment graphs. The Spark-native shape is an object-store-friendly
LSM: each micro-batch lands as an append-only parquet *segment* whose
rows are already assigned to their IVF cell, so the cell filter is
Hive-partition pruning at read time; `recluster()` is the periodic
merge/OPTIMIZE job that retrains centroids over everything seen so far
and rewrites one compacted, cluster-partitioned segment.

Layout (all append-only until recluster):
  base/centroids/version=<v>/   (cid int, cvec array<double>)  — KBs
  base/vectors/batch=<id>/cluster_id=<cid>/  (vec_id, embedding)

Scale shape: writers touch only their batch's files; readers prune to
`nprobe` cluster directories (≈ nprobe/ncells of the bytes); the
centroid table is driver-size (k × dim doubles) by construction, so
"collect centroids" is reading kilobytes, never the corpus.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.vector import as_double, cosine, lit_vector
from ..operators.cluster import kmeans_assign, kmeans_lloyd


class IncrementalVectorIndex:
    def __init__(self, base_dir: str):
        self.base = str(base_dir).rstrip("/")
        self.vectors_dir = self.base + "/vectors"
        self.centroids_dir = self.base + "/centroids"

    # -- centroid artifact -------------------------------------------------
    def seed_centroids(
        self, spark: SparkSession, seeds: list[tuple[int, list[float]]]
    ) -> None:
        """Write centroid version 0 (e.g. the deterministic first-k
        vectors, or centroids trained offline)."""
        self._write_centroids(spark, seeds, version=0)

    def _write_centroids(
        self, spark: SparkSession, cents: list[tuple[int, list[float]]], version: int
    ) -> None:
        df = spark.createDataFrame(
            [(int(c), [float(x) for x in v]) for c, v in cents],
            "cid int, cvec array<double>",
        )
        df.coalesce(1).write.mode("overwrite").parquet(
            f"{self.centroids_dir}/version={version}"
        )

    def centroid_version(self, spark: SparkSession | None = None) -> int:
        """Latest centroid version. With a SparkSession the listing
        goes through the Hadoop FileSystem API (hdfs://s3a:// safe);
        without one it falls back to the local filesystem (raising
        FileNotFoundError when absent, which callers treat as
        'unseeded')."""
        if spark is not None:
            from .dedup_index import _fs_and_path

            fs, path = _fs_and_path(spark, self.centroids_dir)
            if not fs.exists(path):
                raise FileNotFoundError(self.centroids_dir)
            names = [
                st.getPath().getName()
                for st in fs.listStatus(path)
                if st.isDirectory()
            ]
        else:
            names = os.listdir(self.centroids_dir)
        versions = [
            int(d.split("=", 1)[1]) for d in names if d.startswith("version=")
        ]
        if not versions:
            raise ValueError(f"no centroids under {self.centroids_dir}")
        return max(versions)

    def centroids(self, spark: SparkSession) -> list[tuple[int, list[float]]]:
        v = self.centroid_version(spark)
        rows = (
            spark.read.parquet(f"{self.centroids_dir}/version={v}")
            .orderBy("cid")
            .collect()
        )
        return [(int(r["cid"]), [float(x) for x in r["cvec"]]) for r in rows]

    # -- writer side -------------------------------------------------------
    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        """Idempotent per-batch segment write: assign each vector to
        its nearest current centroid (argmin L2 — same rule as
        kmeans_assign, all JVM-side), then write the segment
        partitioned by cluster_id so probes prune directories.
        Replayed batches overwrite their own `batch=<id>` dir —
        exactly-once without a transactional table."""
        cents = self.centroids(batch.sparkSession)
        assigned = kmeans_assign(batch, cents).join(batch, "vec_id")
        # repartition on the partition column before partitionBy — the
        # r8 scale lesson: without it every task holds an open writer
        # per cell (32 tasks x 256 cells OOMed the 4M build)
        (
            assigned.select("vec_id", "embedding", "cluster_id")
            .repartition("cluster_id")
            .write.partitionBy("cluster_id")
            .mode("overwrite")
            .parquet(f"{self.vectors_dir}/batch={batch_id}")
        )

    def attach(self, stream: DataFrame, checkpoint: str) -> StreamingQuery:
        return (
            stream.writeStream.foreachBatch(self.apply_batch)
            .outputMode("update")
            .option("checkpointLocation", checkpoint)
            .start()
        )

    # -- reader side -------------------------------------------------------
    def vectors(self, spark: SparkSession) -> DataFrame:
        """(vec_id, embedding, cluster_id) across all LIVE segments;
        `batch` is segment bookkeeping, not index data. A raw segment
        superseded by a compacted segment's merged-batches manifest (a
        foreachBatch replay re-delivered a batch AFTER recluster()
        absorbed and deleted it) is excluded — its vec_ids already live
        in the compacted copy (ADVICE r9)."""
        from .dedup_index import _live_segments

        live, merged = _live_segments(spark, self.vectors_dir)
        if not merged:
            return spark.read.parquet(self.vectors_dir).drop("batch")
        return (
            spark.read.option("basePath", self.vectors_dir)
            .parquet(*[f"{self.vectors_dir}/{s}" for s in live])
            .drop("batch")
        )

    def search(
        self, spark: SparkSession, query_vec: list[float], k: int = 10, nprobe: int = 4
    ) -> DataFrame:
        """IVF probe over the streamed corpus: pick the nprobe cells
        whose centroids are L2-closest to the query (driver math over
        KBs), scan ONLY those cluster_id partitions, exact cosine
        top-k inside."""
        cents = self.centroids(spark)
        probe = [
            cid
            for cid, _ in sorted(
                cents,
                key=lambda c: (
                    sum((q - x) ** 2 for q, x in zip(query_vec, c[1])),
                    c[0],
                ),
            )[:nprobe]
        ]
        v = as_double(F.col("embedding"))
        return (
            self.vectors(spark)
            .where(F.col("cluster_id").isin(probe))
            .select(
                F.col("vec_id").alias("doc_id"),
                cosine(v, lit_vector([float(x) for x in query_vec])).alias("score"),
            )
            .orderBy(F.col("score").desc(), "doc_id")
            .limit(k)
        )

    # -- merge / re-cluster (S5 analogue) ----------------------------------
    def recluster(self, spark: SparkSession, rounds: int = 2) -> None:
        """The periodic OPTIMIZE job: Lloyd's rounds over everything
        seen so far (seeded from the current centroids), then ONE
        compacted cluster-partitioned segment replaces the accumulated
        batch segments.

        SNAPSHOT-ALONGSIDE swap (ADVICE r8's compact contract): the
        segment list is snapshotted first, Lloyd's trains over exactly
        the snapshot, the compacted segment lands alongside under a
        fresh `batch=c<n>` name, the centroids version-bump commits the
        new geometry, and only the snapshotted segments are deleted —
        a batch segment written mid-recluster survives (its rows keep
        their old-version assignment until the next recluster), and a
        crash at any point loses nothing. A reader overlapping the
        swap may transiently see duplicate vec_ids (identical
        embeddings; assignments may differ across versions) — schedule
        recluster off query windows."""
        # REPLAY-AFTER-COMPACTION (ADVICE r9): the compacted segment's
        # merged-batches manifest supersedes the raw batch ids it
        # absorbed, so a replay that re-writes `batch=<id>` after this
        # recluster deleted it is excluded by vectors() and by the next
        # snapshot instead of contributing duplicate vec_ids.
        from .dedup_index import (
            _fs_and_path,
            _live_segments,
            _segment_names,
            _write_merged_manifest,
        )

        snapshot, prior_merged = _live_segments(spark, self.vectors_dir)
        if not snapshot:
            return
        # basePath keeps partition discovery rooted at the index dir
        # (each snapshot segment nests cluster_id=* subdirs)
        all_vecs = (
            spark.read.option("basePath", self.vectors_dir)
            .parquet(*[f"{self.vectors_dir}/{s}" for s in snapshot])
            .select("vec_id", "embedding")
        )
        assigned, cents = kmeans_lloyd(
            all_vecs, self.centroids(spark), rounds=rounds
        )
        c_nums = [
            int(s[len("batch=c"):])
            for s in snapshot
            if s.startswith("batch=c") and s[len("batch=c"):].isdigit()
        ]
        out_name = f"batch=c{max(c_nums) + 1 if c_nums else 0}"
        (
            all_vecs.join(assigned, "vec_id")
            .select("vec_id", "embedding", "cluster_id")
            .repartition("cluster_id")
            .write.partitionBy("cluster_id")
            .mode("overwrite")
            .parquet(f"{self.vectors_dir}/{out_name}")
        )
        covered = prior_merged | {
            int(sid)
            for s in snapshot
            if (sid := s[len("batch="):]).isdigit()
        }
        _write_merged_manifest(
            spark, f"{self.vectors_dir}/{out_name}", sorted(covered)
        )
        self._write_centroids(
            spark, cents, version=self.centroid_version(spark) + 1
        )
        fs, _ = _fs_and_path(spark, self.vectors_dir)
        jvm_path = spark._jvm.org.apache.hadoop.fs.Path
        current = set(_segment_names(spark, self.vectors_dir))
        leftovers = {
            s
            for s in current - set(snapshot) - {out_name}
            if (sid := s[len("batch="):]).isdigit() and int(sid) in covered
        }
        for s in set(snapshot) | leftovers:
            fs.delete(jvm_path(f"{self.vectors_dir}/{s}"), True)
