"""Measure the incremental streaming dedup gate as the index grows.

Claim under test (streaming/dedup_index.py): per-micro-batch cost is
O(batch) signature compute + a join against the accumulated BAND
table, whose rows are ~tens of bytes (id + band keys) — i.e. the
corpus-size term a batch pays is a scan of the compact LSH state, not
a re-shard of the corpus text. This script ingests B batches of the
sf0.1 documents table (ids offset per batch; a fixed fraction of each
batch repeats earlier text verbatim so cross-batch duplicates exist)
and prints per-batch wall seconds, index rows, and pairs found —
BASELINE.md records the run.

Usage: python scripts/incremental_dedup_bench.py [n_batches] [frac_dup]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/tmp/inc_dedup"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    frac_dup = float(sys.argv[2]) if len(sys.argv) > 2 else 0.1

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import functions as F

    from neural_search_spark.session import get_spark
    from neural_search_spark.streaming.dedup_index import (
        IncrementalLSHDedupIndex,
    )

    spark = get_spark("inc-dedup-bench")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    if os.path.exists(OUT):
        shutil.rmtree(OUT)
    idx = IncrementalLSHDedupIndex(OUT + "/lsh")

    print(f"corpus {n_docs} docs/batch x {n_batches} batches, "
          f"{frac_dup:.0%} verbatim repeats of batch 0")
    total_pairs = 0
    for b in range(n_batches):
        # batch b: fresh ids; most texts salted to be unique to the
        # batch, a frac_dup slice kept VERBATIM (cross-batch dups)
        batch = docs.select(
            (F.col("doc_id") + F.lit(b * n_docs)).alias("doc_id"),
            F.when(
                (F.col("doc_id") % F.lit(int(1 / frac_dup))) == 0,
                F.col("text"),
            )
            .otherwise(F.concat(F.col("text"), F.lit(f" batchsalt{b}")))
            .alias("text"),
        )
        t0 = time.perf_counter()
        idx.apply_batch(batch, b)
        dt = time.perf_counter() - t0
        pairs_b = spark.read.parquet(f"{idx.pairs_dir}/batch={b}").count()
        total_pairs += pairs_b
        print(f"batch {b}: {dt:6.1f}s  {n_docs / dt:8.0f} docs/s  "
              f"index {(b + 1) * n_docs:>8} docs  pairs+ {pairs_b}")

    t0 = time.perf_counter()
    idx.compact(spark)
    print(f"compact: {time.perf_counter() - t0:.1f}s")
    print(f"total pairs {total_pairs}; "
          f"index state {sum(os.path.getsize(os.path.join(r, f)) for r, _, fs in os.walk(idx.sigs_dir) for f in fs) / 1e6:.1f} MB sigs + "
          f"{sum(os.path.getsize(os.path.join(r, f)) for r, _, fs in os.walk(idx.bands_dir) for f in fs) / 1e6:.1f} MB bands")


if __name__ == "__main__":
    main()
