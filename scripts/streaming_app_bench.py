"""Throughput of the ONE-streaming-app production ingest
(streaming/app.py — curate → dedup-gate → embed → index; judge r8
next-round #4's BASELINE row).

Ingests B micro-batches of the sf0.1 documents table (fresh ids per
batch so arrival stays id-monotone; a fixed fraction of each batch
repeats batch-0 text verbatim so the dedup gate has real cross-batch
work) and prints per-batch wall seconds, docs/s, kept counts, and the
artifact footprint — the all-stages number to set next to the
dedup-gate-only figures in incremental_dedup_bench.py.

Usage: python scripts/streaming_app_bench.py [n_batches] [frac_dup]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/tmp/streaming_app_bench"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _du(path: str) -> float:
    return sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(path)
        for f in fs
    ) / 1e6


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    frac_dup = float(sys.argv[2]) if len(sys.argv) > 2 else 0.1

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import functions as F

    from neural_search_spark.session import get_spark
    from neural_search_spark.streaming.app import StreamingIngestApp

    spark = get_spark("streaming-app-bench")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    if os.path.exists(OUT):
        shutil.rmtree(OUT)
    app = StreamingIngestApp(OUT + "/app")

    print(f"corpus {n_docs} docs/batch x {n_batches} batches, "
          f"{frac_dup:.0%} verbatim repeats of batch 0")
    for b in range(n_batches):
        # non-repeat docs interleave a per-batch token between every
        # word, so their SHINGLE sets are disjoint from other batches
        # (a tail salt leaves Jaccard ≈ 0.95 — the gate then correctly
        # drops the entire batch as near-dups and the embed/index
        # stages idle; measured before this change)
        batch = docs.select(
            (F.col("doc_id") + F.lit(b * n_docs)).alias("doc_id"),
            F.when(
                (F.col("doc_id") % F.lit(int(1 / frac_dup))) == 0,
                F.col("text"),
            )
            .otherwise(
                F.regexp_replace(F.col("text"), " ", f" batch{b}tok ")
            )
            .alias("text"),
        )
        t0 = time.perf_counter()
        app.apply_batch(batch, b)
        dt = time.perf_counter() - t0
        kept_b = spark.read.parquet(f"{app.kept_dir}/batch={b}").count()
        print(f"batch {b}: {dt:6.1f}s  {n_docs / dt:8.0f} docs/s  "
              f"kept {kept_b}/{n_docs}")

    kept_total = app.kept(spark).count()
    n, avgdl = app.postings.stats(spark)
    vecs = app.vectors.vectors(spark).count()
    print(f"kept {kept_total} total; postings stats n={n} avgdl={avgdl:.1f}; "
          f"vector index {vecs} rows")
    print(f"artifacts: kept {_du(app.kept_dir):.1f} MB, "
          f"dedup {_du(app.dedup.base):.1f} MB, "
          f"postings {_du(app.postings.base):.1f} MB, "
          f"vectors {_du(app.vectors.base):.1f} MB")


if __name__ == "__main__":
    main()
