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
       python scripts/streaming_app_bench.py --sweep [total_docs]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

`--sweep` (judge r9 next-round #7): fixed TOTAL work (default 20k
docs), swept across micro-batch sizes — the back-pressure/latency
trade a deployment tunes: small batches bound per-doc latency but pay
the per-batch fixed cost (state reads, artifact writes, job
scheduling) more often; large batches amortize it until the
within-batch joins dominate. Prints per-size steady-state docs/s and
end-to-end wall; BASELINE.md records the knee.
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


def sweep() -> None:
    total = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import functions as F

    from neural_search_spark.session import get_spark
    from neural_search_spark.streaming.app import StreamingIngestApp

    spark = get_spark("streaming-app-sweep")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    copies = (total + n_docs - 1) // n_docs
    # pool of `total` monotone-id docs: per-copy token interleave keeps
    # shingle sets disjoint across copies; every 10th doc repeats its
    # copy-0 text verbatim so the cross-batch gate has real work at
    # every batch size
    pool = None
    for k in range(copies):
        c = docs.select(
            (F.col("doc_id") + F.lit(k * n_docs)).alias("doc_id"),
            F.when(F.col("doc_id") % 10 == 0, F.col("text"))
            .otherwise(
                F.regexp_replace(F.col("text"), " ", f" copy{k}tok ")
            )
            .alias("text"),
        )
        pool = c if pool is None else pool.unionByName(c)
    pool = pool.where(F.col("doc_id") < total).persist()
    pool.count()

    print(f"sweep: {total} total docs, batch sizes x steady-state rate")
    for batch_size in (1_000, 2_500, 5_000, 10_000):
        out = f"{OUT}_sweep_{batch_size}"
        if os.path.exists(out):
            shutil.rmtree(out)
        app = StreamingIngestApp(out + "/app")
        times = []
        t_all = time.perf_counter()
        for b in range(total // batch_size):
            lo, hi = b * batch_size, (b + 1) * batch_size
            t0 = time.perf_counter()
            app.apply_batch(
                pool.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), b
            )
            times.append(time.perf_counter() - t0)
        wall = time.perf_counter() - t_all
        steady = times[-1]
        print(
            f"batch_size {batch_size:6d}: {len(times)} batches, "
            f"steady {steady:6.1f}s/batch = {batch_size / steady:6.0f} docs/s, "
            f"end-to-end {wall:6.1f}s = {total / wall:6.0f} docs/s, "
            f"per-batch {' '.join(f'{t:.1f}' for t in times)}"
        )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--sweep":
        sweep()
    else:
        main()
