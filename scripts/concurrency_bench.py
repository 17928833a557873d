"""Concurrent-query throughput: the Spark analogue of the reference's
dedicated hybrid-search executor pool.

The reference serves hybrid queries from its own thread pool —
``executors/HybridQueryExecutor.java:28-85``: 2×allocated processors
threads (min 2, max 1000), queue 1000 — so a node answers many
searches at once. On Spark the same property comes from the driver
side: ONE shared SparkSession, many request threads, each submitting
its job into a FAIR-scheduler pool. Executors interleave tasks from
all in-flight jobs, so a cluster that runs one query at 3%% utilization
serves dozens concurrently at the same latency.

This script measures it: a fixed task list (representative warm
queries × repetitions) executed by 1, 2, 4, 8, 16 request threads over
the same session, reporting wall time and QPS per level, plus a
result-stability check (the concurrent runs must return exactly the
sequential rows — flushes any thread-safety races in engine caches).

Usage:  python scripts/concurrency_bench.py [sf_dir]
Appends a summary suitable for SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402

# Warm, bounded queries spanning the serving surface: dense / sparse /
# hybrid / lexical retrieval, ANN, an aggregation, and a relational scan.
QUERIES = [
    "r1_neural_dense_topk",
    "r3_neural_sparse_exact",
    "r6_hybrid_minmax_arith",
    "bm25_match",
    "n4_rrf_fusion",
    "ann_ivf_topk",
    "dsl_agg_terms",
    "match_phrase",
]
REPS = 4  # task list = QUERIES × REPS, identical at every thread level
LEVELS = [1, 2, 4, 8, 16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("concurrency-bench")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from neural_search_spark import registry

    # warm: artifacts + one run of each plan shape (ingest-time work and
    # JIT, exactly like bench.py — a serving node queries a built index)
    registry._artifact_bundle(spark, sf_dir)
    baseline_rows: dict[str, list] = {}
    for name in QUERIES:
        baseline_rows[name] = sorted(
            map(tuple, registry.SPARK_QUERIES[name](spark, sf_dir).collect())
        )

    tasks = [n for n in QUERIES for _ in range(REPS)]

    def run_one(name: str):
        # FAIR pool per query family: a slow analytics job cannot
        # starve point lookups — the pool assignment is thread-local
        # (pinned-thread mode), the serving-path analogue of the
        # reference's dedicated executor queue
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", name)
        rows = registry.SPARK_QUERIES[name](spark, sf_dir).collect()
        return name, sorted(map(tuple, rows))

    print(f"concurrency bench @ {sf_dir}: {len(tasks)} tasks "
          f"({len(QUERIES)} queries × {REPS})")
    results = {}
    mismatches = 0
    for n in LEVELS:
        t0 = time.time()
        with ThreadPoolExecutor(max_workers=n) as pool:
            out = list(pool.map(run_one, tasks))
        dt = time.time() - t0
        for name, rows in out:
            if rows != baseline_rows[name]:
                mismatches += 1
                print(f"  MISMATCH under {n} threads: {name}")
        results[n] = dt
        print(f"  threads={n:2d}  wall={dt:6.1f}s  qps={len(tasks)/dt:5.2f}")

    seq = results[LEVELS[0]]
    best_n = min(results, key=results.get)
    print(
        f"summary: sequential {seq:.1f}s -> best {results[best_n]:.1f}s "
        f"at {best_n} threads ({seq / results[best_n]:.1f}x QPS), "
        f"result-stability mismatches: {mismatches}"
    )
    spark.stop()
    return 1 if mismatches else 0


if __name__ == "__main__":
    raise SystemExit(main())
