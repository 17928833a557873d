"""Throughput of the curation gate stack at 1M docs — the streaming
ingest question: how many docs/s does the stateless gate pipeline
(C4 line cleaning + Gopher structural rules + repetition kernel)
sustain on local[32]?

The corpus is sf0.1's documents replicated with fresh doc_ids (text
content is irrelevant to gate COST — every doc pays tokenize +
line-split + n-gram factorization regardless of verdicts). Soft-dedup
is excluded: on a 200x-replicated corpus every doc is an exact dup,
which measures the CC operator's pathology, not gate throughput (the
dedup family has its own scaled evidence in SCALING.md).

Usage: python scripts/curation_throughput.py [n_docs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1/documents.parquet"
OUT = "/tmp/curation_1m.parquet"


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import functions as F

    from neural_search_spark.registry import (
        c4_quality_frame,
        gopher_quality_frame,
        gopher_repetition_frame,
    )
    from neural_search_spark.session import get_spark

    spark = get_spark("curation-throughput")
    if not os.path.exists(OUT):
        base = spark.read.parquet(SRC).select("doc_id", "text")
        n_base = base.count()
        reps = (n_docs + n_base - 1) // n_base
        rep = spark.range(reps).crossJoin(base).select(
            (F.col("id") * n_base + F.col("doc_id")).alias("doc_id"), "text"
        ).where(F.col("doc_id") < n_docs)
        rep.repartition(32).write.parquet(OUT)
    docs = spark.read.parquet(OUT)
    n = docs.count()
    print(f"corpus: {n} docs")

    stages = {
        "c4": lambda d: c4_quality_frame(d, ordered=False),
        "gopher": lambda d: gopher_quality_frame(d, ordered=False),
        "repetition": lambda d: gopher_repetition_frame(d, ordered=False),
        "all_joined": lambda d: (
            gopher_quality_frame(d, ordered=False)
            .select("doc_id", "keep_gopher")
            .join(
                gopher_repetition_frame(d, ordered=False)
                .select("doc_id", "rep_keep"),
                "doc_id",
            )
            .join(
                c4_quality_frame(d, ordered=False).select("doc_id", "keep_c4"),
                "doc_id",
            )
        ),
    }
    for name, fn in stages.items():
        best = float("inf")
        fn(docs).count()  # warm
        for _ in range(2):
            t0 = time.perf_counter()
            fn(docs).count()
            best = min(best, time.perf_counter() - t0)
        print(f"{name:12s} {best:6.1f}s  {n / best:,.0f} docs/s")


if __name__ == "__main__":
    main()
