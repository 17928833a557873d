"""Bulk-ingest throughput: docs/s for the semantic-field ingest chain.

BASELINE.md sets the target — chunk + embed ingest at
> 50k docs/s/core for the stub-encoder path (pure columnar transforms
plus one Arrow UDF). The reference's equivalent is the batched ingest
processor chain (`processor/TextEmbeddingProcessor` via
`NeuralSearch.java:309-340`, batch size
`index.neural_search.semantic_ingest_batch_size`).

The sf0.1 corpus is 5k docs — far too small to amortize Spark's fixed
job cost, so the corpus is replicated row-wise (explode over a
replica range, doc_ids re-keyed) to millions of docs before timing.
Replication changes no per-doc work: every replica is chunked,
encoded, and written like an original. The timed section is the full
pipeline INCLUDING the parquet sink, i.e. what a cluster ingest job
does end to end.

Usage:  python scripts/ingest_throughput.py [sf_dir] [replicas]
Appends a summary line suitable for BASELINE.md / SCALING.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from neural_search_spark.session import get_spark  # noqa: E402
from neural_search_spark import catalog  # noqa: E402
from neural_search_spark.sources.ingest import (  # noqa: E402
    SemanticFieldConfig,
    ingest_pipeline,
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out_dir = "/tmp/ingest_throughput_out"

    spark = get_spark("ingest-throughput")
    spark.sparkContext.setLogLevel("ERROR")

    docs = catalog.table(spark, sf_dir, "documents")
    n_docs = docs.count() * replicas
    # row-wise replication DRIVEN BY a partitioned range × broadcast
    # docs cross join: the expansion happens executor-side in cpus×2
    # parallel tasks with NO wide exchange — the old shape (explode
    # over the 1-partition source scan, then repartition) generated
    # all N rows in one task and shuffled them, serializing the very
    # step the benchmark wants parallel
    # range with EXPLICIT slices: repartition() here would shuffle 200
    # tiny rows and AQE would coalesce that exchange to ONE partition,
    # silently serializing the whole expansion + encode + sink
    reps = spark.range(0, replicas, 1, cpus * 2).withColumnRenamed("id", "_r")
    corpus = (
        reps.crossJoin(F.broadcast(docs))
        .withColumn(
            "doc_id",
            F.col("doc_id").cast("long") * replicas + F.col("_r"),
        )
        .drop("_r")
        # second semantic field for the sparse config (one semantic
        # config per field, like the reference's field mappings)
        .withColumn("text_sparse", F.col("text"))
    )

    configs = [
        SemanticFieldConfig(
            raw_field="text",
            mode="dense",
            chunking="fixed_token",
            chunk_param=64,
        ),
        SemanticFieldConfig(
            raw_field="text_sparse",
            mode="sparse",
            prune="max_ratio",
            prune_param=0.4,
        ),
    ]

    # warm once at 1/20 size: JIT, codegen, Arrow path init — untimed
    small = corpus.where(F.col("doc_id") % 20 == 0)
    ingest_pipeline(small, configs).write.mode("overwrite").parquet(out_dir)

    t0 = time.time()
    ingest_pipeline(corpus, configs).write.mode("overwrite").parquet(out_dir)
    dt = time.time() - t0

    dps = n_docs / dt
    print(
        f"ingest throughput @ {sf_dir} x{replicas} = {n_docs:,} docs "
        f"(dense fixed_token-64 chunking + sparse max_ratio prune, "
        f"parquet sink): {dt:.1f}s -> {dps:,.0f} docs/s "
        f"({dps / cpus:,.0f} docs/s/core on {cpus} cores)"
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
