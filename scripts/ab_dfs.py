"""Interleaved A/B for the term-dictionary (dfs) artifact: variant A =
index.dfs broadcast join (r10 batch 3), variant B = the inline per-query
df aggregation (pre-change), alternated rep by rep in ONE warmed process
so box drift hits both variants equally (method note, OPTIMIZATION_r10).

Usage: python scripts/ab_dfs.py q1 [q2 ...] [--reps N]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import neural_search_spark.operators.bm25 as B  # noqa: E402
from neural_search_spark import registry  # noqa: E402
from neural_search_spark.session import get_spark  # noqa: E402

_ORIG_SCORES = B.bm25_scores


def _scores_nodfs(index, *a, **kw):
    stripped = B.BM25Index(
        postings=index.postings,
        doclen=index.doclen,
        stats=index.stats,
        analyzer=index.analyzer,
        dfs=None,
    )
    return _ORIG_SCORES(stripped, *a, **kw)


def main() -> None:
    argv = sys.argv[1:]
    if "--reps" in argv:
        i = argv.index("--reps")
        del argv[i:i + 2]  # drop the flag AND its value by position
    args = [a for a in argv if not a.startswith("--")]
    reps = 6
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-dfs")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "262144")
    spark.conf.set("spark.sql.files.openCostInBytes", "65536")
    for name in args:
        fn = registry.SPARK_QUERIES[name]
        # warm both variants (codegen, artifact builds)
        for variant in (_ORIG_SCORES, _scores_nodfs):
            B.bm25_scores = variant
            spark.sparkContext.setJobDescription(f"warm {name}")
            fn(spark, sf).collect()
        ts = {"dfs": [], "inline": []}
        for i in range(reps):
            for label, variant in (("dfs", _ORIG_SCORES), ("inline", _scores_nodfs)):
                B.bm25_scores = variant
                spark.sparkContext.setJobDescription(f"{name} {label} rep{i}")
                t0 = time.perf_counter()
                fn(spark, sf).write.format("noop").mode("overwrite").save()
                ts[label].append(time.perf_counter() - t0)
        B.bm25_scores = _ORIG_SCORES
        print(
            f"AB {name} dfs med={statistics.median(ts['dfs']):.3f}"
            f" min={min(ts['dfs']):.3f} | inline"
            f" med={statistics.median(ts['inline']):.3f}"
            f" min={min(ts['inline']):.3f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
