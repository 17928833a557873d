"""Targeted per-query timing: min/median of K noop-sink executions in
one warmed process (guide §1.4 — noop computes every column, no
result-collection cost; §1.5 — jobs labelled).

Usage: python scripts/measure_query.py q1 [q2 ...] [--reps N] [--collect]
SF dir from $SPARK_GRAFT_SF_DIR (default sf0.1).
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neural_search_spark import registry  # noqa: E402
from neural_search_spark.session import get_spark  # noqa: E402


def main() -> None:
    argv = sys.argv[1:]
    if "--reps" in argv:
        i = argv.index("--reps")
        del argv[i:i + 2]  # drop the flag AND its value by position
    args = [a for a in argv if not a.startswith("--")]
    reps = 5
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    use_collect = "--collect" in sys.argv
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("measure")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "262144")
    spark.conf.set("spark.sql.files.openCostInBytes", "65536")
    for name in args:
        fn = registry.SPARK_QUERIES[name]
        spark.sparkContext.setJobDescription(f"warmup {name}")
        fn(spark, sf).collect()  # warmup incl. artifact builds
        ts = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.perf_counter()
            df = fn(spark, sf)
            if use_collect:
                df.collect()
            else:
                df.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        print(
            f"RESULT {name} min={min(ts):.3f} med={statistics.median(ts):.3f}"
            f" all={[round(t, 3) for t in ts]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
