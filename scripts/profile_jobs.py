"""Per-query job/stage census: after a warmup run, execute each query
once under a job group and report how many Spark JOBS (and stages) one
execution launches, plus wall time. Serial jobs are the local-mode
latency floor (driver loops, count()s, localCheckpoint materializations,
collect-based artifact builds) — guide §1 says find where the time goes
before touching anything.

Usage: python scripts/profile_jobs.py q1 [q2 ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neural_search_spark import registry  # noqa: E402
from neural_search_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "262144")
    spark.conf.set("spark.sql.files.openCostInBytes", "65536")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    for name in names:
        fn = registry.SPARK_QUERIES[name]
        sc.setJobGroup(f"warm-{name}", name)
        fn(spark, sf).collect()  # warmup (artifact builds, codegen)
        group = f"prof-{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        jobs = tracker.getJobIdsForGroup(group)
        n_stages = 0
        n_tasks = 0
        for j in jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for s in ji.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        print(
            f"PROF {name} sec={dt:.3f} jobs={len(jobs)}"
            f" stages={n_stages} tasks={n_tasks}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
