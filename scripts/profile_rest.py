"""Attribute one query execution's wall time to its Spark jobs via the
UI REST API (guide §7.1): after warmup, run the query once and print
every job with submission order, duration, stage count and task time.

Usage: python scripts/profile_rest.py q1 [q2 ...]
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from neural_search_spark import registry  # noqa: E402


def get_spark_ui():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.appName("profile-rest")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.sql.parquet.pushdown.inFilterThreshold", "1024")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )


def rest(port: int, path: str):
    url = f"http://localhost:{port}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    names = sys.argv[1:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark_ui()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "262144")
    spark.conf.set("spark.sql.files.openCostInBytes", "65536")
    sc = spark.sparkContext
    port = int(sc.uiWebUrl.rsplit(":", 1)[1])
    app_id = sc.applicationId
    for name in names:
        fn = registry.SPARK_QUERIES[name]
        sc.setJobGroup(f"warm-{name}", name)
        fn(spark, sf).collect()
        group = f"prof-{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        jobs = rest(port, f"applications/{app_id}/jobs")
        mine = [j for j in jobs if j.get("jobGroup") == group]
        mine.sort(key=lambda j: j["jobId"])
        print(f"\n=== {name}: {dt:.3f}s wall, {len(mine)} jobs ===")
        total_job = 0.0
        for j in mine:
            sub = j["submissionTime"]
            comp = j.get("completionTime")
            dur = "?"
            if comp:
                from datetime import datetime

                f = "%Y-%m-%dT%H:%M:%S.%f%Z"
                d = (
                    datetime.strptime(comp, f) - datetime.strptime(sub, f)
                ).total_seconds()
                dur = f"{d:.3f}"
                total_job += d
            print(
                f"  job {j['jobId']:>4} dur={dur:>7}s stages={len(j['stageIds'])}"
                f" tasks={j['numTasks']} {j.get('description', '')[:60]}"
            )
        print(f"  sum(job durations)={total_job:.3f}s vs wall {dt:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
