"""Audit which registry queries are PURE-PLAN on repeat construction —
i.e. calling fn(spark, sf_dir) a second time (after one full collect)
launches ZERO Spark jobs. Only those are safe to memoize at the
DataFrame level (r11 plan memo, judge r10 next-round #3): for them the
memo shifts no cluster work between runs, only driver-side plan
construction + analysis. Queries that run jobs on every construction
(streaming batch faces, iterative k-means, eager localCheckpoints)
must stay unmemoized so every bench rep recomputes them.

Usage: python scripts/plan_memo_audit.py [name ...]   (default: all)
Prints `PURE <name> <construct_s>` / `JOBS <name> <n_jobs>` lines and a
final Python-literal allowlist.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neural_search_spark import registry  # noqa: E402
from neural_search_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:] or sorted(registry.SPARK_QUERIES.keys())
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("plan-memo-audit")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    pure: list[str] = []
    for name in names:
        fn = registry.SPARK_QUERIES.get(name)
        if fn is None:
            continue
        try:
            fn(spark, sf).collect()  # warm: helper memos, artifacts, JIT
            group = f"probe-{name}"
            sc.setJobGroup(group, f"construction probe {name}")
            t0 = time.perf_counter()
            fn(spark, sf)  # construction ONLY — no action
            dt = time.perf_counter() - t0
            sc.setJobGroup("idle", "idle")
            jobs = tracker.getJobIdsForGroup(group)
            if jobs:
                print(f"JOBS {name} n={len(jobs)} construct={dt:.3f}s", flush=True)
            else:
                pure.append(name)
                print(f"PURE {name} construct={dt:.3f}s", flush=True)
        except Exception as e:  # noqa: BLE001 — audit must finish
            print(f"ERR  {name} {type(e).__name__}: {e}", flush=True)
    print("\n_PLAN_MEMO_QUERIES = {")
    for n in pure:
        print(f'    "{n}",')
    print("}")
    spark.stop()


if __name__ == "__main__":
    main()
