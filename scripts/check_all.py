"""Mirror the driver's CORRECTNESS run: execute every queries() entry at
sf0.01, compare against oracle_sql() via tests/oracle_check.compare, and
print per-query wall time so slow queries (driver-timeout candidates)
are visible.

Usage: python scripts/check_all.py [sf_dir] [only_query ...]
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry
from tests.oracle_check import compare
from neural_search_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark()
    qs = entry.queries()
    oracles = entry.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                ok, msg = compare(df, oracles[name], sf_dir)
            else:
                n = df.count()
                ok, msg = n >= 0, f"rows-only: {n} rows"
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION: {type(e).__name__}: {e}"
        dt = time.time() - t0
        results[name] = {"ok": ok, "msg": msg, "sec": round(dt, 2)}
        print(f"{'PASS' if ok else 'FAIL':4} {dt:7.2f}s {name}  {'' if ok else msg[:300]}", flush=True)
    n_fail = sum(1 for r in results.values() if not r["ok"])
    total = sum(r["sec"] for r in results.values())
    print(f"\n{len(results)} queries, {n_fail} fail, {total:.1f}s total")
    with open("/tmp/check_all.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
