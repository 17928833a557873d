"""Compare pandas dtypes of each Spark query result vs its DuckDB oracle
result at sf0.001 (fast). The driver's value-hash is computed on the
materialized frames, so a bigint-vs-float64 divergence can hash-mismatch
even when values are numerically equal."""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry
from tests.oracle_check import run_oracle
from neural_search_spark.session import get_spark


def kind(dtype) -> str:
    k = dtype.kind  # i/u int, f float, O object, b bool, M datetime
    return {"i": "int", "u": "int", "f": "float", "O": "obj", "b": "bool", "M": "ts"}.get(k, k)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    qs = entry.queries()
    oracles = entry.oracle_sql()
    bad = 0
    for name, sql in oracles.items():
        try:
            sdf = qs[name](spark, sf_dir).limit(50).toPandas()
            odf = run_oracle(sql + " LIMIT 50" if "limit" not in sql.lower() else sql, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:160]}")
            bad += 1
            continue
        diffs = []
        for c in sorted(set(sdf.columns) & set(odf.columns)):
            ks, ko = kind(sdf[c].dtype), kind(odf[c].dtype)
            if ks != ko:
                diffs.append(f"{c}: spark={sdf[c].dtype}({ks}) oracle={odf[c].dtype}({ko})")
        if diffs:
            bad += 1
            print(f"DIFF {name}: " + "; ".join(diffs))
    print(f"\n{bad} queries with dtype divergence out of {len(oracles)}")


if __name__ == "__main__":
    main()
