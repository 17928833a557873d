"""Local mirror of the driver's DuckDB-oracle comparison: run a Spark
query and its oracle SQL side-by-side, compare row count, column names,
and an order-insensitive value hash."""

from __future__ import annotations

import duckdb


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _canon(rows: list[dict]) -> list[tuple]:
    def norm(v):
        if isinstance(v, float):
            return round(v, 4)
        return v

    keys = sorted(rows[0].keys()) if rows else []
    return sorted(tuple(norm(r[k]) for k in keys) for r in rows)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> tuple[bool, str]:
    sdf = spark_df.toPandas()
    odf = run_oracle(oracle_sql, sf_dir)
    s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
    if s_cols != o_cols:
        return False, f"schema mismatch: spark={s_cols} oracle={o_cols}"
    # the driver's value-hash is dtype-sensitive (int64 vs float64 hash
    # differently even when numerically equal), so flag kind divergence
    _kind = lambda d: {"i": "n", "u": "n", "f": "n"}.get(d.kind, d.kind)
    for c in s_cols:
        ks, ko = sdf[c].dtype, odf[c].dtype
        if _kind(ks) == "n" and _kind(ko) == "n" and ks.kind != ko.kind:
            return False, f"dtype mismatch on {c}: spark={ks} oracle={ko}"
    if len(sdf) != len(odf):
        return False, f"row count mismatch: spark={len(sdf)} oracle={len(odf)}"
    s_rows = _canon(sdf.to_dict("records"))
    o_rows = _canon(odf.to_dict("records"))
    if s_rows != o_rows:
        diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:5]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, "ok"
