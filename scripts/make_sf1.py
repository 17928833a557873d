"""Build an sf1-equivalent (10× sf0.1) dataset at /tmp/sf1x by
structured replication with key offsets — 6M lineitem / 1.5M orders /
1M events / 50k docs — so SCALING.md can show a 1000× range
(sf0.001 → sf1x) instead of 100×.

Replication preserves every FK the queries join on (orders↔lineitem,
customer, part, supplier → each copy i gets key + i·OFFSET on both
sides). Dimensions nation/region stay fixed, like real scale-up.
Events keep the same one-month window (10× denser traffic) with
disjoint user populations per copy; documents/embeddings duplicate
content with fresh ids — which also makes sf1x a dedup stress test
(every text becomes a 10-clique of exact duplicates).

Usage: python scripts/make_sf1.py [copies] [outdir]
"""
from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OFF = {
    "orderkey": 10_000_000,
    "custkey": 1_000_000,
    "partkey": 1_000_000,
    "suppkey": 100_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 1_000_000,
}


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1x"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    rep = f"CROSS JOIN range({copies}) t(i)"

    def copy(name: str, select: str, row_group: int = 1_000_000) -> None:
        con.execute(
            f"COPY ({select}) TO '{out}/{name}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE {row_group})"
        )
        n = con.execute(f"SELECT count(*) FROM '{out}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    copy("lineitem", f"""
      SELECT l_orderkey + i*{OFF['orderkey']} AS l_orderkey,
             l_partkey + i*{OFF['partkey']} AS l_partkey,
             l_suppkey + i*{OFF['suppkey']} AS l_suppkey,
             l_linenumber, l_quantity, l_extendedprice, l_discount,
             l_tax, l_returnflag, l_linestatus, l_shipdate
      FROM '{SRC}/lineitem.parquet' {rep}""")
    copy("orders", f"""
      SELECT o_orderkey + i*{OFF['orderkey']} AS o_orderkey,
             o_custkey + i*{OFF['custkey']} AS o_custkey,
             o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM '{SRC}/orders.parquet' {rep}""")
    copy("customer", f"""
      SELECT c_custkey + i*{OFF['custkey']} AS c_custkey,
             c_name, c_nationkey, c_acctbal, c_mktsegment
      FROM '{SRC}/customer.parquet' {rep}""")
    copy("part", f"""
      SELECT p_partkey + i*{OFF['partkey']} AS p_partkey,
             p_name, p_brand, p_type, p_size, p_retailprice
      FROM '{SRC}/part.parquet' {rep}""")
    copy("supplier", f"""
      SELECT s_suppkey + i*{OFF['suppkey']} AS s_suppkey,
             s_name, s_nationkey, s_acctbal
      FROM '{SRC}/supplier.parquet' {rep}""")
    for dim in ("nation", "region"):
        copy(dim, f"SELECT * FROM '{SRC}/{dim}.parquet'")
    copy("events", f"""
      SELECT event_id + i*{OFF['event_id']} AS event_id, ts,
             user_id + i*{OFF['user_id']} AS user_id,
             event_type, value, props
      FROM '{SRC}/events.parquet' {rep}""")
    copy("documents", f"""
      SELECT doc_id + i*{OFF['doc_id']} AS doc_id, text, lang, source, n_chars
      FROM '{SRC}/documents.parquet' {rep}""", row_group=100_000)
    copy("embeddings", f"""
      SELECT vec_id + i*{OFF['doc_id']} AS vec_id, embedding, label
      FROM '{SRC}/embeddings.parquet' {rep}""", row_group=100_000)


if __name__ == "__main__":
    main()
