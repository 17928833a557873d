"""Sharded JSONL export + read-back manifest (sources/export.py)."""

from __future__ import annotations

from neural_search_spark.sources.export import export_manifest, write_jsonl_shards


def test_shard_bound_and_manifest_roundtrip(spark, tmp_path):
    df = spark.range(250).selectExpr("id AS doc_id", "concat('t', id) AS text")
    out = str(tmp_path / "export")
    write_jsonl_shards(df, out, max_rows_per_shard=60, shards=2)
    m = export_manifest(spark, out).collect()
    assert sum(r["n_rows"] for r in m) == 250
    assert all(r["n_rows"] <= 60 for r in m)
    assert all(r["n_bytes"] > 0 for r in m)
    # shard count: 2 partitions × ceil(125/60) files each = 6
    assert len(m) == 6
    # content round-trips
    back = spark.read.json(out)
    assert back.count() == 250
    assert {r["doc_id"] for r in back.collect()} == set(range(250))
