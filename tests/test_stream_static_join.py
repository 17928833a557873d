"""Stream-static enrichment join: a document stream enriched against a
static dimension table inside foreachBatch — the standard shape for
joining streaming ingest with reference data (model configs, per-source
quality thresholds) at scale."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_stream_enriched_with_static_dim(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    docs.write.parquet(src)
    # static dim: per-source boost factor
    dim = spark.createDataFrame(
        [(f"src{i}", 1.0 + i / 10.0) for i in range(20)], "source string, boost double"
    )
    got = []

    def sink(batch, bid):
        enriched = batch.join(F.broadcast(dim), "source", "left").withColumn(
            "weighted_len", F.col("n_chars") * F.coalesce(F.col("boost"), F.lit(1.0))
        )
        got.extend(enriched.collect())

    q = (
        spark.readStream.schema(docs.schema)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert len(got) == 30
    by_id = {r["doc_id"]: r for r in got}
    for r in got:
        assert r["weighted_len"] > 0
        if r["boost"] is not None:
            assert abs(r["weighted_len"] - r["n_chars"] * r["boost"]) < 1e-9
