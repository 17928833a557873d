"""Ingest pipeline, stub models, streaming, multimodal plumbing."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from neural_search_spark import models
from neural_search_spark.operators import multimodal as MM
from neural_search_spark.sources.ingest import SemanticFieldConfig, ingest_transform
from neural_search_spark.streaming.ingest import streaming_ingest, windowed_event_counts


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark join window batch stream"),
            (2, "the quick brown fox jumps over the lazy dog again and again"),
            (3, "alpha beta gamma"),
        ],
        "doc_id long, body string",
    )


def test_dense_embed_deterministic(spark):
    df = _docs(spark).withColumn("emb", models.dense_embed_udf()(F.col("body")))
    rows1 = {r["doc_id"]: r["emb"] for r in df.collect()}
    rows2 = {r["doc_id"]: r["emb"] for r in df.collect()}
    assert rows1 == rows2
    assert all(len(v) == models.DIM for v in rows1.values())
    # unit norm
    n = sum(x * x for x in rows1[1])
    assert abs(n - 1.0) < 1e-5
    # driver-side embedding matches the UDF path (inference hoisting)
    assert rows1[3] == pytest.approx(models.embed_text_py("alpha beta gamma"), abs=1e-6)


def test_query_passage_asymmetry(spark):
    q = models.embed_text_py("spark join", "QUERY")
    p = models.embed_text_py("spark join", "PASSAGE")
    assert q != p  # asymmetric model wraps inputs differently


def test_sparse_encode_positive_weights(spark):
    df = _docs(spark).withColumn("sv", models.sparse_encode_udf()(F.col("body")))
    for r in df.collect():
        assert len(r["sv"]) > 0
        assert all(w > 0 for w in r["sv"].values())


def test_ingest_dense_with_chunking(spark):
    cfg = SemanticFieldConfig(
        raw_field="body", mode="dense", chunking="fixed_token", chunk_param=4
    )
    out = ingest_transform(_docs(spark), cfg)
    rows = {r["doc_id"]: r["body_semantic_info"] for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    # doc 2 has 12 tokens → 3 chunks of 4
    chunks = rows[2]["chunks"]
    assert len(chunks) == 3
    assert chunks[0]["text"] == "the quick brown fox"
    assert len(chunks[0]["embedding"]) == models.DIM


def test_ingest_sparse_with_prune(spark):
    cfg = SemanticFieldConfig(raw_field="body", mode="sparse", prune="top_k", prune_param=2)
    out = ingest_transform(_docs(spark), cfg)
    row = {r["doc_id"]: r for r in out.collect()}[2]
    emb = row["body_semantic_info"]["chunks"][0]["embedding"]
    assert len(emb) == 2  # top-2 pruned


def test_ingest_sparse_lambda_prune_modes(spark):
    """Regression: map_filter-based prune modes (max_ratio / abs_value /
    alpha_mass) put their input inside a higher-order lambda — applying
    them directly around the encode UDF fails analysis
    (LAMBDA_FUNCTION_WITH_PYTHON_UDF), so ingest must project the raw
    map to an attribute first. Each mode must execute AND match the
    standalone prune function applied to the unpruned ingest output."""
    from neural_search_spark.functions import prune as PR

    docs = _docs(spark)
    raw_cfg = SemanticFieldConfig(raw_field="body", mode="sparse")
    raw = {
        r["doc_id"]: dict(r["body_semantic_info"]["chunks"][0]["embedding"])
        for r in ingest_transform(docs, raw_cfg).collect()
    }

    def reference_prune(m, fn, param):
        df = spark.createDataFrame(
            [(dict(m),)], "m map<string,double>"
        ).select(fn(F.col("m"), param).alias("p"))
        return {k: round(v, 5) for k, v in df.collect()[0]["p"].items()}

    for mode, fn, param in [
        ("max_ratio", PR.prune_max_ratio, 0.4),
        ("abs_value", PR.prune_abs_value, 0.2),
        ("alpha_mass", PR.prune_alpha_mass, 0.8),
    ]:
        cfg = SemanticFieldConfig(
            raw_field="body", mode="sparse", prune=mode, prune_param=param
        )
        got = {
            r["doc_id"]: {
                k: round(v, 5)
                for k, v in r["body_semantic_info"]["chunks"][0]["embedding"].items()
            }
            for r in ingest_transform(docs, cfg).collect()
        }
        for doc_id, m in raw.items():
            assert got[doc_id] == reference_prune(m, fn, param), (mode, doc_id)


def test_skip_existing_reuses_stored_embeddings(spark):
    cfg = SemanticFieldConfig(raw_field="body", mode="dense", skip_existing=True)
    # previous snapshot with a SENTINEL embedding for doc 1 proves the
    # reuse path copies instead of recomputing
    sentinel = [42.0] * models.DIM
    prev = spark.createDataFrame(
        [(1, "spark join window batch stream", ([("spark join window batch stream", sentinel)],))],
        "doc_id long, body string, body_semantic_info struct<chunks: array<struct<text string, embedding array<float>>>>",
    )
    new = spark.createDataFrame(
        [
            (1, "spark join window batch stream"),  # unchanged → reuse
            (2, "totally new text"),  # new → infer
        ],
        "doc_id long, body string",
    )
    out = {r["doc_id"]: r["body_semantic_info"] for r in ingest_transform(new, cfg, previous=prev).collect()}
    assert out[1]["chunks"][0]["embedding"][0] == 42.0  # copied, not re-inferred
    assert abs(sum(x * x for x in out[2]["chunks"][0]["embedding"]) - 1.0) < 1e-5


def test_streaming_ingest_foreachbatch(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    _docs(spark).write.parquet(src)
    collected = []

    def sink(df, batch_id):
        collected.extend(df.collect())

    cfg = SemanticFieldConfig(raw_field="body", mode="dense")
    stream = spark.readStream.schema("doc_id long, body string").parquet(src)
    q = streaming_ingest(stream, cfg, sink=sink, checkpoint=str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    assert {r["doc_id"] for r in collected} == {1, 2, 3}
    assert all(len(r["body_semantic_info"]["chunks"]) >= 1 for r in collected)


def test_windowed_event_counts_batch_and_stream_shape(spark, sf_dir):
    from neural_search_spark import catalog

    ev = catalog.table(spark, sf_dir, "events")
    out = windowed_event_counts(ev)
    rows = out.collect()
    assert len(rows) > 0
    assert {"window_start", "event_type", "cnt", "avg_value"} <= set(out.columns)


def test_multimodal_decode_and_frames(spark):
    media = MM.media_table_from_text(_docs(spark).withColumnRenamed("body", "text"))
    meta = {r["doc_id"]: r for r in MM.decode_media_batch(media).collect()}
    assert meta[1]["byte_len"] == len("spark join window batch stream")
    assert 64 <= meta[1]["width"] < 256 and 64 <= meta[1]["height"] < 256
    import hashlib

    assert meta[1]["content_md5"] == hashlib.md5(b"spark join window batch stream").hexdigest()
    frames = MM.frame_sample(media, n_frames=4).collect()
    assert len(frames) == 12  # 3 docs × 4 frames


def test_text_image_embed(spark):
    df = _docs(spark).withColumn("img", F.encode(F.col("body"), "utf-8"))
    out = df.withColumn("emb", models.text_image_embed_udf()(F.col("body"), F.col("img")))
    r = out.collect()[0]
    assert len(r["emb"]) == models.DIM
