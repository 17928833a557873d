"""Model-corpus ingest artifact (sources/index_store.py round-7):
non-stored-dim models persist their embedded corpus once per
(corpus, model, weights) and cold queries load parquet instead of
re-encoding — with a fingerprint key so a retrained checkpoint
invalidates instead of silently serving stale vectors."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from neural_search_spark import catalog, models
from neural_search_spark.sources import index_store as IS

SF = "/root/testdata/sf0.001"


def _build_count(spark, counter):
    docs = catalog.table(spark, SF, "documents")

    def _build():
        counter["n"] += 1
        return docs.withColumn(
            "embedding",
            models.dense_embed_model_udf("stub-dense", "PASSAGE")(F.col("text")),
        )

    return _build


def test_store_roundtrip_and_reuse(spark, tmp_path, monkeypatch):
    # point the warehouse at a temp dir so this test owns its artifacts
    monkeypatch.setattr(
        IS, "store_root", lambda sf_dir, fmt="v1": str(tmp_path / "store")
    )
    counter = {"n": 0}
    build = _build_count(spark, counter)
    n_docs = catalog.table(spark, SF, "documents").count()

    df1 = IS.load_or_build_model_corpus(
        spark, SF, "m1", "fp-a", 64, n_docs, build
    )
    rows1 = {r["doc_id"]: r["embedding"] for r in df1.select("doc_id", "embedding").collect()}
    assert counter["n"] == 1
    meta = json.load(open(tmp_path / "store" / "model_corpus" / "m1" / "_model_meta.json"))
    assert meta["fingerprint"] == "fp-a" and meta["doc_count"] == n_docs

    # second load: cache key matches → no rebuild, identical values
    df2 = IS.load_or_build_model_corpus(
        spark, SF, "m1", "fp-a", 64, n_docs, build
    )
    rows2 = {r["doc_id"]: r["embedding"] for r in df2.select("doc_id", "embedding").collect()}
    assert counter["n"] == 1
    assert rows1 == rows2


def test_store_invalidates_on_fingerprint_change(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(
        IS, "store_root", lambda sf_dir, fmt="v1": str(tmp_path / "store")
    )
    counter = {"n": 0}
    build = _build_count(spark, counter)
    n_docs = catalog.table(spark, SF, "documents").count()
    IS.load_or_build_model_corpus(spark, SF, "m1", "fp-a", 64, n_docs, build)
    # a "retrained checkpoint" (new fingerprint) must rebuild
    IS.load_or_build_model_corpus(spark, SF, "m1", "fp-b", 64, n_docs, build)
    assert counter["n"] == 2
    meta = json.load(open(tmp_path / "store" / "model_corpus" / "m1" / "_model_meta.json"))
    assert meta["fingerprint"] == "fp-b"


def test_store_failure_falls_back_to_inplan(spark, monkeypatch):
    monkeypatch.setattr(
        IS, "store_root",
        lambda sf_dir, fmt="v1": "/proc/definitely-not-writable/x",
    )
    counter = {"n": 0}
    build = _build_count(spark, counter)
    df = IS.load_or_build_model_corpus(spark, SF, "m1", "fp", 64, 500, build)
    # build_fn is LAZY: the failed write path may construct the frame
    # once before the exception, but nothing executes it — the fallback
    # is the only materialization and it comes back persisted (the
    # once-per-process bound the disk store otherwise provides)
    assert df.count() == 500 and counter["n"] <= 2
    assert df.is_cached
    df.unpersist()
