"""Golden end-to-end: ingest (chunk + stub-embed) → search the ingested
corpus with text queries — the full loop with no stored embeddings
involved. Deterministic via the md5-based stub model (SURVEY.md §5
port strategy: goldens over a deterministic model)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neural_search_spark import models
from neural_search_spark.functions.vector import as_double, cosine, lit_vector
from neural_search_spark.operators.fusion import hybrid_fuse
from neural_search_spark.operators.retrieval import sparse_topk_postings
from neural_search_spark.functions.sparse import tf_postings
from neural_search_spark.sources.ingest import SemanticFieldConfig, ingest_pipeline

CORPUS = [
    (0, "spark streaming windows aggregate late data watermarks"),
    (1, "hash join broadcast shuffle partitions skew"),
    (2, "parquet columnar scan predicate pushdown row groups"),
    (3, "neural embeddings cosine similarity vector search"),
    (4, "the cat sat on the mat and purred quietly"),
    (5, "bm25 lexical scoring inverted index postings"),
    (6, "spark shuffle join broadcast skew salting adaptive"),
    (7, "chunking overlap tokens fixed length windows"),
]


@pytest.fixture(scope="module")
def ingested(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, body string")
    cfg = SemanticFieldConfig(raw_field="body", mode="dense")
    return ingest_pipeline(docs, [cfg]).persist()


def _dense_search(ingested, query_text, k=3):
    qv = models.embed_text_py(query_text, "QUERY")
    chunks = ingested.select(
        "doc_id", F.explode(F.col("body_semantic_info.chunks")).alias("c")
    )
    scored = chunks.select(
        "doc_id",
        cosine(as_double(F.col("c.embedding")), lit_vector(qv)).alias("score"),
    ).groupBy("doc_id").agg(F.max("score").alias("score"))
    return scored.orderBy(F.col("score").desc(), "doc_id").limit(k)


def test_e2e_dense_relevance_and_determinism(ingested):
    # query shares 3 tokens with docs 1 and 6 — they must lead
    hits = _dense_search(ingested, "broadcast join shuffle").collect()
    assert {hits[0]["doc_id"], hits[1]["doc_id"]} == {1, 6}
    again = _dense_search(ingested, "broadcast join shuffle").collect()
    assert [tuple(r) for r in hits] == [tuple(r) for r in again]


def test_e2e_hybrid_over_ingested_corpus(spark, ingested):
    docs = spark.createDataFrame(CORPUS, "doc_id long, body string")
    dense = _dense_search(ingested, "spark streaming windows", k=6)
    sparse = sparse_topk_postings(
        tf_postings(docs, text_col="body"),
        {"spark": 1.0, "streaming": 1.0, "windows": 1.0},
        k=6,
    )
    fused = hybrid_fuse([dense, sparse], "min_max", "arithmetic_mean", k=3).collect()
    assert fused[0]["doc_id"] == 0  # doc 0 matches both legs best
    assert fused[0]["score"] == pytest.approx(1.0)


def test_e2e_weights_count_validation(spark, ingested):
    dense = _dense_search(ingested, "spark", k=3)
    with pytest.raises(ValueError, match="number of weights"):
        hybrid_fuse([dense, dense], weights=[0.5, 0.3, 0.2], k=3).collect()
