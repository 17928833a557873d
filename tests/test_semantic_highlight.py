"""`type: semantic` highlight tier (VERDICT r3 item 6): sentence
segmentation + encoder-scored best span, the
`SemanticHighlighterEngine.java:87-160` contract — golden-tested on a
punctuated micro-corpus where the best sentence is knowable, plus the
UDF-budget and model-swap properties."""

from __future__ import annotations

import pytest

from neural_search_spark import models
from neural_search_spark.operators import highlight as H
from neural_search_spark.registry import REAL_MODEL_ID


@pytest.fixture(scope="module")
def micro(spark):
    rows = [
        (0, "the cat sat on a mat. spark joins shuffle data fast. birds sing."),
        (1, "rain falls today. the window waits. spark join window stream code."),
        (2, "nothing relevant here. totally off topic words. llamas eat grass."),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def hits(spark, micro):
    from pyspark.sql import functions as F

    return micro.select("doc_id", F.lit(1.0).alias("score"))


def test_best_sentence_wins(spark, micro, hits):
    out = H.semantic_highlight_results(
        hits, micro, "spark join window stream", model_id=REAL_MODEL_ID
    )
    spans = {r["doc_id"]: r["span"] for r in out.collect()}
    # the sentence sharing the most query tokens must win per doc
    assert spans[0] == "spark joins shuffle data fast."
    assert spans[1] == "spark join window stream code."
    # doc 2 has no overlap — SOME sentence still returns (argmax is
    # total), deterministically the highest-cosine one
    assert spans[2] in {
        "nothing relevant here.",
        "totally off topic words.",
        "llamas eat grass.",
    }


def test_tags_wrap_the_winning_sentence(spark, micro, hits):
    out = H.semantic_highlight_results(
        hits, micro, "spark join window stream", model_id=REAL_MODEL_ID
    )
    row = {r["doc_id"]: r for r in out.collect()}[1]
    assert "<em>spark join window stream code.</em>" in row["highlighted"]
    # the rest of the field is intact
    assert row["highlighted"].startswith("rain falls today.")


def test_plain_tier_survives(spark, micro, hits):
    out = H.highlight_results(hits, micro, "spark window")
    hl = {r["doc_id"]: r["highlighted"] for r in out.collect()}
    assert "<em>spark</em>" in hl[0]
    assert "<em>window</em>" in hl[1]


def test_model_swap_is_a_registration(spark, micro, hits):
    """Swapping the encoder changes ONLY the registry entry — the
    highlight plan is unchanged (the reference's model_id knob)."""
    class _FirstSentenceModel:
        def encode(self, texts, content_type="PASSAGE"):
            import numpy as np

            # scores every span identically except a marker dim — all
            # spans tie, so span_idx tie-break selects the FIRST
            return np.tile(
                np.eye(1, 8, 0, dtype=np.float64), (len(texts), 1)
            )

    models.register_model("first-sentence", _FirstSentenceModel, dim=8)
    try:
        out = H.semantic_highlight_results(
            hits, micro, "anything", model_id="first-sentence"
        )
        spans = {r["doc_id"]: r["span_idx"] for r in out.collect()}
        assert spans == {0: 0, 1: 0, 2: 0}
    finally:
        models.MODEL_REGISTRY.pop("first-sentence", None)


def test_scorer_input_is_topk_only(spark, micro, hits):
    """The encoder UDF input is k × sentences rows — the join below
    the Arrow eval is against the (broadcastable) hit list, never an
    unrestricted corpus scan."""
    import io
    from contextlib import redirect_stdout

    out = H.semantic_highlight_results(
        hits.limit(2), micro, "spark", model_id=REAL_MODEL_ID
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    assert "ArrowEvalPython" in buf.getvalue()
