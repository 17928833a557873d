"""Semantic highlighting (Q7/Q8) — deterministic stub engine.

The reference calls a sentence-highlighting QA model
(`highlight/single/SemanticHighlighterEngine.java:87-160`,
batch variant `highlight/batch/processor/SemanticHighlightingProcessor.java`)
and wraps the returned spans in tags. The model is not available here;
the deterministic stand-in highlights every occurrence of any query
term. The Spark-side shape is identical either way: a column transform
applied to the fused top-k rows only (Spark batches natively, so the
reference's single/batch split collapses into one code path).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_PRE_TAG = "<em>"
DEFAULT_POST_TAG = "</em>"


def highlight_terms(
    text_col: Column,
    query_text: str,
    pre_tag: str = DEFAULT_PRE_TAG,
    post_tag: str = DEFAULT_POST_TAG,
) -> Column:
    terms = sorted({t for t in query_text.lower().split() if t}, key=len, reverse=True)
    pattern = r"\b(" + "|".join(re.escape(t) for t in terms) + r")\b"
    return F.regexp_replace(text_col, pattern, f"{pre_tag}$1{post_tag}")


def highlight_results(
    results: DataFrame,
    corpus: DataFrame,
    query_text: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    joined = results.join(corpus.select(id_col, text_col), id_col)
    return joined.select(
        id_col,
        "score",
        highlight_terms(F.col(text_col), query_text).alias("highlighted"),
    ).orderBy(F.col("score").desc(), F.col(id_col))
