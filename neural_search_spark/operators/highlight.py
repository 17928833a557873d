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


def best_fragment(
    text_col: Column,
    query_text: str,
    fragment_size: int = 100,
    pre_tag: str = DEFAULT_PRE_TAG,
    post_tag: str = DEFAULT_POST_TAG,
) -> Column:
    """OpenSearch-style fragmenting: a `fragment_size`-char window
    anchored at the FIRST query-term occurrence (Lucene's simple
    fragmenter heuristic), term-highlighted. Docs with no match yield
    the head of the text (the reference's no-match fragment). Pure
    string expressions — runs on the top-k rows only."""
    terms = sorted({t for t in query_text.lower().split() if t}, key=len, reverse=True)
    pattern = "(" + "|".join(re.escape(t) for t in terms) + ")"
    # 1-based position of the first match; 0 = no match
    pos = F.coalesce(
        F.expr(f"regexp_instr(lower({'__hl_text'}), '{pattern}')"), F.lit(0)
    )
    start = F.greatest(pos - F.lit(fragment_size // 4), F.lit(1))
    frag = F.col("__hl_text").substr(start, F.lit(fragment_size))
    return highlight_terms(frag, query_text, pre_tag, post_tag)


def highlight_results(
    results: DataFrame,
    corpus: DataFrame,
    query_text: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    fragment_size: int | None = None,
) -> DataFrame:
    """`fragment_size` switches from whole-field highlighting to the
    windowed fragment around the first match."""
    joined = results.join(corpus.select(id_col, text_col), id_col)
    if fragment_size is not None:
        joined = joined.withColumn("__hl_text", F.col(text_col))
        hl = best_fragment(F.col(text_col), query_text, fragment_size)
    else:
        hl = highlight_terms(F.col(text_col), query_text)
    return joined.select(
        id_col,
        "score",
        hl.alias("highlighted"),
    ).orderBy(F.col("score").desc(), F.col(id_col))
