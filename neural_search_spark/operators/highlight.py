"""Semantic highlighting (Q7/Q8) — two fidelity tiers.

- `type: plain` tier — `highlight_terms` / `best_fragment`: every
  query-term occurrence tagged (Lucene plain highlighter).
- `type: semantic` tier — `semantic_highlight_results`: segment the
  field into sentences, score EVERY sentence against the query with a
  registered encoder (real checkpoint or stub — same registry), and
  tag the best-scoring sentence. This is the
  `highlight/single/SemanticHighlighterEngine.java:87-160` contract
  (model-predicted sentence spans; the batch variant
  `highlight/batch/processor/SemanticHighlightingProcessor.java`
  collapses into the same plan — Spark batches natively).

Both tiers transform the fused top-k rows only: the model UDF sees
k × sentences rows, never the corpus.
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


SENTENCE_SPLIT = r"(?<=[.!?])\s+"


def semantic_highlight_results(
    results: DataFrame,
    corpus: DataFrame,
    query_text: str,
    model_id: str = "stub-dense",
    window_tokens: int | None = None,
    pre_tag: str = DEFAULT_PRE_TAG,
    post_tag: str = DEFAULT_POST_TAG,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """`type: semantic` highlighting: per hit, the sentence whose
    encoder embedding is most similar to the query embedding is the
    highlighted span (`SemanticHighlighterEngine.java:87-160` —
    getHighlightedSentences: model scores each sentence, spans above
    the cut are tagged; argmax = the single-span contract).

    Segmentation: punctuation sentences by default; `window_tokens`
    switches to fixed token windows (the fallback for unpunctuated
    fields — OpenSearch's sentence iterator likewise degrades to the
    whole field there, which has no best-span signal).

    Plan: top-k rows → posexplode sentences (k × s rows) → ONE
    Arrow-batched encoder pass → window argmax per doc → tag. The
    query embedding is hoisted driver-side (encode_query), the model
    loads once per worker from its checkpoint. Returns
    (doc_id, score, span_idx, span, highlighted) where `highlighted`
    is the full field with the winning sentence tagged."""
    from pyspark.sql import Window

    from ..functions.vector import as_double, cosine, lit_vector
    from ..models import dense_embed_model_udf, encode_query

    if window_tokens is not None:
        from ..functions.chunking import chunk_fixed_token

        sentences = chunk_fixed_token(F.col(text_col), window_tokens, 0.0)
    else:
        sentences = F.split(F.col(text_col), SENTENCE_SPLIT)
    joined = results.select(id_col, "score").join(
        corpus.select(id_col, text_col), id_col
    )
    exploded = joined.select(
        id_col, "score", text_col,
        F.posexplode(sentences).alias("span_idx", "span"),
    ).where(F.col("span") != "")
    qv = encode_query(model_id, query_text, "QUERY")
    emb = dense_embed_model_udf(model_id, "PASSAGE")(F.col("span"))
    scored = exploded.withColumn(
        "span_sim", cosine(as_double(emb), lit_vector(qv))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("span_sim").desc(), F.col("span_idx")
    )
    best = scored.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") == 1
    )
    return best.select(
        id_col,
        "score",
        "span_idx",
        "span",
        F.replace(
            F.col(text_col), F.col("span"),
            F.concat(F.lit(pre_tag), F.col("span"), F.lit(post_tag)),
        ).alias("highlighted"),
    ).orderBy(F.col("score").desc(), F.col(id_col))


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
