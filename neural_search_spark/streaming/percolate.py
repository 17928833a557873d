"""Percolator: reverse search — registered queries match incoming docs.

OpenSearch exposes this as the `percolate` query (queries are indexed,
documents are the probe); the reference plugin's sparse scoring
semantics (`query/NeuralSparseQueryBuilder.java:569-590` — linear
token-weight disjunction) define the match score here. The engine
inverts the usual plan: the QUERY SET is the small broadcast side and
the DOCUMENT BATCH is the scanned side.

Scale shape: thousands of registered queries explode to a
(query_id, token, weight) frame that stays broadcast-size; each
incoming batch tokenizes to tf postings (narrow map + explode), the
match is one broadcast-hash join on token plus a partial-aggregated
groupBy (query_id, doc_id) — no corpus-sized shuffle, per-batch cost
linear in batch tokens. Continuous operation is `foreachBatch` over
any stream source; matches are append-only and idempotent per batch
(pure function of batch content), so replay is safe.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.sparse import tf_postings


def explode_queries(queries: DataFrame) -> DataFrame:
    """(query_id, tokens map<string,float>, min_score) →
    (query_id, token, w, min_score) — the broadcastable match frame."""
    return queries.select(
        "query_id",
        F.explode("tokens").alias("token", "w"),
        "min_score",
    )


def percolate_batch(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Match every document against every registered query: returns
    (query_id, doc_id, score) for pairs with score ≥ the query's
    min_score. Score = Σ_t tf_doc(t)·w_query(t) (sparse linear
    disjunction — identical semantics to `neural_sparse` R3)."""
    post = tf_postings(docs, id_col=id_col, text_col=text_col)
    q = explode_queries(queries)
    return (
        post.join(F.broadcast(q), "token")
        .groupBy("query_id", id_col)
        .agg(
            F.sum(F.col("weight") * F.col("w")).alias("score"),
            F.first("min_score").alias("_ms"),
        )
        .where(F.col("score") >= F.col("_ms"))
        .select("query_id", id_col, "score")
    )


def percolate_stream(
    stream_docs: DataFrame,
    queries: DataFrame,
    on_matches: Callable[[DataFrame, int], None],
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Continuous percolation: apply `percolate_batch` to each
    micro-batch and hand the match frame to `on_matches(matches,
    batch_id)` (alert sink, match log table, …). Returns the started
    StreamingQuery."""

    def _each(batch: DataFrame, batch_id: int) -> None:
        on_matches(percolate_batch(batch, queries, id_col, text_col), batch_id)

    return (
        stream_docs.writeStream.foreachBatch(_each)
        .option("checkpointLocation", checkpoint)
        .start()
    )
