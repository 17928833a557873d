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


def percolate_batch_partitioned(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Spill path for a registered-query set TOO LARGE to broadcast
    (beyond ~10⁵–10⁶ queries the exploded (query_id, token, w) frame
    outgrows executor broadcast memory): the exploded query postings
    become a token-keyed INVERTED INDEX that is shuffle-joined against
    the batch postings on token — both sides hash-partition on the
    join key, so each task matches one token shard; no single executor
    ever holds the full query set. Identical output to
    `percolate_batch` (equivalence-tested); at steady state the query
    index is written bucketed by token so only the batch side shuffles.
    """
    post = tf_postings(docs, id_col=id_col, text_col=text_col)
    q = explode_queries(queries)
    return (
        post.join(q.hint("shuffle_hash"), "token")
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


def percolate_dense_batch(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Dense percolation: registered queries are embeddings; a doc
    matches when cosine ≥ the query's min_score (the `neural` R1
    scoring turned inside-out). `queries` = (query_id, qvec
    array<float>, min_score).

    Same inverted plan as the sparse variant: the query set broadcasts
    (a cross join against a bounded frame — O(batch × |queries|)
    narrow work, no shuffle of the batch), cosine stays JVM-side."""
    from ..functions.vector import as_double, cosine

    q = queries.select(
        "query_id", F.col("qvec").alias("__qv"), "min_score"
    )
    return (
        docs.select(id_col, vec_col)
        .crossJoin(F.broadcast(q))
        .withColumn("score", cosine(as_double(F.col(vec_col)), as_double(F.col("__qv"))))
        .where(F.col("score") >= F.col("min_score"))
        .select("query_id", id_col, "score")
    )
