"""Batch (multi-query) retrieval — N queries answered in ONE job.

The reference serves one query per request; a Spark engine's natural
strength is the offline shape: score a whole query *table* against the
corpus in a single plan (training-data pipelines: hard-negative mining,
label propagation, eval-set scoring). This is the per-`query_id`
generalization of retrieval.py — every windowed/grouped operator keys
on (query_id, doc_id) instead of doc_id.

Scale shapes:
- dense: the query table is tiny relative to the corpus → broadcast it,
  one corpus scan scores ALL queries; per-query top-k is a window rank
  (per-partition partial ranks under AQE), not N separate jobs.
- sparse: inverted-index join — query postings ⋈ doc postings ON token
  → groupBy (query, doc). Work is proportional to matching postings,
  exactly like N single queries fused into one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import as_double, cosine


def batch_dense_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    id_col: str = "doc_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-query dense top-k: (query_id, doc_id, score), k rows per query."""
    q = queries.select(F.col(query_id), F.col(query_vec))
    scored = corpus.crossJoin(F.broadcast(q)).select(
        F.col(query_id),
        F.col(id_col),
        cosine(as_double(F.col(vec_col)), as_double(F.col(query_vec))).alias("score"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("score").desc(), F.col(id_col))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
        .orderBy(query_id, F.col("score").desc(), id_col)
    )


def batch_sparse_topk(
    query_postings: DataFrame,
    doc_postings: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-query sparse top-k via inverted-index join.

    query_postings: (query_id, token, qw); doc_postings: (doc_id,
    token, weight). One shuffle on token, one aggregation on
    (query, doc), one window rank."""
    joined = doc_postings.join(query_postings, "token")
    scored = joined.groupBy(query_id, id_col).agg(
        F.sum(F.col("weight") * F.col("qw")).alias("score")
    )
    w = Window.partitionBy(query_id).orderBy(F.col("score").desc(), F.col(id_col))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
        .orderBy(query_id, F.col("score").desc(), id_col)
    )


def sessionize(
    events: DataFrame,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Gaps-and-islands sessionization over an event stream.

    A new session starts when the gap since the user's previous event
    exceeds `gap_minutes`. Returns one row per session: (user_id,
    session_id, session_start, session_end, n_events). Window-function
    shape — one shuffle on user, linear in events, no iteration.
    """
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w_user = Window.partitionBy(user_col).orderBy(*order)
    gap_sec = gap_minutes * 60.0
    with_break = events.withColumn(
        "_new_session",
        F.when(
            F.col(ts_col).cast("double")
            - F.lag(F.col(ts_col).cast("double")).over(w_user)
            > gap_sec,
            1,
        )
        .otherwise(0)
        .cast("int"),
    ).withColumn(
        "_session_no",
        F.sum("_new_session").over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_break.groupBy(user_col, "_session_no")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .withColumnRenamed("_session_no", "session_id")
        .orderBy(user_col, "session_id")
    )
