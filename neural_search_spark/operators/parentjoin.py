"""Parent/child join-field family: `has_child`, `has_parent`,
`parent_id` queries and the `children` aggregation.

OpenSearch models parent/child with a join field: children are
SEPARATE documents in the same index, routed to the parent's shard so
the join never crosses shards (`join` datatype; Lucene's
ToParentBlockJoinQuery cousin for the runtime side). The Spark-first
equivalent of that routing is DENORMALIZATION at ingest: the child
frame carries the parent key (and any parent join/routing attributes)
in its own rows, so every query below is one groupBy or one
co-partitioned join — never a corpus-wide parent↔child shuffle chase.

In this engine the canonical child relation is the chunk frame
(documents → fixed-token chunks), the same parent/child shape the
reference's nested semantic-field mapping produces at ingest
(reference: `util/ProcessorDocumentUtils.java` nested chunk layout;
scoring parity with `query/NeuralKNNQueryBuilder` nested max handled
by retrieval.chunk_max_topk — these operators add the join-field
score_mode/min_children surface on top).

Scale notes: `has_child` is a single partial-aggregated groupBy over
MATCHING children only (the match filter prunes first); `has_parent`
joins the matching-parent frame onto the child frame on the parent
key — co-partition/bucket both by parent key at 100 TB and the join
is shuffle-free; `parent_id` is a pushdown filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCORE_MODES = {
    "max": F.max,
    "sum": F.sum,
    "avg": F.avg,
    "min": F.min,
}


def has_child_topk(
    child_scores: DataFrame,
    score_mode: str = "max",
    min_children: int = 1,
    max_children: int | None = None,
    k: int = 10,
    parent_col: str = "doc_id",
) -> DataFrame:
    """`has_child`: parents of matching children, scored by
    aggregating the child scores (score_mode none→constant handled by
    caller passing score 1.0 rows). `child_scores` must already be the
    MATCHING children only — (parent_col, score). One map-side-combined
    groupBy on the parent key, then TakeOrdered k."""
    if score_mode not in _SCORE_MODES:
        raise ValueError(f"unsupported score_mode: {score_mode}")
    agg = _SCORE_MODES[score_mode]
    g = child_scores.groupBy(parent_col).agg(
        agg("score").alias("score"), F.count("*").alias("_nc")
    )
    g = g.where(F.col("_nc") >= int(min_children))
    if max_children is not None:
        g = g.where(F.col("_nc") <= int(max_children))
    return (
        g.select(parent_col, "score")
        .orderBy(F.col("score").desc(), parent_col)
        .limit(k)
    )


def has_parent_children_topk(
    parent_scores: DataFrame,
    children: DataFrame,
    k: int = 10,
    parent_col: str = "doc_id",
    child_order: str = "chunk_idx",
    score: bool = True,
) -> DataFrame:
    """`has_parent`: children whose parent matches the parent query,
    each inheriting the parent's score (score=true; score=false →
    constant 1.0, OpenSearch's default). The child frame is the big
    side — the matching-parent frame joins INTO it on the parent key
    (bucket both by parent key at scale for a shuffle-free join), then
    TakeOrdered k children."""
    ps = parent_scores.select(
        parent_col,
        (F.col("score") if score else F.lit(1.0)).alias("_pscore"),
    )
    return (
        children.join(ps, parent_col)
        .select(
            parent_col,
            child_order,
            "chunk",
            F.col("_pscore").alias("score"),
        )
        .orderBy(F.col("score").desc(), parent_col, child_order)
        .limit(k)
    )


def parent_id_children(
    children: DataFrame,
    parent_id: int,
    parent_col: str = "doc_id",
    child_order: str = "chunk_idx",
) -> DataFrame:
    """`parent_id`: all children of one parent, constant score — a
    pushdown filter on the denormalized parent key (with the child
    frame partitioned by parent key this touches one partition)."""
    return (
        children.where(F.col(parent_col) == int(parent_id))
        .select(parent_col, child_order, "chunk", F.lit(1.0).alias("score"))
        .orderBy(child_order)
    )


def children_agg(
    children: DataFrame,
    bucket_col: str,
    child_len_col: str = "chunk",
) -> DataFrame:
    """`children` aggregation: bucket by a PARENT attribute (carried
    denormalized on the child rows — the join-field routing analogue),
    metrics over the child docs. One partial-aggregated groupBy; no
    parent↔child join at query time."""
    toks = F.split(F.trim(F.col(child_len_col)), r"\s+")
    return (
        children.groupBy(bucket_col)
        .agg(
            F.count("*").alias("doc_count"),
            F.round(F.avg(F.size(toks)), 4).alias("avg_child_tokens"),
        )
        .orderBy(bucket_col)
    )
