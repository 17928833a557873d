"""The `_bulk` API's document lifecycle as a snapshot merge job.

The reference rides OpenSearch core's bulk machinery (its processors
run inside bulk ingest, `processor/InferenceProcessor.java:190-246`
`subBatchExecute` batches); the engine-side semantics a switching user
needs are the four ops over an index snapshot:

  index   — add or fully replace the doc
  create  — add only if the id is absent
  update  — partial doc: non-null fields overwrite, others keep
  delete  — remove the doc

Spark shape: ONE anti-join + union pass over the snapshot (the
copy-on-write merge every parquet/Delta lake table does for upserts).
Multiple ops on the same id resolve by LAST-wins in `seq` order (the
bulk request's line order), decided on the tiny ops frame first —
ops ≪ snapshot, so every join against ops is broadcastable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BULK_OPS = ("index", "create", "update", "delete")


def bulk_apply(
    snapshot: DataFrame, ops: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """New snapshot after applying `ops` (op string, seq long, id, +
    the snapshot's doc columns, null = "not provided" for update).

    Exactly-one effective op per id (max `seq`); the result is
    column-compatible with `snapshot`.
    """
    doc_cols = [c for c in snapshot.columns if c != id_col]
    bad = ops.where(~F.col("op").isin(*BULK_OPS))
    # fail fast driver-side on malformed ops (tiny frame)
    n_bad = bad.limit(1).count()
    if n_bad:
        raise ValueError(f"unknown bulk op: {bad.first()['op']!r}")

    w = Window.partitionBy(id_col).orderBy(F.col("seq").desc())
    last = (
        ops.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "seq")
    )

    # ids whose snapshot row is superseded or removed
    touched = last.where(F.col("op").isin("index", "delete", "update")).select(id_col)
    kept = snapshot.join(F.broadcast(touched), id_col, "left_anti")

    indexed = last.where(F.col("op") == "index").select(id_col, *doc_cols)

    existing_ids = snapshot.select(id_col)
    created = (
        last.where(F.col("op") == "create")
        .join(F.broadcast(existing_ids), id_col, "left_anti")
        .select(id_col, *doc_cols)
    )

    upd = last.where(F.col("op") == "update")
    updated = (
        snapshot.join(
            F.broadcast(
                upd.select(id_col, *[F.col(c).alias(f"__new_{c}") for c in doc_cols])
            ),
            id_col,
        )
        .select(
            id_col,
            *[
                F.coalesce(F.col(f"__new_{c}"), F.col(c)).alias(c)
                for c in doc_cols
            ],
        )
    )

    return kept.unionByName(indexed).unionByName(created).unionByName(updated)


def delete_by_query(snapshot: DataFrame, predicate: str, id_col: str = "doc_id") -> DataFrame:
    """`_delete_by_query`: new snapshot without the matching docs —
    an anti-filter that pushes to the scan."""
    return snapshot.where(~F.expr(predicate))


def update_by_query(
    snapshot: DataFrame, predicate: str, set_exprs: dict[str, str]
) -> DataFrame:
    """`_update_by_query` with a Spark-SQL "script": matching docs get
    each column rewritten by its expression (non-matching rows pass
    through) — one narrow projection, no shuffle, the copy-on-write
    shape of a lake-table UPDATE."""
    cond = F.expr(predicate)
    cols = [
        F.when(cond, F.expr(set_exprs[c])).otherwise(F.col(c)).alias(c)
        if c in set_exprs
        else F.col(c)
        for c in snapshot.columns
    ]
    return snapshot.select(*cols)


def reindex(
    source: DataFrame,
    predicate: str | None = None,
    script: dict[str, str] | None = None,
) -> DataFrame:
    """`_reindex`: filtered, optionally script-transformed copy of the
    source index — the combination the reference's users run to
    migrate mappings (filter pushdown + narrow projection; writing the
    result is the caller's `write.parquet`)."""
    out = source
    if predicate:
        out = out.where(F.expr(predicate))
    if script:
        cols = [
            F.expr(script[c]).alias(c) if c in script else F.col(c)
            for c in source.columns
        ]
        out = out.select(*cols)
    return out
