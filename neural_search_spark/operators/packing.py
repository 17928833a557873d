"""Training-example assembly: sequence packing and source mixing.

Parity-plus surface (the reference has no training-data assembly —
its ingest ends at the index write, `processor/InferenceProcessor.
java:140-166`); these are the last-mile operators of an LLM data
pipeline: turning a cleaned, deduplicated corpus into fixed-budget
training sequences with a controlled source mixture.

Scale design — both operators are window plans PARTITIONED by a
bounded key, never a global window:

- ``pack_sequences``: docs are routed to ``n_buckets`` independent
  packing streams by ``doc_id % n_buckets`` (at 100 TB: thousands of
  buckets → thousands of parallel cumsum windows, each a single
  partition-local sort). Within a bucket, a running token cumsum
  assigns each doc to the sequence its *start* falls in
  (start-fit packing): bins can overflow by at most one document,
  the standard streaming approximation of first-fit that needs no
  cross-doc coordination and is deterministic for any partitioning.
- ``mix_sources``: per-source token totals (one map-side-combinable
  agg), a driver-size budget computation (|sources| rows), then a
  per-source cumsum window that keeps the doc_id-ordered prefix whose
  token mass fits the source's share of the budget. The window is
  partitioned by source — parallel across sources, linear per source.

Determinism: both orderings are by ``doc_id`` (total order), so the
pack/mix decisions are reproducible across engines, runs, and shard
counts — the same discipline as the md5-keyed samplers
(registry ``sample_stratified_hash`` / ``sample_weighted``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    tokens_col: Column,
    budget: int,
    n_buckets: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign each document to a (pack_bucket, seq_id) training
    sequence of ~``budget`` tokens.

    Returns ``docs`` columns ``id_col`` plus ``n_tokens``,
    ``pack_bucket``, ``seq_id``. ``seq_id`` is the 0-based sequence
    index within the bucket; a document belongs to the sequence its
    cumulative start offset falls in, so every sequence holds ≥
    ``budget`` tokens once closed (the last doc straddles the
    boundary and the consumer truncates or splits at tokenization
    time — the standard approximate-packing contract).
    """
    bucket = (F.col(id_col) % F.lit(n_buckets)).alias("pack_bucket")
    d = docs.select(F.col(id_col), tokens_col.cast("long").alias("n_tokens"), bucket)
    w = (
        Window.partitionBy("pack_bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return d.select(
        id_col,
        "n_tokens",
        "pack_bucket",
        F.floor((cum - F.col("n_tokens")) / F.lit(float(budget)))
        .cast("long")
        .alias("seq_id"),
    )


def cap_per_key(
    docs: DataFrame,
    key_col: str,
    cap: int,
    id_col: str = "doc_id",
    salt: str = "cap0:",
) -> DataFrame:
    """Frequency cap: keep at most ``cap`` docs per ``key_col`` value
    (the per-domain quota of web-corpus curation — head domains
    contribute millions of pages; a cap keeps the mixture flat).

    Selection is a deterministic hash lottery: rank docs within a key
    by md5(salt ‖ id) and keep rank ≤ cap — an unbiased uniform sample
    of each key's docs, reproducible across engines/cluster sizes.

    Scale: one hash-partitioned window on ``key_col``. Head-domain
    skew makes single-key partitions large; the window only SORTS
    within a key (no state across keys), and for the pathological
    single-domain-dominates case the two-phase variant applies: count
    per key, broadcast counts, keep docs with hash-rank estimated via
    threshold = cap/count quantile, then exact-trim the overshoot —
    same output, no full sort of the hot key. The window form is the
    right default; the threshold form is ``operators/skew.py``'s
    territory and only needed past ~10⁸ rows per key.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), id_col
    )
    return (
        docs.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= cap)
        .drop("__rk")
    )


def mix_sources(
    docs: DataFrame,
    tokens_col: Column,
    targets: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Build a token-budgeted mixture over ``targets`` = {source:
    weight}: find the largest total budget B such that every source
    can supply its share (B·w_s tokens), then keep, per source, the
    doc_id-ordered prefix of documents whose cumulative token count
    fits B·w_s.

    Returns one summary row per source: ``source, target_w,
    kept_docs, kept_tokens, share`` (share = kept_tokens / total kept
    tokens, 4 dp) — the realized mixture to compare against the
    target. Document-level selection is the intermediate frame; the
    summary keeps the query result driver-small at any corpus size.
    """
    tgt = [(s, float(w)) for s, w in sorted(targets.items())]
    tgt_df = docs.sparkSession.createDataFrame(tgt, "source string, target_w double")
    d = (
        docs.select(
            F.col(id_col),
            F.col(source_col).alias("source"),
            tokens_col.cast("double").alias("n_tokens"),
        )
        .join(F.broadcast(tgt_df), "source")
    )
    totals = d.groupBy("source", "target_w").agg(F.sum("n_tokens").alias("tok_total"))
    # budget B = min_s(tok_total_s / w_s): the binding source is kept
    # whole, everything else is truncated to proportion. A 1-row
    # aggregate cross-joined back — broadcast of one row.
    budget = totals.agg(F.min(F.col("tok_total") / F.col("target_w")).alias("budget"))
    w = (
        Window.partitionBy("source")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kept = (
        d.withColumn("cum", F.sum("n_tokens").over(w))
        .crossJoin(F.broadcast(budget))
        .where(F.col("cum") <= F.col("budget") * F.col("target_w"))
    )
    out = kept.groupBy("source", "target_w").agg(
        F.count("*").alias("kept_docs"), F.sum("n_tokens").alias("kept_tokens")
    )
    # grand total via an unpartitioned window over the ALREADY-AGGREGATED
    # |sources|-row frame: one SinglePartition exchange of a bounded
    # frame, instead of a crossJoin(agg(out)) that would execute the
    # whole corpus subtree a second time.
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return out.select(
        "source",
        "target_w",
        "kept_docs",
        F.col("kept_tokens").cast("long").alias("kept_tokens"),
        F.round(F.col("kept_tokens") / F.sum("kept_tokens").over(w_all), 4).alias(
            "share"
        ),
    ).orderBy("source")


def shuffle_deterministic(
    docs: DataFrame,
    salt: str,
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """Reproducible global shuffle for training-data ordering: each row
    gets an md5-derived key; consumers read buckets in order and rows
    within a bucket by ``pos``.

    At 100 TB a true random sort is a full range-partition sort; this
    is the cheaper standard construction — hash rows into
    ``n_buckets`` pseudo-random buckets (the shuffle granularity) and
    order within buckets by the hash value via a PARTITIONED window
    (never a global one). Same salt → same permutation on any engine,
    cluster size, or run; changing the salt is a fresh epoch
    permutation. Epoch-reshuffling = one narrow map + one hash
    exchange, no global coordination.
    """
    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    d = docs.select(
        F.col(id_col),
        F.conv(F.substring(h, 1, 4), 16, 10).cast("long").alias("__hk"),
        (F.conv(F.substring(h, 5, 2), 16, 10).cast("long") % n_buckets).alias(
            "shuffle_bucket"
        ),
    )
    w = Window.partitionBy("shuffle_bucket").orderBy("__hk", id_col)
    return d.select(
        id_col,
        "shuffle_bucket",
        F.row_number().over(w).alias("pos"),
    )
