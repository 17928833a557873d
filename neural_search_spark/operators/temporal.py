"""Temporal joins over event streams — as-of join as a single-shuffle
window plan.

The reference has no temporal operators (ingest is request batching,
SURVEY.md §2.12); these are training-data-pipeline additions: aligning
events to the most recent prior state (last checkpoint, last click,
last model snapshot) is the canonical feature-engineering join.

Scale design: the naive formulation is an inequality join
(``probe.ts >= build.ts``) which Spark executes as a broadcast
nested-loop — O(|probe|·|build|) and a non-starter at 100 TB. The
implementation here is the union + fill-forward pattern:

    union(tagged build, tagged probe)
      → window over (keys) ordered by (ts, side, tiebreak)
      → last(carry, ignorenulls) over ROWS UNBOUNDED PRECEDING..1 PRECEDING
      → keep probe rows

One hash shuffle on the join keys, linear work per partition, and the
sort is per-key — the same plan shape survives a 1000-executor
cluster. For a pathologically hot key (a window partition AQE cannot
split), `asof_join_bucketed` re-keys the window by (key, time-bucket)
with a tiny cross-bucket carry pass; `operators/skew.py` covers the
equi-join case.

Determinism: ties are totally ordered by (ts, side, tiebreak), so the
matched build row is "max ts, then max tiebreak" — reproducible across
engines and shard counts (the same discipline as RRF tie-breaks,
`processor/normalization/RRFNormalizationTechnique.java:56-60`).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _epoch_sec(df: DataFrame, colname: str):
    """Fractional epoch seconds from a numeric or timestamp column.
    TIMESTAMP casts to double directly; TIMESTAMP_NTZ forbids that
    cast (Spark 4), so route it through TIMESTAMP first (session-TZ
    reinterpretation — both join sides go through the same frame, so
    the difference arithmetic is unaffected)."""
    dt = df.schema[colname].dataType
    c = F.col(colname)
    if isinstance(dt, T.TimestampNTZType):
        c = c.cast("timestamp")
    return c.cast("double")


def _tag_union(
    probe: DataFrame,
    build: DataFrame,
    keys: list[str],
    ts: str,
    carry: Sequence[str],
    tiebreak: str,
) -> tuple[DataFrame, list[str]]:
    """Union of build rows (side 0, carry struct) and probe rows
    (side 1, original columns prefixed ``__p_``) — the shared input
    frame of both as-of variants."""
    probe_cols = list(probe.columns)
    carry_struct = F.struct(*[F.col(c) for c in carry]).alias("__carry")
    b = build.select(
        *keys,
        F.col(ts).alias("__ts"),
        F.col(tiebreak).cast("double").alias("__tb"),
        carry_struct,
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(f"__p_{c}")
          for c in probe_cols],
    )
    p = probe.select(
        *keys,
        F.col(ts).alias("__ts"),
        F.lit(None).cast("double").alias("__tb"),
        F.lit(None).cast(b.schema["__carry"].dataType).alias("__carry"),
        F.lit(1).alias("__side"),
        *[F.col(c).alias(f"__p_{c}") for c in probe_cols],
    )
    return b.unionByName(p), probe_cols


def _project_out(
    matched: DataFrame, probe_cols: list[str], carry: Sequence[str], prefix: str
) -> DataFrame:
    out_cols = [F.col(f"__p_{c}").alias(c) for c in probe_cols]
    out_cols += [F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in carry]
    return matched.select(*out_cols)


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: str | Sequence[str],
    ts: str,
    carry: Sequence[str],
    tiebreak: str,
    allow_exact: bool = True,
    prefix: str = "asof_",
) -> DataFrame:
    """For each probe row, attach ``carry`` columns from the build row
    with the greatest ``ts`` ≤ (or < when ``allow_exact=False``) the
    probe row's ``ts``, per ``on`` key. Left-join semantics: probe rows
    with no prior build row keep nulls.

    ``tiebreak`` must be a build column giving a total order among
    equal-``ts`` build rows (e.g. an event id); the max wins.
    """
    keys = [on] if isinstance(on, str) else list(on)
    u, probe_cols = _tag_union(probe, build, keys, ts, carry, tiebreak)
    # allow_exact: build rows at equal ts sort BEFORE probe rows (side
    # 0 < 1) and land inside the ..1 PRECEDING frame; otherwise probe
    # rows sort first and equal-ts build rows are excluded.
    side_order = F.col("__side") if allow_exact else -F.col("__side")
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts"), side_order, F.col("__tb"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    matched = (
        u.withColumn("__m", F.last("__carry", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    return _project_out(matched, probe_cols, carry, prefix)


def band_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    band: float,
) -> DataFrame:
    """|left_ts − right_ts| ≤ band (seconds) join, executed as an
    equi-join on (keys, time bucket) instead of a range predicate.

    A raw range predicate Spark can only run as a nested-loop join.
    Bucketing both sides to ⌊epoch/band⌋ and exploding the left row
    into its 3 candidate buckets (b−1, b, b+1) turns it into a hash
    join with a cheap residual filter — 3× left fan-out, linear work,
    shuffle only on (keys, bucket). Timestamps are compared at
    microsecond precision (``double`` epoch)."""
    keys = [on] if isinstance(on, str) else list(on)
    lsec = _epoch_sec(left, left_ts)
    rsec = _epoch_sec(right, right_ts)
    l = left.withColumn("__lsec", lsec).withColumn(
        "__bucket",
        F.explode(
            F.array(
                F.floor(lsec / band) - 1,
                F.floor(lsec / band),
                F.floor(lsec / band) + 1,
            )
        ),
    )
    r = right.withColumn("__rsec", rsec).withColumn("__bucket", F.floor(rsec / band))
    for k in keys:
        r = r.withColumnRenamed(k, f"__r_{k}")
    cond = [F.col(k) == F.col(f"__r_{k}") for k in keys]
    joined = l.join(r, cond + [l["__bucket"] == r["__bucket"]], "inner").filter(
        F.abs(F.col("__lsec") - F.col("__rsec")) <= band
    )
    return joined.drop("__bucket", "__lsec", "__rsec", *[f"__r_{k}" for k in keys])


def asof_join_bucketed(
    probe: DataFrame,
    build: DataFrame,
    on: str | Sequence[str],
    ts: str,
    carry: Sequence[str],
    tiebreak: str,
    bucket_seconds: float,
    allow_exact: bool = True,
    prefix: str = "asof_",
) -> DataFrame:
    """`asof_join` for hot keys: identical semantics, but the big
    window partitions by (key, time-bucket) instead of key alone, so a
    pathologically hot key (one user with millions of events) spreads
    across ⌈span/bucket_seconds⌉ tasks instead of one straggler — the
    skew case AQE cannot split (window partitions are atomic).

    Two-pass plan:
      1. within-bucket fill-forward — the `asof_join` union+window on
         (keys, bucket): linear, parallel across buckets;
      2. cross-bucket carry — per (keys, bucket) keep only the LAST
         build row's carry (max_by), then fill forward over the
         bucket sequence: a frame of (#keys × #non-empty buckets)
         rows, orders of magnitude smaller than the data;
      3. probe rows without a within-bucket match take the carry-in
         of their bucket.

    Choose `bucket_seconds` so a hot key's per-bucket row count fits a
    task comfortably; for uniform keys plain `asof_join` does one
    fewer (tiny) shuffle.
    """
    keys = [on] if isinstance(on, str) else list(on)
    u, probe_cols = _tag_union(probe, build, keys, ts, carry, tiebreak)
    u = u.withColumn(
        "__bkt", F.floor(_epoch_sec(u, "__ts") / F.lit(float(bucket_seconds)))
    )

    side_order = F.col("__side") if allow_exact else -F.col("__side")
    w_in = (
        Window.partitionBy(*keys, "__bkt")
        .orderBy(F.col("__ts"), side_order, F.col("__tb"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    u = u.withColumn("__m_in", F.last("__carry", ignorenulls=True).over(w_in))

    # cross-bucket carry: last build carry per (keys, bucket), filled
    # forward over strictly-earlier buckets. Tiny frame — safe window.
    last_per_bucket = (
        u.filter(F.col("__side") == 0)
        .groupBy(*keys, "__bkt")
        .agg(F.max_by("__carry", F.struct("__ts", "__tb")).alias("__last"))
    )
    all_buckets = u.select(*keys, "__bkt").distinct()
    w_cross = (
        Window.partitionBy(*keys)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry_in = (
        all_buckets.join(last_per_bucket, keys + ["__bkt"], "left")
        .withColumn("__m_prev", F.last("__last", ignorenulls=True).over(w_cross))
        .select(*keys, "__bkt", "__m_prev")
    )

    matched = (
        u.filter(F.col("__side") == 1)
        .join(carry_in, keys + ["__bkt"], "left")
        .withColumn("__m", F.coalesce("__m_in", "__m_prev"))
    )
    return _project_out(matched, probe_cols, carry, prefix)
