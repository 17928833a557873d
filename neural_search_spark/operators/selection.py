"""Data selection for LLM training corpora: DSIR importance resampling.

DSIR (Xie et al., 2023, "Data Selection for Language Models via
Importance Resampling"): score every raw document by how target-like
its hashed n-gram profile is — log importance weight
``log p_target(x) - log p_raw(x)`` under bag-of-hashed-ngrams
unigram/bigram models — then Gumbel-top-k resample, which draws from
the importance-weighted distribution without materializing it.

Spark shape (the 100 TB story):
- feature extraction is a map-side explode (tokens + bigrams → md5
  bucket) followed by a partially-aggregated ``(doc, bucket, cnt)``
  groupBy — ONE shuffle over the corpus, combiner-bounded;
- both feature distributions collapse to ``n_buckets``-row frames
  (bounded by construction, broadcast back);
- per-doc log-weights are one broadcast-hash join + one grouped sum —
  the second and last corpus shuffle;
- selection is Gumbel-top-k: a pure map expression + TakeOrdered, no
  global sort. Determinism: the Gumbel draw derives from
  md5(salt‖doc_id), so the "random" resample is reproducible across
  engines and runs (same construction as sample_weighted's A-ES key).

The reference engine has no training-data selection surface; this is
part of the beyond-reference LLM-pipeline layer (SURVEY.md §2
additions), built only from the public DSIR paper.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.sparse import tokens

DSIR_BUCKETS = 64
DSIR_SALT = "dsir1"


def _bucket(gram: Column, n_buckets: int) -> Column:
    """md5-derived feature hash — engine-portable (DuckDB mirrors it
    as CAST(('0x'||substring(md5(g),1,8)) AS BIGINT) % n)."""
    return (
        F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
        % F.lit(n_buckets)
    )


def _gram_frame(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    extra: "tuple[str, ...]" = (),
) -> DataFrame:
    """(id, gram[, *extra]): the exploded unigram + bigram stream.
    ONE explode (optimization r10: the unigram and bigram grams
    concatenate into one per-doc array before the explode — the
    earlier uni ∪ bi union scanned and re-tokenized the corpus twice
    per feature build; the gram MULTISET per doc is unchanged).
    ``extra`` columns (per-doc constants, e.g. a target flag) ride
    through the explode."""
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    base = docs.select(
        F.col(id_col), toks.alias("__t"), n.alias("__n"), *extra
    )
    bigrams = F.when(
        F.col("__n") >= 2,
        F.transform(
            F.arrays_zip(
                F.slice("__t", 1, F.col("__n") - 1).alias("w1"),
                F.slice("__t", 2, F.col("__n") - 1).alias("w2"),
            ),
            lambda s: F.concat_ws(" ", s["w1"], s["w2"]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return base.select(
        id_col,
        F.explode(F.concat(F.col("__t"), bigrams)).alias("gram"),
        *extra,
    )


def hashed_ngram_counts(
    docs: DataFrame,
    n_buckets: int = DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, bucket, cnt): unigram + bigram features hashed into
    ``n_buckets`` — one explode + one combiner-bounded groupBy."""
    grams = _gram_frame(docs, id_col, text_col)
    return (
        grams.select(id_col, _bucket(F.col("gram"), n_buckets).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def _ratio_from_bucket_counts(bc: DataFrame, n_buckets: int) -> DataFrame:
    """(bucket, log_ratio) from a (bucket, rc, tc) frame: totals via a
    whole-frame window over the ≤ ``n_buckets``-row aggregate, so the
    frame is consumed ONCE (optimization r10 — the earlier
    agg + crossJoin(broadcast(total)) shape consumed each bucket
    aggregate twice, and with no exchange reuse each consumption
    re-ran the corpus-wide gram pass underneath; the window's single-
    partition exchange moves ≤ n_buckets rows). Identical math: the
    totals are exact integer sums, then the same smoothed-log
    expressions."""
    from pyspark.sql import Window

    w = Window.partitionBy()
    b = F.lit(float(n_buckets))
    log_p_t = F.log(
        (F.col("tc") + 1.0) / (F.sum("tc").over(w) + b)
    )
    log_p_r = F.log(
        (F.col("rc") + 1.0) / (F.sum("rc").over(w) + b)
    )
    return bc.select(
        "bucket", "rc", (log_p_t - log_p_r).alias("log_ratio")
    )


def dsir_log_ratio(
    raw_feats: DataFrame,
    target_feats: DataFrame,
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Per-bucket ``log p_target(b) - log p_raw(b)`` with add-1
    smoothing — an ``n_buckets``-row frame built from two bounded
    aggregations, broadcastable by construction."""
    t = target_feats.groupBy("bucket").agg(F.sum("cnt").alias("tc"))
    r = raw_feats.groupBy("bucket").agg(F.sum("cnt").alias("rc"))
    # FULL outer join so the window totals see target-only buckets too
    # (t_total is the whole target mass); output buckets stay exactly
    # raw's — a real bucket always has rc >= 1, so rc > 0 after the
    # zero-fill identifies them, and the filter sits ABOVE the window.
    joined = r.join(t, "bucket", "outer").na.fill({"tc": 0, "rc": 0})
    return (
        _ratio_from_bucket_counts(joined, n_buckets)
        .where(F.col("rc") > 0)
        .drop("rc")
    )


def dsir_logweights(
    raw_docs: DataFrame,
    target_docs: "DataFrame | None",
    n_buckets: int = DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_flag: "Column | None" = None,
) -> DataFrame:
    """(id, log_weight): per-doc DSIR importance log-weight — feature
    counts joined to the broadcast log-ratio table, summed per doc.

    When the target corpus is a FILTER of the raw corpus (the common
    DSIR deployment: "docs that look like Wikipedia/en/..."), pass the
    predicate as ``target_flag`` instead of a separate ``target_docs``
    frame. The ratio then comes from ONE gram pass — bucket counts
    aggregate count(*) and count-where-flag simultaneously, with a
    64-key map-side combiner — instead of separate raw and target
    feature builds (optimization r10, guide §2.3 aggregate-before-
    shuffle: the measured before-plan re-ran the corpus gram explode
    for every consumer of the two feature frames — 20 parquet scans /
    32 exchanges at sf0.1 — because nothing reuses an exchange across
    the ratio's sub-aggregations; the flagged path needs 2 gram passes
    total: ratio + the per-doc join below). Identical weights: per-
    bucket tc/rc are the same integers (target ⊆ raw), totals the same
    sums, then the same smoothed-log doubles.

    A localCheckpoint of the feature frames was MEASURED and rejected
    at sf0.1 (eager materialization cost ≈ the recompute it saves
    there; interleaved A/B min 2.97 vs 2.73 s) — a 100 TB run would
    instead write the feature frames as the extraction job's scratch
    output, the pattern the index store already implements."""
    if target_flag is not None:
        # ONE gram pass total (optimization r11, guide §2.4): both the
        # ratio build and the per-doc weight sum consume the SAME
        # per-(doc, bucket) feature aggregate — identical subtrees, so
        # physical planning dedupes the underlying shuffle
        # (ReusedExchange; verified in plans/r11/dsir_select_after.txt)
        # and the corpus gram explode runs once per execution instead
        # of twice (the r10 flagged path aggregated the ratio directly
        # off a second gram stream). Identical weights: per-bucket
        # rc = Σ cnt and tc = Σ cnt·[tgt] are the same integers the
        # per-gram count(*)/count-if produced (__tgt is a per-doc
        # constant, so grouping on it splits no (doc, bucket) cell),
        # then the same smoothed-log doubles and the same per-doc
        # products.
        grams = _gram_frame(
            raw_docs.withColumn("__tgt", target_flag), id_col, text_col,
            extra=("__tgt",),
        )
        feats = (
            grams.select(
                id_col,
                _bucket(F.col("gram"), n_buckets).alias("bucket"),
                "__tgt",
            )
            # vacuously-true null guard (md5 of a non-null gram is never
            # null): the bucket equi-join below pushes isnotnull(bucket)
            # under the probe-side aggregate; stating it HERE keeps the
            # ratio branch's subtree byte-identical so the planner's
            # exchange-reuse dedupes the shared gram pass instead of
            # running it per branch
            .where(F.col("bucket").isNotNull())
            .groupBy(id_col, "bucket", "__tgt")
            .agg(F.count("*").alias("cnt"))
        )
        bc = feats.groupBy("bucket").agg(
            F.sum("cnt").alias("rc"),
            F.sum(
                F.when(F.col("__tgt"), F.col("cnt")).otherwise(F.lit(0))
            ).alias("tc"),
        )
        ratio = _ratio_from_bucket_counts(bc, n_buckets).drop("rc")
        raw_f = feats
    else:
        tgt_f = hashed_ngram_counts(target_docs, n_buckets, id_col, text_col)
        ratio = dsir_log_ratio(
            hashed_ngram_counts(raw_docs, n_buckets, id_col, text_col),
            tgt_f,
            n_buckets,
        )
        raw_f = hashed_ngram_counts(raw_docs, n_buckets, id_col, text_col)
    return (
        raw_f.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.round(F.sum(F.col("cnt") * F.col("log_ratio")), 6).alias(
                "log_weight"
            )
        )
    )


def dsir_resample(
    raw_docs: DataFrame,
    target_docs: "DataFrame | None",
    k: int,
    n_buckets: int = DSIR_BUCKETS,
    salt: str = DSIR_SALT,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_flag: "Column | None" = None,
) -> DataFrame:
    """Gumbel-top-k resample: select ``k`` docs by
    ``log_weight + Gumbel(md5(salt‖id))`` — equivalent to sampling
    without replacement from softmax(log_weight) (the DSIR §2.3
    sampled-selection step), deterministic across engines/runs.
    Returns (id, log_weight, gumbel_key) ordered by the key.
    ``target_flag`` (a predicate over ``raw_docs``) takes the one-pass
    ratio path of dsir_logweights when the target is a filter of raw."""
    lw = dsir_logweights(
        raw_docs, target_docs, n_buckets, id_col, text_col,
        target_flag=target_flag,
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / F.lit(4294967296.0)
    g = -F.log(-F.log(u))
    key = F.round(F.col("log_weight") + g, 6)
    return (
        lw.select(id_col, "log_weight", key.alias("gumbel_key"))
        .orderBy(F.col("gumbel_key").desc(), id_col)
        .limit(k)
    )
