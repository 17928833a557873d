"""Hybrid-query score fusion: normalization → combination → sort/trim.

This is the Spark realization of the reference's phase-results pipeline
(`processor/NormalizationProcessorWorkflow.java:66-124`): the N
sub-query result lists become one DataFrame with a `subquery_idx`
provenance column (the delimiter encoding of
`search/util/HybridSearchResultFormatUtil.java:21-22` dissolves — see
SURVEY.md §1.3), normalization statistics are window aggregates over
each sub-query's candidate list, and combination is a groupBy over
doc_id.

Semantics traps preserved exactly (SURVEY.md §4):
- statistics are computed over the COLLECTED candidate lists (top-depth
  per sub-query), not corpus-global;
- missing sub-query scores are SKIPPED, not zero-filled — the union
  simply has no row, and each combiner's guard filter matches the
  reference's sentinel checks;
- min_max floors at 0.001, single-result lists normalize to 1.0;
- z_score: score==mean → sub-query max, σ==0 → sub-query min, z≤0 →
  0.001;
- l2: zero norm → 0.0;
- RRF global rank ties break on (score desc, doc_id asc) —
  `RRFNormalizationTechnique.java` ScoreDoc.COMPARATOR order;
- final sort ties break on (combined score desc, doc_id asc) —
  `ScoreCombiner.java:44-58`.

Scale shape: fusion operates on ≤ num_subqueries × depth rows (tiny —
k≤10k), so the window functions and groupBy here shuffle a few
thousand rows regardless of corpus size. The expensive part of a
hybrid query is the sub-query retrieval, which uses TakeOrdered
per-partition heaps (see retrieval.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MIN_SCORE = 0.001  # MinMaxScoreNormalizationTechnique MIN_SCORE
SINGLE_RESULT_SCORE = 1.0
DEFAULT_RANK_CONSTANT = 60  # RRFNormalizationTechnique.java:46
MAX_SUBQUERIES = 5  # HybridQueryBuilder.java:67

NORMALIZATION_TECHNIQUES = ("min_max", "l2", "z_score", "rrf")
COMBINATION_TECHNIQUES = ("arithmetic_mean", "geometric_mean", "harmonic_mean", "rrf")


def union_subqueries(
    subqueries: list[DataFrame], depth: int | None = None, id_col: str = "doc_id"
) -> DataFrame:
    """Union N sub-query result frames (id, score) with provenance.

    Parity: `query/HybridQueryBuilder.java:159-167` (≤5 sub-queries),
    per-sub-query top-`depth` collection
    (`search/query/HybridCollectorManager.java:237-255`).
    """
    if not 1 <= len(subqueries) <= MAX_SUBQUERIES:
        raise ValueError(f"hybrid supports 1..{MAX_SUBQUERIES} sub-queries")
    parts = []
    for i, sub in enumerate(subqueries):
        part = sub.select(
            F.col(id_col),
            F.col("score").cast("double").alias("raw_score"),
            F.lit(i).alias("subquery_idx"),
        )
        if depth is not None:
            part = part.orderBy(F.col("raw_score").desc(), F.col(id_col)).limit(depth)
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _bound_expr(bounds: list[dict | None] | None, idx_col, default):
    """Per-subquery bound config lookup → (enabled, mode, score) exprs."""
    if not bounds or all(b is None for b in bounds):
        return None
    chain = F.lit(None).cast("struct<mode:string,score:double>")
    for i, b in enumerate(bounds):
        if b is None:
            continue
        chain = F.when(
            idx_col == i,
            F.struct(
                F.lit(b.get("mode", "apply")).alias("mode"),
                F.lit(float(b.get("score", default))).alias("score"),
            ),
        ).otherwise(chain)
    return chain


def normalize(
    df: DataFrame,
    technique: str = "min_max",
    rank_constant: int = DEFAULT_RANK_CONSTANT,
    id_col: str = "doc_id",
    lower_bounds: list[dict | None] | None = None,
    upper_bounds: list[dict | None] | None = None,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Add `norm_score` per (*group_cols, subquery_idx) window —
    SURVEY.md §2.4.

    `group_cols` adds extra window dimensions — pass ("query_id",) to
    fuse a whole BATCH of hybrid queries in one plan: statistics stay
    local to each query's candidate lists, exactly as single-query
    semantics require, while Spark executes every query's fusion in the
    same stages.

    `lower_bounds`/`upper_bounds` (min_max only): per-subquery
    `{"mode": apply|clip|ignore, "score": float}` or None — parity with
    `normalization/bounds/LowerBound.java` / `UpperBound.java`.
    """
    w = Window.partitionBy(*group_cols, "subquery_idx")
    s = F.col("raw_score")
    if technique == "min_max":
        # MinMaxScoreNormalizationTechnique.java:260-297
        mn, mx = F.min(s).over(w), F.max(s).over(w)
        idx = F.col("subquery_idx")
        lb = _bound_expr(lower_bounds, idx, 0.0)
        ub = _bound_expr(upper_bounds, idx, 1.0)
        # effective min (LowerBound.determineEffectiveScore)
        eff_min = mn
        clip_lo = F.lit(False)
        if lb is not None:
            bmode, bs = lb["mode"], lb["score"]
            eff_min = F.when(
                lb.isNull(), mn
            ).when(
                bmode == "apply", F.when((mx > bs) & (s > bs), bs).otherwise(mn)
            ).when(
                bmode == "clip", F.when(mx < bs, mn).otherwise(bs)
            ).otherwise(mn)
            clip_lo = lb.isNotNull() & (bmode == "clip") & (s < eff_min)
        # effective max (UpperBound.determineEffectiveScore)
        eff_max = mx
        clip_hi = F.lit(False)
        if ub is not None:
            bmode, bs = ub["mode"], ub["score"]
            eff_max = F.when(
                ub.isNull(), mx
            ).when(
                bmode == "apply", F.when((mn < bs) & (s < bs), bs).otherwise(mx)
            ).when(
                bmode == "clip", F.when(mn > bs, mx).otherwise(bs)
            ).otherwise(mx)
            clip_hi = ub.isNotNull() & (bmode == "clip") & (s > eff_max)
        norm = (s - eff_min) / (eff_max - eff_min)
        norm_score = (
            F.when((mx == mn) & (s == mx), F.lit(SINGLE_RESULT_SCORE))  # single-score list
            .when(clip_lo, F.lit(MIN_SCORE))
            .when(clip_hi, F.lit(float(SINGLE_RESULT_SCORE)))
            .when(eff_max == eff_min, F.lit(SINGLE_RESULT_SCORE))  # degenerate range
            .otherwise(F.when(norm == 0.0, F.lit(MIN_SCORE)).otherwise(norm))
        )
    elif technique == "l2":
        # L2ScoreNormalizationTechnique.java:117-145 (zero norm → 0.0)
        norm_ = F.sqrt(F.sum(s * s).over(w))
        norm_score = F.when(norm_ == 0.0, F.lit(0.0)).otherwise(s / norm_)
    elif technique == "z_score":
        # ZScoreNormalizationTechnique.java:190-224; σ via commons-math
        # DescriptiveStatistics.getStandardDeviation()
        # (ZScoreNormalizationTechnique.java:130-141) = bias-corrected
        # SAMPLE stddev (n−1), hence stddev_samp (NULL at n=1, but the
        # s==mean branch fires first for a single-score list)
        mean = F.avg(s).over(w)
        sd = F.stddev_samp(s).over(w)
        mn, mx = F.min(s).over(w), F.max(s).over(w)
        z = (s - mean) / sd
        norm_score = (
            F.when(s == mean, mx)
            .when(sd.isNull() | (sd == 0.0), mn)
            .otherwise(F.when(z <= 0.0, F.lit(MIN_SCORE)).otherwise(z))
        )
    elif technique == "rrf":
        # RRFNormalizationTechnique.java:66-130 — global rank per
        # sub-query, ties (score desc, doc_id asc); 1-indexed rank
        rank = F.row_number().over(
            Window.partitionBy(*group_cols, "subquery_idx").orderBy(
                s.desc(), F.col(id_col)
            )
        )
        norm_score = F.lit(1.0) / (F.lit(float(rank_constant)) + rank)
    else:
        raise ValueError(f"unknown normalization technique: {technique}")
    return df.withColumn("norm_score", norm_score.cast("double"))


def _weight_expr(weights: list[float] | None) -> Column:
    """Per-subquery weight lookup; default 1.0 (ScoreCombinationUtil)."""
    if not weights:
        return F.lit(1.0)
    expr: Column = F.lit(float(weights[-1]))
    for i in range(len(weights) - 2, -1, -1):
        expr = F.when(F.col("subquery_idx") == i, F.lit(float(weights[i]))).otherwise(expr)
    return expr


def combine(
    df: DataFrame,
    technique: str = "arithmetic_mean",
    weights: list[float] | None = None,
    id_col: str = "doc_id",
    num_subqueries: int | None = None,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Combine normalized sub-query scores per doc — SURVEY.md §2.5.

    Missing sub-query scores contribute nothing (no row in the union);
    the guard filters replicate each technique's skip conditions.
    `num_subqueries` enables the reference's weights-count validation
    (`combination/ScoreCombinationUtil.java` validateIfWeightsMatchScores).
    """
    if weights is not None and num_subqueries is not None and len(weights) != num_subqueries:
        raise ValueError(
            f"number of weights ({len(weights)}) must match number of "
            f"sub-queries ({num_subqueries})"
        )
    s, w_ = F.col("norm_score"), F.col("w")
    df = df.withColumn("w", _weight_expr(weights))
    g = df.groupBy(*group_cols, id_col)
    if technique == "arithmetic_mean":
        # ArithmeticMeanScoreCombinationTechnique.java:43-60 (skip s<0)
        num = F.sum(F.when(s >= 0.0, w_ * s).otherwise(F.lit(0.0)))
        den = F.sum(F.when(s >= 0.0, w_).otherwise(F.lit(0.0)))
        out = g.agg(
            F.when(den == 0.0, F.lit(0.0)).otherwise(num / den).alias("score")
        )
    elif technique == "geometric_mean":
        # GeometricMeanScoreCombinationTechnique.java:36-58 (skip s<=0)
        num = F.sum(F.when(s > 0.0, w_ * F.log(s)).otherwise(F.lit(0.0)))
        den = F.sum(F.when(s > 0.0, w_).otherwise(F.lit(0.0)))
        out = g.agg(
            F.when(den == 0.0, F.lit(0.0)).otherwise(F.exp(num / den)).alias("score")
        )
    elif technique == "harmonic_mean":
        # HarmonicMeanScoreCombinationTechnique.java:36-55 (skip s<=0)
        num = F.sum(F.when(s > 0.0, w_).otherwise(F.lit(0.0)))
        den = F.sum(F.when(s > 0.0, w_ / s).otherwise(F.lit(0.0)))
        out = g.agg(
            F.when(den > 0.0, num / den).otherwise(F.lit(0.0)).alias("score")
        )
    elif technique == "rrf":
        # RRFScoreCombinationTechnique.java:40-61 — weighted SUM
        out = g.agg(
            F.coalesce(
                F.sum(F.when(s >= 0.0, w_ * s)), F.lit(0.0)
            ).alias("score")
        )
    else:
        raise ValueError(f"unknown combination technique: {technique}")
    return out


def hybrid_fuse(
    subqueries: list[DataFrame],
    normalization: str = "min_max",
    combination: str = "arithmetic_mean",
    weights: list[float] | None = None,
    depth: int | None = None,
    k: int = 10,
    from_: int = 0,
    min_score: float | None = None,
    rank_constant: int = DEFAULT_RANK_CONSTANT,
    id_col: str = "doc_id",
    lower_bounds: list[dict | None] | None = None,
    upper_bounds: list[dict | None] | None = None,
) -> DataFrame:
    """Full hybrid pipeline: union → normalize → combine → sort/page.

    `min_score` post-filter parity: `ScoreCombiner.java:137-163` (P3);
    pagination parity: fused `from`/`size` over top-`depth` lists (K4,
    `HybridCollectorManager.java:237-255`).
    """
    fused = combine(
        normalize(
            union_subqueries(subqueries, depth=depth, id_col=id_col),
            technique=normalization,
            rank_constant=rank_constant,
            id_col=id_col,
            lower_bounds=lower_bounds,
            upper_bounds=upper_bounds,
        ),
        technique=combination,
        weights=weights,
        id_col=id_col,
        num_subqueries=len(subqueries),
    )
    if min_score is not None:
        fused = fused.where(F.col("score") >= min_score)
    fused = fused.orderBy(F.col("score").desc(), F.col(id_col))
    if from_:
        fused = fused.offset(from_)
    return fused.limit(k)


def hybrid_explain(
    subqueries: list[DataFrame],
    normalization: str = "min_max",
    combination: str = "arithmetic_mean",
    weights: list[float] | None = None,
    depth: int | None = None,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Q6 `hybrid_score_explanation`: per-doc fusion arithmetic.

    Parity: `processor/ExplanationResponseProcessor.java` — emits one row
    per (doc, subquery) with raw score, normalized score, weight, and
    the final combined score, for the fused top-k docs.
    """
    u = union_subqueries(subqueries, depth=depth, id_col=id_col)
    n = normalize(u, technique=normalization, id_col=id_col).withColumn(
        "w", _weight_expr(weights)
    )
    fused = hybrid_fuse(
        subqueries,
        normalization=normalization,
        combination=combination,
        weights=weights,
        depth=depth,
        k=k,
        id_col=id_col,
    ).withColumnRenamed("score", "combined_score")
    return (
        n.join(fused, id_col)
        .select(
            id_col,
            "subquery_idx",
            "raw_score",
            "norm_score",
            F.col("w").alias("weight"),
            "combined_score",
        )
        .orderBy(F.col("combined_score").desc(), F.col(id_col), F.col("subquery_idx"))
    )


def collapse_subquery_cap(
    union_df: DataFrame,
    corpus: DataFrame,
    collapse_col: str,
    docs_per_group: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-(subquery, collapse-group) candidate cap applied DURING
    collection, before fusion.

    Parity: `index.neural_search.hybrid_collapse_docs_per_group_per_subquery`
    (`settings/NeuralSearchSettings.java:79-87`, enforced in
    `search/collector/HybridCollapsingTopDocsCollector.java`): each
    sub-query contributes at most N docs per collapse-key to the fused
    lists.
    """
    joined = union_df.join(corpus.select(id_col, collapse_col), id_col)
    w = Window.partitionBy("subquery_idx", collapse_col).orderBy(
        F.col("raw_score").desc(), F.col(id_col)
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= docs_per_group)
        .drop("_rn", collapse_col)
    )


def collapse(
    fused: DataFrame,
    corpus: DataFrame,
    collapse_col: str,
    k: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """K5 collapse: one result per collapse-key, best combined score.

    Parity: `processor/collapse/CollapseDataCollector.java:114-135` —
    dedup AFTER fusion, highest combined score wins, ties by id.
    """
    joined = fused.join(corpus.select(id_col, collapse_col), id_col)
    w = Window.partitionBy(collapse_col).orderBy(F.col("score").desc(), F.col(id_col))
    out = (
        joined.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
        .orderBy(F.col("score").desc(), F.col(id_col))
    )
    return out.limit(k) if k else out
