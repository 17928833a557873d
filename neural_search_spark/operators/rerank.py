"""Post-retrieval rerankers + MMR diversification (SURVEY.md §2.8).

Rerankers operate on the fused top-k ONLY — the corpus never reaches
the (potentially expensive) scoring function; at 100 TB that is the
difference between a viable cross-encoder pass (k rows through a
pandas UDF) and an impossible one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.sparse import tokens


def rerank_by_field(
    results: DataFrame,
    corpus: DataFrame,
    target_field: str,
    keep_previous_score: bool = False,
    k: int | None = None,
    id_col: str = "doc_id",
    previous_score_field: str = "previous_score",
) -> DataFrame:
    """Q2 `rerank`/`by_field`: `_score := doc[target_field]`, re-sort.

    Parity: `processor/rerank/ByFieldRerankProcessor.java:74-83`;
    ``previous_score_field`` is the 3.8 enhancement (#1880) letting the
    caller pick where the pre-rerank score is kept so it cannot
    overwrite an existing document field.
    """
    if keep_previous_score and previous_score_field in (
        "score",
        id_col,
        target_field,
    ):
        # The 3.8 feature exists precisely to avoid field collisions —
        # reject names that would produce duplicate/ambiguous columns.
        raise ValueError(
            f"previous_score_field={previous_score_field!r} collides with "
            f"'score', the id column {id_col!r}, or target_field "
            f"{target_field!r}"
        )
    joined = results.join(corpus.select(id_col, target_field), id_col)
    cols = [F.col(id_col)]
    if keep_previous_score:
        cols.append(F.col("score").alias(previous_score_field))
    cols.append(F.col(target_field).cast("double").alias("score"))
    out = joined.select(*cols)
    out = out.orderBy(F.col("score").desc(), F.col(id_col))
    return out.limit(k) if k else out


def token_jaccard(query_text: str, text_col: Column) -> Column:
    """Deterministic cross-encoder stand-in: Jaccard similarity of the
    distinct lowercase token sets of (query, doc). Replaces the ML RPC
    of `ml/MLCommonsClientAccessor.java:175` (inferenceSimilarity) with
    an exact, oracle-checkable relevance function."""
    q_tokens = sorted({t for t in query_text.lower().split() if t})
    q_arr = F.array(*[F.lit(t) for t in q_tokens])
    d_arr = F.array_distinct(tokens(F.lower(text_col)))
    inter = F.size(F.array_intersect(d_arr, q_arr)).cast("double")
    union = F.size(F.array_union(d_arr, q_arr)).cast("double")
    return F.when(union > 0.0, inter / union).otherwise(F.lit(0.0))


def rerank_cross_encoder(
    results: DataFrame,
    corpus: DataFrame,
    query_text: str,
    k: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Q1 `rerank`/`ml_opensearch`: similarity(query, doc) replaces the
    score, results re-sorted desc.

    Parity: `processor/rerank/MLOpenSearchRerankProcessor.java:57-95` +
    `RescoringRerankProcessor.java:49-110`. Only the incoming top-k rows
    are scored (context fetch joins just those ids).
    """
    joined = results.select(id_col).join(corpus.select(id_col, text_col), id_col)
    out = joined.select(
        F.col(id_col), token_jaccard(query_text, F.col(text_col)).alias("score")
    ).orderBy(F.col("score").desc(), F.col(id_col))
    return out.limit(k) if k else out


RERANK_MAX_CANDIDATES = 100


def rerank_with_model(
    results: DataFrame,
    corpus: DataFrame,
    scorer,
    k: int | None = None,
    max_candidates: int = RERANK_MAX_CANDIDATES,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Q1 rerank through a MODEL scorer (a pandas UDF: text → score,
    e.g. models.cross_encoder_udf or a real cross-encoder swap) with a
    HARD batch budget: the scorer input is capped at `max_candidates`
    rows no matter how wide the incoming result frame is, so swapping
    in an expensive model can never silently widen the UDF input to
    the corpus (VERDICT r3 item 9; the reference's processor likewise
    only sees the query-phase window,
    `processor/rerank/RescoringRerankProcessor.java:49-110`).

    Plan shape: TakeOrdered(max_candidates) on the incoming scores →
    broadcast join for the text fetch → Arrow-batched scorer over ≤
    max_candidates rows → TakeOrdered(k)."""
    capped = results.select(id_col, "score").orderBy(
        F.col("score").desc(), F.col(id_col)
    ).limit(int(max_candidates))
    joined = F.broadcast(capped.select(id_col)).join(
        corpus.select(id_col, text_col), id_col
    )
    out = joined.select(
        F.col(id_col), scorer(F.col(text_col)).cast("double").alias("score")
    ).orderBy(F.col("score").desc(), F.col(id_col))
    return out.limit(k) if k else out


def mmr_diversify(
    results: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    lambda_: float = 0.5,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
) -> list[int]:
    """Q3 MMR: greedily pick k of the candidates maximizing
    λ·relevance − (1−λ)·max_cosine_to_already_selected.

    Parity: `processor/mmr/MMRNeuralQueryTransformer.java:40-110`.
    Like the reference, this is a small driver-side loop over the
    over-fetched candidate list (candidates ≈ a few × k) — collecting
    it is correct at any corpus scale because only top candidates land
    here.
    """
    import math

    rows = (
        results.join(corpus.select(id_col, vec_col), id_col)
        .select(id_col, "score", vec_col)
        .collect()
    )
    cands = [(r[0], float(r[1]), [float(x) for x in r[2]]) for r in rows]
    cands.sort(key=lambda c: (-c[1], c[0]))

    def cos(a: list[float], b: list[float]) -> float:
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb) if na and nb else 0.0

    selected: list[tuple[int, float, list[float]]] = []
    remaining = list(cands)
    while remaining and len(selected) < k:
        best, best_val = None, -float("inf")
        for c in remaining:
            penalty = max((cos(c[2], s[2]) for s in selected), default=0.0)
            val = lambda_ * c[1] - (1.0 - lambda_) * penalty
            if val > best_val or (val == best_val and best is not None and c[0] < best[0]):
                best, best_val = c, val
        selected.append(best)
        remaining.remove(best)
    return [s[0] for s in selected]
