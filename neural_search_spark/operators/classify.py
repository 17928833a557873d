"""Distributed multinomial Naive Bayes over token counts — the
fastText-style corpus classifier a training-data pipeline runs for
language-ID / quality / domain routing at 100 TB.

Training is pure counting (the model IS a pair of aggregates):
- priors:       one groupBy over docs            → (cls, n_docs)
- likelihoods:  one explode + groupBy            → (cls, token, cnt)
densified over vocab × classes (Laplace +1) so scoring never branches
on unseen pairs. Both tables are ingest artifacts: |V|·|C| rows ≪
corpus, broadcastable for scoring joins.

Scoring: score(d, c) = q(ln prior_c) + Σ_t tf_{d,t} · q(ln p(t|c))
with q(x) = floor(x·1e6 + 0.5) — the integer-quantized log-likelihood
(same discipline as the PQ ADC table, operators/pq.py): integer sums
are exact under any association/partitioning, so scores AND the argmax
class are bit-identical across engines — which is what lets the whole
train+predict pipeline be hash-checked against a DuckDB oracle rather
than gated on accuracy alone.

Scale shape: one shuffle per training aggregate; scoring is a
token-key join of doc postings against the (broadcastable) likelihood
table + one (doc_id) aggregation; the argmax is a |docs|·|C|-row
max_by — no corpus-sized window, no Python.

Reference scope: the reference delegates all classification to the ML
plugin (`ml/MLCommonsClientAccessor.java`); an in-engine NB trained on
the indexed corpus is "beyond the reference" training-data surface
(SURVEY §2 extension set).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.sparse import tokens

LOG_SCALE = 1_000_000  # 1e-6 resolution in the quantized log domain


def _q(col):
    """floor(x·1e6 + 0.5) as BIGINT — engine-exact log quantization."""
    return F.floor(col * F.lit(float(LOG_SCALE)) + F.lit(0.5)).cast("long")


@dataclass
class NBModel:
    priors: DataFrame  # (cls, prior_q long)
    likelihoods: DataFrame  # (cls, token, llh_q long) — dense vocab × classes


def nb_train(
    docs: DataFrame,
    class_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> NBModel:
    """Multinomial NB with Laplace smoothing, log-quantized."""
    cls = F.col(class_col).alias("cls")
    n_total = docs.count()
    priors = docs.groupBy(cls).agg(F.count("*").alias("n")).select(
        "cls", _q(F.log(F.col("n") / F.lit(float(n_total)))).alias("prior_q")
    )
    toks = docs.select(cls, F.explode(tokens(F.col(text_col))).alias("token"))
    counts = toks.groupBy("cls", "token").agg(F.count("*").alias("cnt"))
    totals = counts.groupBy("cls").agg(F.sum("cnt").alias("total"))
    vocab = counts.select("token").distinct()
    v_size = vocab.count()
    # dense (cls, token) grid: unseen pairs get the +1 numerator
    grid = totals.crossJoin(vocab)
    dense = grid.join(counts, ["cls", "token"], "left").select(
        "cls",
        "token",
        _q(
            F.log(
                (F.coalesce(F.col("cnt"), F.lit(0)) + 1.0)
                / (F.col("total") + F.lit(float(v_size)))
            )
        ).alias("llh_q"),
    )
    return NBModel(priors=priors, likelihoods=dense)


def nb_predict(
    docs: DataFrame,
    model: NBModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, pred_cls, score_q): argmax class per doc.

    Docs with zero tokens score on priors alone. The likelihood join is
    broadcast (|V|·|C| rows); the argmax uses max_by over a
    (score_q, cls) struct — integer score, so ties (only possible for
    byte-identical class models) break to the LAST cls under struct
    ordering; the oracle uses the identical (score DESC, cls DESC)
    rank."""
    tf = (
        docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count("*").alias("tf"))
    )
    tok_scores = (
        tf.join(F.broadcast(model.likelihoods), "token")
        .groupBy(id_col, "cls")
        .agg(F.sum(F.col("tf") * F.col("llh_q")).alias("tok_q"))
    )
    # every doc × every class, so prior-only docs still classify
    all_pairs = docs.select(id_col).crossJoin(model.priors)
    scored = all_pairs.join(tok_scores, [id_col, "cls"], "left").select(
        F.col(id_col),
        F.col("cls"),
        (F.col("prior_q") + F.coalesce(F.col("tok_q"), F.lit(0))).alias("score_q"),
    )
    best = scored.groupBy(id_col).agg(
        F.max(F.struct(F.col("score_q"), F.col("cls"))).alias("b")
    )
    return best.select(
        F.col(id_col),
        F.col("b.cls").alias("pred_cls"),
        F.col("b.score_q").alias("score_q"),
    )


# -- distributed logistic regression (full-batch GD) ------------------------
# The binary quality/language classifier a curation pipeline trains on
# weak labels. Training = `rounds` passes, each ONE aggregate over the
# feature frame (per-feature gradient means) with only a |w|-sized
# vector hitting the driver — the same "only KBs cross the boundary"
# discipline as kmeans_lloyd. Determinism: the sigmoid and the
# aggregated gradients are quantized to 6 decimals each round
# (HALF_UP round() in both Spark and DuckDB), so the weight trajectory
# — and therefore predictions — are engine-exact and hash-checkable.

SIGMOID_DP = 6  # quantization of σ and gradients per round


def logreg_features(
    docs: DataFrame,
    label_expr: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, x0 bias, x1 chars/1e3, x2 tokens/1e2, y) — cheap
    deterministic numeric features (integer counts over exact decimal
    divisors)."""
    toks = tokens(F.col(text_col))
    return docs.select(
        F.col(id_col),
        F.lit(1.0).alias("x0"),
        (F.col("n_chars").cast("double") / F.lit(1000.0)).alias("x1"),
        (F.size(toks).cast("double") / F.lit(100.0)).alias("x2"),
        F.expr(label_expr).cast("double").alias("y"),
    )


def _logreg_sigma(w: list[float]):
    z = (
        F.lit(float(w[0])) * F.col("x0")
        + F.lit(float(w[1])) * F.col("x1")
        + F.lit(float(w[2])) * F.col("x2")
    )
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), SIGMOID_DP)


def logreg_train(
    feats: DataFrame, rounds: int = 2, lr: float = 1.0
) -> list[float]:
    """Full-batch gradient ascent on the log-likelihood: per round,
    w_j += lr · mean((y − σ(w·x)) · x_j). Each round is one narrow
    aggregate — no shuffle of the corpus, no per-row Python.

    Determinism: gradients come back 6dp-rounded (Spark HALF_UP);
    weights advance in EXACT integer micro-units (1e-6), with the lr
    scaling applied as floor(lr·g_int + 0.5) — the same floor(x+0.5)
    both engines implement identically, so the whole trajectory is
    engine-exact (Python's banker's round() never touches it)."""
    import math

    w_int = [0, 0, 0]
    for _ in range(rounds):
        w = [wi / float(LOG_SCALE) for wi in w_int]
        err = F.col("y") - _logreg_sigma(w)
        g = feats.agg(
            F.round(F.avg(err * F.col("x0")), SIGMOID_DP),
            F.round(F.avg(err * F.col("x1")), SIGMOID_DP),
            F.round(F.avg(err * F.col("x2")), SIGMOID_DP),
        ).first()
        g_int = [
            int(math.floor(float(gi) * LOG_SCALE + 0.5)) for gi in g
        ]  # 6dp value → exact micro-units
        w_int = [
            wi + int(math.floor(lr * gi + 0.5)) for wi, gi in zip(w_int, g_int)
        ]
    return [wi / float(LOG_SCALE) for wi in w_int]


def logreg_predict(feats: DataFrame, w: list[float], id_col: str = "doc_id") -> DataFrame:
    """(doc_id, p, label_pred) under the trained weights (σ quantized
    exactly as in training)."""
    p = _logreg_sigma(w)
    return feats.select(
        F.col(id_col),
        p.alias("p"),
        (p >= F.lit(0.5)).cast("int").alias("label_pred"),
    )
