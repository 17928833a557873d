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
