"""DSIR importance resampling + phrase suggester semantics (beyond
the SQL oracles: direction of the weights, determinism, lattice
behavior)."""

from __future__ import annotations

import pytest

from neural_search_spark import catalog
from neural_search_spark.functions.sparse import tf_postings
from neural_search_spark.operators import bm25 as B
from neural_search_spark.operators import selection as SEL

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return catalog.table(spark, sf_dir, "documents")


def test_dsir_weights_favor_target_like_docs(spark):
    # target speaks only "alpha beta"; raw has target-like docs and
    # off-distribution docs — the target-like ones must out-weigh
    tgt = spark.createDataFrame(
        [(100 + i, "alpha beta alpha beta") for i in range(5)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "gamma delta epsilon"),
         (3, "beta alpha beta"), (4, "zeta eta theta")],
        "doc_id long, text string",
    )
    lw = {r["doc_id"]: r["log_weight"] for r in SEL.dsir_logweights(raw, tgt).collect()}
    assert min(lw[1], lw[3]) > max(lw[2], lw[4])


def test_dsir_resample_deterministic_and_sized(docs):
    en = docs.where(F.col("lang") == "en")
    a = SEL.dsir_resample(docs, en, k=20).collect()
    b = SEL.dsir_resample(docs, en, k=20).collect()
    assert a == b
    assert len(a) == 20
    # ordered by the gumbel key, descending
    keys = [r["gumbel_key"] for r in a]
    assert keys == sorted(keys, reverse=True)


def test_dsir_feature_counts_cover_all_ngrams(spark):
    d = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    total = (
        SEL.hashed_ngram_counts(d)
        .agg(F.sum("cnt").alias("s"))
        .first()["s"]
    )
    assert total == 5  # 3 unigrams + 2 bigrams


def _suggest(spark, rows, phrase, **kw):
    d = spark.createDataFrame(rows, "doc_id long, text string")
    post = tf_postings(d)
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    n = F.size(toks)
    bigrams = (
        d.where(n >= 2)
        .select(F.explode(F.arrays_zip(
            F.slice(toks, 1, n - 1).alias("w1"),
            F.slice(toks, 2, n - 1).alias("w2"))).alias("bg"))
        .groupBy(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .agg(F.count("*").alias("cnt"))
    )
    return B.phrase_suggest(post, bigrams, phrase, **kw).collect()


def test_phrase_suggest_corrects_typo_by_bigram_context(spark):
    rows = [
        (1, "open window open window open window"),
        (2, "open winter"),
        (3, "oven winter oven winter oven winter oven winter"),
    ]
    out = _suggest(spark, rows, "open winow", max_dist=1, k=3)
    # "window" follows "open" often; "winter" mostly follows "oven"
    assert out[0]["suggestion"] == "open window"


def test_phrase_suggest_scores_are_log_probs(spark):
    out = _suggest(spark, [(1, "x y x y")], "x y", max_dist=0, k=3)
    assert len(out) == 1
    assert out[0]["score"] < 0.0


def test_phrase_suggest_three_token_lattice(spark):
    rows = [(1, "big data pipeline big data pipeline"), (2, "big date line")]
    out = _suggest(spark, rows, "big dato pipeline", max_dist=1, k=5)
    assert out[0]["suggestion"] == "big data pipeline"
