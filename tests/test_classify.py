"""Multinomial NB classifier: separable-corpus accuracy, prior-only
docs, smoothing density, and oracle parity for the registry query."""

from __future__ import annotations

from pyspark.sql import functions as F

from neural_search_spark import registry
from neural_search_spark.operators import classify as NB

from .conftest import SF_SMOKE
from .oracle_check import compare


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_separable_corpus_classifies(spark):
    rows = [
        (1, "bonjour le monde le chat", "fr"),
        (2, "bonjour paris le café", "fr"),
        (3, "hello world the cat", "en"),
        (4, "hello london the tea", "en"),
    ]
    d = _docs(spark, rows)
    m = NB.nb_train(d, "lang")
    pred = {r["doc_id"]: r["pred_cls"] for r in NB.nb_predict(d, m).collect()}
    assert pred == {1: "fr", 2: "fr", 3: "en", 4: "en"}


def test_empty_doc_scores_on_priors(spark):
    rows = [
        (1, "aa aa aa", "x"),
        (2, "aa aa", "x"),
        (3, "bb", "y"),
        (4, "", "y"),
    ]
    d = _docs(spark, rows)
    m = NB.nb_train(d, "lang")
    out = {r["doc_id"]: r for r in NB.nb_predict(d, m).collect()}
    assert len(out) == 4  # the empty doc still classifies
    # priors are equal (2 vs 2) → empty doc's score_q = prior_q of the
    # argmax class; ties break to the LAST cls under (score, cls) max
    assert out[4]["pred_cls"] == "y"


def test_likelihood_grid_is_dense(spark):
    rows = [(1, "aa", "x"), (2, "bb", "y")]
    m = NB.nb_train(_docs(spark, rows), "lang")
    # 2 classes × 2 vocab tokens = 4 rows, unseen pairs smoothed not absent
    assert m.likelihoods.count() == 4


def test_nb_oracle_smoke(spark):
    df = registry.q_nb_lang_predict(spark, SF_SMOKE)
    ok, msg = compare(df, registry.ORACLES["nb_lang_predict"], SF_SMOKE)
    assert ok, msg


def test_nb_train_accuracy_on_corpus(spark):
    """Self-train accuracy on the synthetic corpus must beat the
    majority-class baseline — the model actually learns."""
    from neural_search_spark import catalog
    import pyspark.sql.functions as F

    docs = catalog.table(spark, SF_SMOKE, "documents")
    m = registry._nb_model(spark, SF_SMOKE)
    pred = NB.nb_predict(docs, m)
    joined = pred.join(docs.select("doc_id", "lang"), "doc_id")
    acc = joined.where(F.col("pred_cls") == F.col("lang")).count() / docs.count()
    major = (
        docs.groupBy("lang").count().agg(F.max("count")).first()[0] / docs.count()
    )
    assert acc > major, (acc, major)


# -- logistic regression ----------------------------------------------------

def _lr_df(spark):
    # separable on x1: label 1 ↔ long docs
    rows = []
    for i in range(40):
        n_chars = 800 + i * 10 if i % 2 == 0 else 100 + i * 5
        text = "w " * (n_chars // 10)
        rows.append((i, text.strip(), "en" if i % 2 == 0 else "de", "src0", n_chars))
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_logreg_round1_gradient_uses_half(spark):
    """With w=0, σ is exactly 0.5 — the first-round gradient must be
    mean((y-0.5)·x)."""
    from neural_search_spark.operators.classify import (
        logreg_features, logreg_train,
    )

    feats = logreg_features(_lr_df(spark), "lang = 'en'")
    w = logreg_train(feats, rounds=1, lr=1.0)
    import math

    rows = feats.collect()
    for j, col in enumerate(["x0", "x1", "x2"]):
        g = sum((r["y"] - 0.5) * r[col] for r in rows) / len(rows)
        g = math.floor(round(g, 6) * 1e6 + 0.5) / 1e6
        assert abs(w[j] - g) < 2e-6, (col, w[j], g)


def test_logreg_learns_separable_and_is_deterministic(spark):
    from neural_search_spark.operators.classify import (
        logreg_features, logreg_predict, logreg_train,
    )

    feats = logreg_features(_lr_df(spark), "lang = 'en'").cache()
    w1 = logreg_train(feats, rounds=4, lr=2.0)
    w2 = logreg_train(feats, rounds=4, lr=2.0)
    assert w1 == w2  # engine-exact trajectory
    pred = logreg_predict(feats, w1)
    acc = (
        pred.join(feats.select("doc_id", "y"), "doc_id")
        .where(F.col("label_pred") == F.col("y").cast("int"))
        .count()
    ) / 40.0
    assert acc >= 0.9, acc
