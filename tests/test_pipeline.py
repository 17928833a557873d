"""CurationPipeline: stage composition equals the hand-built contract
query, stages behave individually, survival report is monotone."""

from __future__ import annotations

from pyspark.sql import functions as F

from neural_search_spark import catalog, registry
from neural_search_spark.pipeline import CurationPipeline


def test_pipeline_matches_curate_training_set(spark, sf_dir):
    """quality → exact dedup → split → per-source sample configured
    with the registry constants must reproduce q_curate_training_set
    row-for-row."""
    docs = catalog.table(spark, sf_dir, "documents")
    pipe = (
        CurationPipeline()
        .quality(registry.CURATE_QUALITY_MIN)
        .dedup("exact")
        .split(keep_below_hex="cd", salt="")
        .sample(
            rates_hex=registry.SAMPLE_RATES_HEX,
            default_hex=registry.SAMPLE_DEFAULT_HEX,
            salt=registry.SAMPLE_SALT,
        )
    )
    got = [
        (r["doc_id"], r["quality"])
        for r in pipe.apply(docs)
        .select("doc_id", "quality")
        .orderBy("doc_id")
        .collect()
    ]
    want = [
        (r["doc_id"], r["quality"])
        for r in registry.q_curate_training_set(spark, sf_dir).collect()
    ]
    assert got == want


def test_stages_individually(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again", "en", "web"),
            (2, "the quick brown fox jumps over the lazy dog again", "en", "web"),
            (3, "spam spam spam spam spam spam spam spam spam", "en", "web"),
            (4, "ok doc with some reasonable text in german here", "de", "web"),
            (5, "tiny", "en", "web"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    out = (
        CurationPipeline()
        .lang(["en"])
        .length(min_tokens=5)
        .repetition(max_ratio=0.5)
        .dedup("exact")
        .apply(docs)
    )
    ids = sorted(r["doc_id"] for r in out.collect())
    # 4 dropped (lang), 5 dropped (length), 3 dropped (repetition),
    # 2 dropped (duplicate of 1, min-id survivor)
    assert ids == [1]


def test_decontaminate_removes_overlap(spark):
    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "unique text with no overlap here")],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(100, "alpha beta gamma zeta")], "doc_id long, text string"
    )
    out = CurationPipeline().decontaminate(test).apply(train)
    assert [r["doc_id"] for r in out.collect()] == [2]


def test_survival_report_monotone(spark, sf_dir):
    docs = catalog.table(spark, sf_dir, "documents")
    pipe = CurationPipeline().quality(0.3).dedup("exact").split("cd")
    report = pipe.survival_report(docs)
    names = [n for n, _ in report]
    assert names == ["input", "quality", "dedup:exact", "split"]
    counts = [c for _, c in report]
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert counts[-1] > 0


def test_survival_report_single_pass_equivalence(spark, sf_dir):
    """The one-action report must equal per-stage .count()s (the old
    eager implementation), including with repeated stage names."""
    docs = catalog.table(spark, sf_dir, "documents")
    pipe = CurationPipeline().quality(0.3).split("cd").split("88")
    report = pipe.survival_report(docs)
    expected = [("input", docs.count())]
    out = docs
    for name, fn in pipe._stages:
        out = fn(out)
        expected.append((name, out.count()))
    assert report == expected
    assert [n for n, _ in report] == ["input", "quality", "split", "split"]


def test_normalize_stage(spark):
    docs = spark.createDataFrame(
        [(1, "Hello,  WORLD!! 123")], "doc_id long, text string"
    )
    out = CurationPipeline().normalize().apply(docs)
    assert out.first()["text"] == "hello world 123"


def test_simhash_dedup_collapses_variants(spark):
    base = "the quick brown fox jumps over the lazy dog " * 3
    docs = spark.createDataFrame(
        [(1, base), (2, base + "extra"), (3, "совершенно другой текст " * 5)],
        "doc_id long, text string",
    )
    out = CurationPipeline().dedup("simhash").apply(docs)
    ids = sorted(r["doc_id"] for r in out.collect())
    # 1 and 2 share a fingerprint (tiny token-weight delta), 3 survives
    assert 3 in ids and 1 in ids and len(ids) <= 2


def test_streaming_curate_cross_batch(spark, tmp_path):
    """Duplicates arriving in LATER batches are dropped by state; the
    quality/length stages apply per batch."""
    from neural_search_spark.pipeline import streaming_curate

    src = str(tmp_path / "src")
    good = (
        "the quick brown fox jumps over the lazy dog and then keeps "
        "running through the quiet field for a while longer"
    )
    spark.createDataFrame(
        [(1, good), (2, "x")], "doc_id long, text string"
    ).coalesce(1).write.parquet(src + "/f1")
    spark.createDataFrame(
        [(3, good), (4, good + " entirely new suffix making it unique")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(src + "/f2")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    pipe = CurationPipeline().length(min_tokens=5).dedup("exact")
    got = []
    q = streaming_curate(
        stream, pipe, lambda df, bid: got.extend(df.collect()), str(tmp_path / "ck")
    )
    q.processAllAvailable()
    q.stop()
    ids = sorted(r["doc_id"] for r in got)
    # 2 fails length; 3 is a cross-batch duplicate of 1; 1 and 4 survive
    assert ids == [1, 4]


def test_model_filter_stage_matches_predict(spark, sf_dir):
    """The pipeline's model_filter must keep exactly the docs
    logreg_predict labels positive at the same threshold."""
    from neural_search_spark import catalog
    from neural_search_spark.operators.classify import (
        logreg_features, logreg_predict, logreg_train,
    )
    from neural_search_spark.pipeline import CurationPipeline

    docs = catalog.table(spark, sf_dir, "documents")
    feats = logreg_features(docs, "lang = 'en'")
    w = logreg_train(feats, rounds=2)
    kept = CurationPipeline().model_filter(w, min_p=0.5).apply(docs)
    want = {
        r["doc_id"]
        for r in logreg_predict(feats, w).where("label_pred = 1").collect()
    }
    assert {r["doc_id"] for r in kept.collect()} == want
