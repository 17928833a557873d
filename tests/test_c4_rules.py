"""C4 heuristic cleaning (Raffel et al. 2020 §2.2) on crafted
documents — the synthetic corpus has no newlines and no terminal
punctuation, so every line/sentence branch needs planted docs; the
oracle-parity case re-runs the driver's own comparison over a corpus
where those branches actually fire."""

import os

import pandas as pd

from neural_search_spark.registry import (
    C4_MIN_SENTENCES,
    c4_quality_frame,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_filters_planted(spark):
    text = (
        "This is a good line.\n"          # kept
        "short.\n"                         # < 3 words → dropped
        "Another fine line here!\n"        # kept
        "no terminal punct\n"              # dropped
        "A javascript line stays out.\n"   # dropped (javascript)
        'Ends with quote "\n'              # kept (end quotation mark)
        "One more sentence. And two more! Right?"  # kept, 3 sentences
    )
    out = c4_quality_frame(_docs(spark, [(1, text)])).collect()[0]
    assert out["n_lines"] == 7
    assert out["n_kept_lines"] == 4
    # kept lines carry . ! . ! ? → 5 punctuation-sentences
    assert out["n_sentences"] == 5
    assert out["keep_c4"]
    kept = out["retained_text"].split("\n")
    assert kept[0] == "This is a good line."
    assert "javascript" not in out["retained_text"]
    assert "no terminal punct" not in out["retained_text"]


def test_page_drop_flags(spark):
    rows = [
        (1, "Lorem Ipsum dolor sit. One. Two. Three. Four. Five."),
        (2, "A curly { brace page. One. Two. Three. Four. Five."),
        (3, "Contains badword1 here. One. Two. Three. Four. Five."),
        (4, "Only two sentences here. Not enough!"),
        (5, "All good and clean text. One. Two. Three. Four. Five."),
    ]
    out = {r["doc_id"]: r for r in c4_quality_frame(_docs(spark, rows)).collect()}
    assert out[1]["has_lorem"] and not out[1]["keep_c4"]
    assert out[2]["has_brace"] and not out[2]["keep_c4"]
    assert out[3]["has_badword"] and not out[3]["keep_c4"]
    assert out[4]["n_sentences"] < C4_MIN_SENTENCES and not out[4]["keep_c4"]
    assert out[5]["keep_c4"]


def test_badword_is_token_not_substring(spark):
    # the paper drops pages containing a bad WORD — "notbadword1ish"
    # contains the placeholder as a substring but is a different token
    out = c4_quality_frame(
        _docs(spark, [(1, "A notbadword1ish token is fine. A. B. C. D. E.")])
    ).collect()[0]
    assert not out["has_badword"]
    assert out["keep_c4"]


def test_empty_and_unkept_docs(spark):
    out = {
        r["doc_id"]: r
        for r in c4_quality_frame(
            _docs(spark, [(1, ""), (2, "no punctuation anywhere at all")])
        ).collect()
    }
    for i in (1, 2):
        assert out[i]["n_kept_lines"] == 0
        assert out[i]["n_sentences"] == 0
        assert out[i]["retained_text"] == ""
        assert not out[i]["keep_c4"]


def test_oracle_parity_on_planted_corpus(spark, tmp_path):
    """The driver's own hash comparison over a corpus where the
    line/sentence branches fire (the synthetic corpus can't reach
    them)."""
    from neural_search_spark import registry
    from tests.oracle_check import compare

    src = "/root/testdata/sf0.001"
    sf = str(tmp_path)
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"]:
        os.symlink(f"{src}/{t}.parquet", f"{sf}/{t}.parquet")
    docs = pd.read_parquet(f"{src}/documents.parquet")
    planted = pd.DataFrame([
        {"doc_id": 900001,
         "text": ("Good line one stays here.\nbad\n"
                  "Line with a javascript call.\n"
                  'Quote-terminated line stands "\n'
                  "Final line. With more! Sentences?"),
         "lang": "en", "source": "planted", "n_chars": 120},
        {"doc_id": 900002,
         "text": "Lorem ipsum dolor sit amet. A. B. C. D. E.",
         "lang": "en", "source": "planted", "n_chars": 42},
        {"doc_id": 900003,
         "text": "Brace { page. A. B. C. D. E.\r\nCR line ends fine too.",
         "lang": "en", "source": "planted", "n_chars": 53},
        {"doc_id": 900004,
         "text": "Tokens with badword2 inside. A. B. C. D. E.",
         "lang": "en", "source": "planted", "n_chars": 43},
    ])
    pd.concat([docs, planted], ignore_index=True).to_parquet(
        f"{sf}/documents.parquet", index=False
    )
    ok, msg = compare(
        registry.SPARK_QUERIES["text_c4_quality"](spark, sf),
        registry.ORACLES["text_c4_quality"],
        sf,
    )
    assert ok, msg


def test_streaming_projection_matches_batch(spark, tmp_path):
    """ordered=False makes the frame a stateless projection — applied
    to a readStream source it must equal the batch run row-for-row
    (same shape as the Gopher/classifier streaming gates)."""
    rows = [
        (1, "Good line stays put.\nshort.\nMore. Fine! Lines? Here. Yes."),
        (2, "Lorem ipsum dolor. A. B. C. D. E."),
        (3, "no punctuation anywhere"),
    ]
    src = str(tmp_path / "src")
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.parquet(src + "/f1")
    expected = sorted(
        (r["doc_id"], r["n_kept_lines"], r["keep_c4"], r["retained_text"])
        for r in c4_quality_frame(df).collect()
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    got: list = []
    q = (
        c4_quality_frame(stream, ordered=False)
        .writeStream.foreachBatch(lambda bdf, bid: got.extend(bdf.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(
        (r["doc_id"], r["n_kept_lines"], r["keep_c4"], r["retained_text"])
        for r in got
    ) == expected


def test_badwords_engine_parameter(spark, tmp_path):
    """round-8: C4_BADWORDS is an engine parameter, not a source
    constant — (a) an explicit ``badwords=`` overrides the flags, (b)
    the session conf ``spark.neural_search.c4.badwords`` plumbs a
    deployment's real LDNOOBW list in without editing source, and (c)
    the oracle derived from the SAME parameter hash-matches the Spark
    frame under the custom list."""
    from neural_search_spark import registry
    from neural_search_spark.registry import (
        C4_BADWORDS_CONF,
        c4_badwords,
        text_c4_quality_oracle_sql,
    )
    from tests.oracle_check import compare

    rows = [(1, "An innocuous custom gate word. A. B. C. D. E."),
            (2, "Totally clean document text. A. B. C. D. E.")]
    df = _docs(spark, rows)
    # (a) explicit parameter: "innocuous" is only bad under the custom list
    out = {r["doc_id"]: r for r in
           c4_quality_frame(df, badwords=("innocuous",)).collect()}
    assert out[1]["has_badword"] and not out[1]["keep_c4"]
    assert not out[2]["has_badword"] and out[2]["keep_c4"]
    # default list: both clean
    assert not any(r["has_badword"] for r in c4_quality_frame(df).collect())
    # (b) session-conf route (comma-separated, whitespace-tolerant)
    spark.conf.set(C4_BADWORDS_CONF, " innocuous , custom ")
    try:
        assert c4_badwords(spark) == ("innocuous", "custom")
        out = {r["doc_id"]: r for r in c4_quality_frame(df).collect()}
        assert out[1]["has_badword"] and not out[2]["has_badword"]
    finally:
        spark.conf.unset(C4_BADWORDS_CONF)
    assert c4_badwords(spark) == registry.C4_BADWORDS
    # (c) oracle derived from the same custom parameter hash-matches
    src = "/root/testdata/sf0.001"
    sf = str(tmp_path)
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"]:
        os.symlink(f"{src}/{t}.parquet", f"{sf}/{t}.parquet")
    docs = pd.read_parquet(f"{src}/documents.parquet")
    custom = (str(docs["text"].iloc[0]).split() or ["zzz"])[0].lower()
    docs.to_parquet(f"{sf}/documents.parquet", index=False)
    from neural_search_spark import catalog
    frame = c4_quality_frame(
        catalog.table(spark, sf, "documents"), badwords=(custom, "it's")
    )
    ok, msg = compare(
        frame, text_c4_quality_oracle_sql((custom, "it's")), sf
    )
    assert ok, msg
