"""Gopher quality/repetition rules (Rae et al. 2021, Appendix A1.1)
on crafted documents — the synthetic corpus never exercises the
dup-5..10-gram branch (random text repeats no 5-gram), so these
planted docs pin the semantics the oracle parity test can't reach."""

from neural_search_spark.registry import (
    gopher_quality_frame,
    gopher_repetition_frame,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_quality_rules_planted(spark):
    good = " ".join(
        ["the quick brown fox jumps over lazy dogs and cats with glee"] * 5
    )  # 60 words, mean len ~4, 'the'+'and'+'with' stopwords
    short = "too short to pass"  # word-count floor
    symbols = " ".join(["#tag ..."] * 30)  # symbol ratio 1.0
    out = {
        r["doc_id"]: r
        for r in gopher_quality_frame(
            _docs(spark, [(1, good), (2, short), (3, symbols)])
        ).collect()
    }
    assert out[1]["rule_words"] and out[1]["rule_wlen"] and out[1]["rule_stop"]
    assert out[1]["keep_gopher"]
    assert out[1]["stop_hits"] >= 3
    assert not out[2]["rule_words"] and not out[2]["keep_core"]
    assert out[3]["rule_words"]  # 60 words
    assert not out[3]["rule_symbol"] and not out[3]["keep_core"]
    assert out[3]["symbol_ratio"] == 1.0


def test_repetition_fractions_planted(spark):
    # doc 1: a 5-word phrase repeated 12x — every 5-gram window that
    # equals the phrase occurs 12 times, so dup5_frac is large and the
    # doc fails the 0.15 ceiling; doc 2: all-distinct words, top2_frac
    # is one 2-gram's chars / doc chars, and every dup fraction is 0
    phrase = "alpha beta gamma delta epsilon"
    rep = " ".join([phrase] * 12)
    uniq = " ".join(f"w{i:03d}" for i in range(60))
    out = {
        r["doc_id"]: r
        for r in gopher_repetition_frame(
            _docs(spark, [(1, rep), (2, uniq)])
        ).collect()
    }
    assert out[1]["dup5_frac"] > 0.15
    assert out[1]["dup10_frac"] > 0.10
    assert out[1]["top2_frac"] > 0.20
    assert not out[1]["rep_keep"]
    for n in range(5, 11):
        assert out[2][f"dup{n}_frac"] == 0.0
    assert out[2]["rep_keep"]


def test_repetition_short_doc_survives(spark):
    # a 1-word doc produces no 2-gram at all; the left join keeps it
    # with all-zero fractions and rep_keep true
    out = gopher_repetition_frame(_docs(spark, [(1, "solo")])).collect()
    assert len(out) == 1
    assert out[0]["top2_frac"] == 0.0 and out[0]["rep_keep"]


def test_quality_boundary_inclusive(spark):
    # Rae et al. A1.1 REMOVES docs with symbol ratio > 0.1 / alpha
    # fraction < 0.8 — a doc sitting EXACTLY on either boundary is kept.
    # 60 words + 6 '#' chars appended to the last word: 6/60 == 0.1
    words = ("the quick brown fox jumps over lazy dogs and cats with glee "
             * 5).split()
    assert len(words) == 60
    words_sym = words[:-1] + [words[-1] + "######"]
    doc_sym = " ".join(words_sym)
    # 48 alphabetic words + 12 digit-only words: 48/60 == 0.8
    words_alpha = words[:48] + [str(100 + i) for i in range(12)]
    doc_alpha = " ".join(words_alpha)
    out = {
        r["doc_id"]: r
        for r in gopher_quality_frame(
            _docs(spark, [(1, doc_sym), (2, doc_alpha)])
        ).collect()
    }
    assert out[1]["symbol_ratio"] == 0.1
    assert out[1]["rule_symbol"], "symbol_ratio == 0.1 must be kept (<=)"
    assert out[2]["alpha_frac"] == 0.8
    assert out[2]["rule_alpha"], "alpha_frac == 0.8 must be kept (>=)"


def test_repetition_output_globally_sorted(spark):
    # the contract guarantees ORDER BY doc_id; the input sort + 1:1
    # kernel + sortWithinPartitions must survive a multi-partition,
    # shuffled-input frame (ids inserted in reverse order)
    rows = [(int(i), f"tok{i} " * 8) for i in range(499, -1, -1)]
    df = _docs(spark, rows).repartition(8)
    got = [r["doc_id"] for r in gopher_repetition_frame(df).collect()]
    assert got == sorted(got)
