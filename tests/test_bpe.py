"""BPE tokenizer: merge learning, encode counts, the documented
run-merge convention, and oracle parity for the registry query."""

from __future__ import annotations

from pyspark.sql import functions as F

from neural_search_spark import registry
from neural_search_spark.functions import bpe as BP

from .conftest import SF_SMOKE
from .oracle_check import compare


def _words(spark, rows):
    return spark.createDataFrame(rows, "w string, wc long")


def test_train_merges_picks_top_pair(spark):
    # 'ab' appears 3× (weighted), 'bc' 2× — first merge must be 'a b'
    words = _words(spark, [("abc", 2), ("ab", 1)])
    merges = BP.train_merges(words, 1)
    assert merges == ["a b"]


def test_train_merges_grows_symbols(spark):
    # after merging 'a b', the pair ('ab', 'c') exists and can win
    words = _words(spark, [("abc", 5)])
    merges = BP.train_merges(words, 2)
    assert merges[0] in ("a b", "b c")
    assert " " in merges[1] and "".join(merges[0].split(" ")) in merges[1]


def test_encode_token_count_basic(spark):
    df = spark.range(1).select(
        BP.encode_token_count(F.lit("hello"), ["l l", "h e"]).alias("n")
    )
    # h e l l o → [he, ll, o] = 3 symbols
    assert df.first()["n"] == 3


def test_encode_run_convention(spark):
    """Documented divergence from canonical BPE: one replace pass per
    round merges runs left-anchored — 'bbbb' under a single 'b b'
    merge becomes [bb, b, b] (3 symbols), not canonical [bb, bb]."""
    df = spark.range(1).select(
        BP.encode_token_count(F.lit("bbbb"), ["b b"]).alias("n")
    )
    assert df.first()["n"] == 3


def test_doc_token_count_sums_words(spark):
    df = spark.range(1).select(
        BP.doc_token_count(
            F.array(F.lit("hello"), F.lit("hell")), ["l l", "h e"]
        ).alias("n")
    )
    # hello → 3, hell → [he, ll] = 2
    assert df.first()["n"] == 5


def test_ties_break_lexicographically(spark):
    # 'ab' and 'cd' both count 1 — 'a b' < 'c d' wins
    words = _words(spark, [("ab", 1), ("cd", 1)])
    assert BP.train_merges(words, 1) == ["a b"]


def test_bpe_token_count_oracle(spark):
    df = registry.q_bpe_token_count(spark, SF_SMOKE)
    ok, msg = compare(df, registry.ORACLES["bpe_token_count"], SF_SMOKE)
    assert ok, msg


def test_bpe_merges_cached(spark):
    registry._bpe_merges(spark, SF_SMOKE)
    m1 = registry._BPE_MERGES_CACHE[SF_SMOKE]
    assert registry._bpe_merges(spark, SF_SMOKE) is m1
