"""Analyzer registry: Column/Python twin parity + end-to-end BM25/sparse
under a non-default analyzer (reference scope:
`query/NeuralSparseQueryBuilder.java:509-552`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neural_search_spark import registry
from neural_search_spark.functions import analyzers as AZ
from neural_search_spark.functions.sparse import tf_postings
from neural_search_spark.plans.compiler import Engine

from .conftest import SF_CORRECT
from .oracle_check import compare

SAMPLES = [
    "Hello, World!",
    "Spárk JOIN—stream, Window!",
    "  spaced   out\ttabs\nnewlines  ",
    "mixed2CASE numbers 42 and café",
    "",
    "!!! ???",
]


@pytest.mark.parametrize("name", sorted(AZ.ANALYZERS))
def test_column_and_python_twins_agree(spark, name):
    """The Column analyzer and analyze_py MUST tokenize identically —
    query-vs-document tokenization parity is the whole contract."""
    df = spark.createDataFrame([(i, s) for i, s in enumerate(SAMPLES)], "i long, t string")
    got = {
        r["i"]: list(r["toks"])
        for r in df.select("i", AZ.analyze(F.col("t"), name).alias("toks")).collect()
    }
    for i, s in enumerate(SAMPLES):
        assert got[i] == AZ.analyze_py(s, name), f"{name}: {s!r}"


def test_fold_normalizes_case_punct_accents():
    assert AZ.analyze_py("Spárk JOIN—stream, Window!", "fold") == [
        "spark", "join", "stream", "window"
    ]
    assert AZ.analyze_py("Café-au-lait", "fold") == ["cafe", "au", "lait"]


def test_stop_en_drops_stopwords():
    assert AZ.analyze_py("The spark AND the join", "stop_en") == ["spark", "join"]


@pytest.mark.parametrize("name", sorted(AZ.ANALYZERS))
def test_sql_twin_agrees_with_python(name):
    """The DuckDB fragment (oracle side) must tokenize exactly like
    analyze_py for every analyzer — this is what makes BM25 oracles
    under non-default analyzers trustworthy."""
    import duckdb

    con = duckdb.connect()
    frag = AZ.sql_tokens(name, col="$1")
    for s in SAMPLES:
        got = con.execute(f"SELECT {frag} AS toks", [s]).fetchone()[0]
        assert list(got) == AZ.analyze_py(s, name), f"{name}: {s!r}"


@pytest.mark.parametrize(
    "word,stem",
    [
        ("tables", "table"),      # plain plural
        ("queries", "query"),     # ies → y
        ("ponies", "pony"),
        ("movies", "movy"),       # Lucene's actual (aggressive) behavior
        ("ties", "ty"),           # [^ae]ies with the minimum 4 chars
        ("species", "specy"),     # c before ies → ies-rule applies
        ("aies", "aies"),         # a before ies → ies-rule declines, [iaoe]es keeps
        ("bus", "bus"),           # us kept
        ("glass", "glass"),       # ss kept
        ("is", "is"),             # too short
        ("its", "it"),            # len 3 strips
        ("goes", "goes"),         # oes kept
        ("sees", "sees"),         # ees kept
        ("makes", "make"),        # consonant+es → default strip
    ],
)
def test_minimal_english_stemmer_rules(word, stem):
    assert AZ.stem_token_py(word) == stem


def test_edge_ngram_and_shingle_py():
    assert AZ.analyze_py("spark x", "edge_ngram") == ["sp", "spa", "spar", "spark"]
    assert AZ.analyze_py("a b c", "shingle") == ["a", "b", "c", "a b", "b c"]
    assert AZ.analyze_py("solo", "shingle") == ["solo"]


def test_unknown_analyzer_raises(spark):
    with pytest.raises(ValueError, match="unknown analyzer"):
        AZ.analyze_py("x", "nope")
    with pytest.raises(ValueError, match="unknown analyzer"):
        AZ.analyze(F.lit("x"), "nope")


def test_tf_postings_analyzer_param(spark):
    docs = spark.createDataFrame([(1, "Spark! spark JOIN.")], "doc_id long, text string")
    default = {
        (r["token"], r["weight"]) for r in tf_postings(docs).collect()
    }
    std = {
        (r["token"], r["weight"])
        for r in tf_postings(docs, analyzer="standard").collect()
    }
    assert ("Spark!", 1.0) in default  # whitespace keeps punctuation/case
    assert std == {("spark", 2.0), ("join", 1.0)}


def test_bm25_folded_oracle_parity(spark):
    df = registry.q_bm25_match_folded(spark, SF_CORRECT)
    ok, msg = compare(df, registry.ORACLES["bm25_match_folded"], SF_CORRECT)
    assert ok, msg


def test_compiler_match_with_analyzer(spark, sf_dir):
    """End-to-end through the DSL: `match` + analyzer finds docs the
    whitespace tokenizer cannot (query carries case/punct/accents)."""
    eng = Engine(spark, sf_dir)
    out = eng.search(
        {"match": {"field": "text", "query": "Spárk, JOIN!", "analyzer": "fold"}},
        size=5,
    )
    rows = out.collect()
    assert len(rows) == 5
    assert rows[0]["score"] > 0


def test_compiler_match_search_analyzer(spark, sf_dir):
    """DSL `search_analyzer`: edge-ngram index + standard query —
    a partial word ('spar') retrieves docs containing 'spark'."""
    eng = Engine(spark, sf_dir)
    out = eng.search(
        {"match": {"field": "text", "query": "spar",
                   "analyzer": "edge_ngram", "search_analyzer": "standard"}},
        size=5,
    )
    rows = out.collect()
    assert len(rows) == 5 and rows[0]["score"] > 0
    # sanity: plain standard analyzer finds nothing for the partial word
    none = eng.search(
        {"match": {"field": "text", "query": "spar", "analyzer": "standard"}},
        size=5,
    )
    assert none.count() == 0


def test_compiler_sparse_with_analyzer(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    out = eng.search(
        {"neural_sparse": {"query_text": "SPARK—join", "analyzer": "standard"}},
        size=5,
    )
    assert len(out.collect()) == 5
