"""Analyzer registry: named tokenization pipelines for text fields.

The reference's analyzer-based sparse query accepts arbitrary Lucene
analyzers producing tokens (± payload weights)
(`query/NeuralSparseQueryBuilder.java:509-552`); BM25/match/phrase run
through the index analyzer the same way. This registry is the Spark
analogue: each analyzer is a pure Column→Column expression (JVM-side,
codegen-friendly — no UDFs), with a matching driver-side Python
implementation for query strings, so document and query tokenization
can never diverge.

Analyzers (all deterministic and mirrored in the DuckDB oracles):
  whitespace — split on \\s+, case preserved (the engine default)
  lowercase  — whitespace + lowercase
  standard   — lowercase + split on any non-alphanumeric run
               (Lucene StandardAnalyzer-ish, ASCII scope)
  fold       — standard + latin accent folding (ICU-fold-ish)
  stop_en    — standard + English stopword removal
  stem_en    — standard + minimal English plural stemmer
               (Lucene EnglishMinimalStemFilter semantics)
  edge_ngram — standard + edge n-grams, min 2 max 5 (search-as-you-
               type index side; pair with search_analyzer=standard)
  shingle    — standard + adjacent word bigrams ("a b") alongside
               unigrams (Lucene ShingleFilter defaults)
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# latin-1 accent folding table (applied char-for-char: translate)
FOLD_SRC = "áàâäãåéèêëíìîïóòôöõúùûüñçýÿ"
FOLD_DST = "aaaaaaeeeeiiiiooooouuuuncyy"

_EN_STOP_SMALL = (
    "a an and are as at be by for from has he in is it its of on that the to was were will with"
).split()


def _nonempty(arr: Column) -> Column:
    return F.filter(arr, lambda t: t != "")


def _whitespace(c: Column) -> Column:
    return _nonempty(F.split(c, r"\s+"))


def _lowercase(c: Column) -> Column:
    return _whitespace(F.lower(c))


def _standard(c: Column) -> Column:
    # explicit ASCII class (not \p{L}) so the DuckDB oracle regex is
    # character-for-character identical
    return _nonempty(F.split(F.lower(c), "[^a-z0-9]+"))


def _fold(c: Column) -> Column:
    return _standard(F.translate(F.lower(c), FOLD_SRC, FOLD_DST))


def _stop_en(c: Column) -> Column:
    stops = F.array(*[F.lit(w) for w in _EN_STOP_SMALL])
    return F.filter(_standard(c), lambda t: ~F.array_contains(stops, t))


# EnglishMinimalStemFilter semantics (public Lucene algorithm,
# analysis/en/EnglishMinimalStemmer): strip a plural 's' unless the
# word ends us/ss; "Xies" → "Xy" when the char before 'i' is not a/e;
# other vowel+"es" endings (ies/aes/oes/ees reached when the ies-rule
# declined) stay unchanged. Expressed three ways (Column / Python /
# DuckDB SQL) that MUST stay rule-for-rule identical.
EDGE_NGRAM_MIN, EDGE_NGRAM_MAX = 2, 5
SHINGLE_SEP = " "


def _stem_token(t: Column) -> Column:
    return (
        F.when(
            (F.length(t) < 3) | ~t.rlike("s$") | t.rlike("(us|ss)$"), t
        )
        .when(t.rlike("[^ae]ies$"), F.regexp_replace(t, "ies$", "y"))
        .when(t.rlike("[iaoe]es$"), t)
        .otherwise(F.regexp_replace(t, "s$", ""))
    )


def _stem_en(c: Column) -> Column:
    return F.transform(_standard(c), _stem_token)


def _edge_ngram(c: Column) -> Column:
    """Per standard token, emit prefixes of length EDGE_NGRAM_MIN..
    min(EDGE_NGRAM_MAX, len) — tokens shorter than the min emit
    nothing (Lucene EdgeNGramTokenFilter contract)."""
    empty = F.array().cast("array<string>")

    def grams(t: Column) -> Column:
        ns = F.sequence(
            F.lit(EDGE_NGRAM_MIN), F.least(F.lit(EDGE_NGRAM_MAX), F.length(t))
        )
        return F.when(
            F.length(t) >= EDGE_NGRAM_MIN,
            F.transform(ns, lambda n: t.substr(F.lit(1), n)),
        ).otherwise(empty)

    return F.flatten(F.transform(_standard(c), grams))


def _shingle(c: Column) -> Column:
    """Unigrams + adjacent bigrams joined by a space (ShingleFilter
    defaults: max_shingle_size=2, output_unigrams=true)."""
    toks = _standard(c)
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(SHINGLE_SEP), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


ANALYZERS = {
    "whitespace": _whitespace,
    "lowercase": _lowercase,
    "standard": _standard,
    "fold": _fold,
    "stop_en": _stop_en,
    "stem_en": _stem_en,
    "edge_ngram": _edge_ngram,
    "shingle": _shingle,
}


def analyze(text_col: Column, analyzer: str = "whitespace") -> Column:
    """text → array<string> tokens under the named analyzer."""
    try:
        return ANALYZERS[analyzer](text_col)
    except KeyError:
        raise ValueError(
            f"unknown analyzer: {analyzer!r} (have {sorted(ANALYZERS)})"
        ) from None


def analyze_py(text: str, analyzer: str = "whitespace") -> list[str]:
    """Driver-side twin of `analyze` for query strings — MUST stay
    behaviorally identical to the Column version (tested token-for-token
    in tests/test_analyzers.py)."""
    if analyzer not in ANALYZERS:
        raise ValueError(
            f"unknown analyzer: {analyzer!r} (have {sorted(ANALYZERS)})"
        )
    if analyzer == "whitespace":
        return [t for t in re.split(r"\s+", text) if t]
    if analyzer == "lowercase":
        return [t for t in re.split(r"\s+", text.lower()) if t]
    lowered = text.lower()
    if analyzer == "fold":
        lowered = lowered.translate(str.maketrans(FOLD_SRC, FOLD_DST))
    toks = [t for t in re.split("[^a-z0-9]+", lowered) if t]
    if analyzer == "stop_en":
        toks = [t for t in toks if t not in _EN_STOP_SMALL]
    elif analyzer == "stem_en":
        toks = [stem_token_py(t) for t in toks]
    elif analyzer == "edge_ngram":
        toks = [
            t[:n]
            for t in toks
            if len(t) >= EDGE_NGRAM_MIN
            for n in range(EDGE_NGRAM_MIN, min(EDGE_NGRAM_MAX, len(t)) + 1)
        ]
    elif analyzer == "shingle":
        toks = toks + [
            a + SHINGLE_SEP + b for a, b in zip(toks, toks[1:])
        ]
    return toks


def stem_token_py(t: str) -> str:
    """Python twin of `_stem_token` (rule-for-rule)."""
    if len(t) < 3 or not t.endswith("s") or t.endswith(("us", "ss")):
        return t
    if re.search("[^ae]ies$", t):
        return t[:-3] + "y"
    if re.search("[iaoe]es$", t):
        return t
    return t[:-1]


# -- DuckDB SQL twins (oracle side) ----------------------------------------
# Registry oracles splice these fragments so document tokenization in
# SQL is expression-for-expression the analyzers above.


def sql_tokens(analyzer: str, col: str = "text") -> str:
    """DuckDB expression producing the analyzer's token list."""
    std = (
        f"list_filter(regexp_split_to_array(lower({col}), '[^a-z0-9]+'),"
        " t -> t != '')"
    )
    if analyzer == "whitespace":
        return (
            f"list_filter(regexp_split_to_array({col}, '\\s+'), t -> t != '')"
        )
    if analyzer == "lowercase":
        return (
            f"list_filter(regexp_split_to_array(lower({col}), '\\s+'), t -> t != '')"
        )
    if analyzer == "standard":
        return std
    if analyzer == "fold":
        return (
            "list_filter(regexp_split_to_array("
            f"translate(lower({col}), '{FOLD_SRC}', '{FOLD_DST}'), "
            "'[^a-z0-9]+'), t -> t != '')"
        )
    if analyzer == "stop_en":
        stops = ", ".join(f"'{w}'" for w in _EN_STOP_SMALL)
        return f"list_filter({std}, t -> t NOT IN ({stops}))"
    if analyzer == "stem_en":
        return (
            f"list_transform({std}, t -> CASE"
            " WHEN length(t) < 3 OR NOT regexp_matches(t, 's$')"
            " OR regexp_matches(t, '(us|ss)$') THEN t"
            " WHEN regexp_matches(t, '[^ae]ies$') THEN regexp_replace(t, 'ies$', 'y')"
            " WHEN regexp_matches(t, '[iaoe]es$') THEN t"
            " ELSE regexp_replace(t, 's$', '') END)"
        )
    if analyzer == "edge_ngram":
        lo, hi = EDGE_NGRAM_MIN, EDGE_NGRAM_MAX
        return (
            f"flatten(list_transform({std}, t -> CASE"
            f" WHEN length(t) >= {lo}"
            f" THEN list_transform(range({lo}, least({hi}, length(t)) + 1),"
            " n -> substr(t, 1, CAST(n AS INT)))"
            " ELSE [] END))"
        )
    if analyzer == "shingle":
        return (
            f"list_concat({std}, CASE WHEN len({std}) >= 2"
            f" THEN list_transform(range(1, len({std})),"
            f" i -> {std}[CAST(i AS INT)] || '{SHINGLE_SEP}' || {std}[CAST(i AS INT) + 1])"
            " ELSE [] END)"
        )
    raise ValueError(f"no SQL twin for analyzer {analyzer!r}")
