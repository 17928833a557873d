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


ANALYZERS = {
    "whitespace": _whitespace,
    "lowercase": _lowercase,
    "standard": _standard,
    "fold": _fold,
    "stop_en": _stop_en,
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
    return toks
