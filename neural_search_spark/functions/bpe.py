"""Byte-pair-encoding tokenizer, trained and applied distributively.

A 100 TB training-data pipeline needs REAL token counts (sequence
packing budgets, mixture weights, billing) — not the len/4 estimate.
BPE's two phases map onto Spark cleanly:

- **Train** (ingest-time): the classic merge loop, but over the
  *word-frequency table* — one distributed agg collapses the corpus to
  its vocabulary (|vocab| ≪ corpus; Zipf makes this table tiny next to
  the text it summarizes), then each merge round is one small agg over
  that cached frame: count adjacent symbol pairs weighted by word
  frequency, take the argmax, rewrite the symbolization. N merges =
  N cheap jobs over the vocab frame — the corpus is read exactly once.

- **Encode** (query/scan-time): the learned merges become a chain of
  LITERAL `replace` calls over a space-delimited symbolization
  (' h e l l o ' → merge 'l l' = replace(' l l ', ' ll ')) — pure
  whole-stage-codegen string ops, no Python in the hot path, no
  broadcast state beyond the expression tree itself. Sentinel spaces on
  both ends make every symbol space-delimited, so a literal pair
  pattern can never straddle two symbols ('x ab b' does NOT contain
  ' b b '), and left-to-right non-overlapping `replace` semantics are
  identical across Spark, DuckDB, and Java — the merge application is
  bit-reproducible cross-engine.

Merge convention (engine-portable, documented divergence): one
`replace` pass per merge round, left-to-right and non-overlapping,
where a match consumes its right delimiter — so within a run of the
same pair ('b b b b') a single round merges left-anchored occurrences
only; the leftovers merge in later rounds if the pair stays
top-ranked. Canonical BPE merges all non-overlapping occurrences per
round; the two agree everywhere except immediate repeats of the
currently-merged pair, and the portable convention is bit-identical
across Spark / DuckDB / Java replace semantics — which is what makes
the cross-engine hash gate possible.

The same symbolize/merge algebra is mechanically unrolled into CTEs by
`registry.ORACLES["bpe_token_count"]`, so the whole
tokenizer-train-then-encode pipeline is hash-checked against DuckDB.

Reference scope: the reference delegates tokenization to Lucene
analyzers and ML tokenizers inside the model server
(`ml/MLCommonsClientAccessor.java` inference calls); a subword
tokenizer trained *on the indexed corpus itself* is part of this
engine's training-data surface (SURVEY §2 "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def symbolize(word: Column) -> Column:
    """' h e l l o ' — one space between symbols, sentinel spaces at
    both ends (every symbol is space-delimited, see module doc)."""
    return F.concat(F.lit(" "), F.regexp_replace(word, "(.)", "$1 "))


def pair_counts(words: DataFrame, sym_col: str = "sym", wc_col: str = "wc") -> DataFrame:
    """(pair, cnt): adjacent-symbol pairs weighted by word frequency.

    Overlapping occurrences count (standard BPE convention: the pair
    frequency of [b,b,b] is 2) — identical zip-adjacent counting on
    the oracle side keeps the argmax cross-engine deterministic."""
    syms = F.split(F.trim(F.col(sym_col)), " ")
    n = F.size(syms)
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice(syms, 1, n - 1),
            F.slice(syms, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array())
    return (
        words.select(F.explode(pairs).alias("pair"), F.col(wc_col))
        .groupBy("pair")
        .agg(F.sum(wc_col).alias("cnt"))
    )


def train_merges(words: DataFrame, n_merges: int) -> list[str]:
    """Learn `n_merges` BPE merges from a (w, wc) word-frequency frame.

    Each round: one agg over the cached vocab frame + a 1-row collect
    (argmax by cnt DESC, pair ASC — exact integer counts, so the
    tie-break is engine-independent), then the symbolization column is
    rewritten with the literal merge. Returns merges as 'a b' pair
    strings in learned order.
    """
    vocab = words.select(
        "w", "wc", symbolize(F.col("w")).alias("sym")
    ).persist()
    vocab.count()
    merges: list[str] = []
    for _ in range(n_merges):
        top = (
            pair_counts(vocab)
            .orderBy(F.col("cnt").desc(), F.col("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair = top[0]["pair"]
        merges.append(pair)
        nxt = vocab.select(
            "w", "wc", merge_expr(F.col("sym"), pair).alias("sym")
        ).persist()
        nxt.count()
        vocab.unpersist()
        vocab = nxt
    vocab.unpersist()
    return merges


def merge_expr(sym: Column, pair: str) -> Column:
    """Apply one merge: literal replace of ' a b ' with ' ab '."""
    a, b = pair.split(" ")
    return F.replace(sym, F.lit(f" {a} {b} "), F.lit(f" {a}{b} "))


def encode_symbols(word: Column, merges: list[str]) -> Column:
    """`word`'s BPE symbol sequence (array<string>, in order) after
    applying `merges` — the replace chain as pure string expressions."""
    sym = symbolize(word)
    for pair in merges:
        sym = merge_expr(sym, pair)
    return F.split(F.trim(sym), " ")


def encode_token_count(word: Column, merges: list[str]) -> Column:
    """Symbols remaining in `word` after applying `merges` in order —
    the word's BPE token count, as a pure codegen expression chain."""
    return F.size(encode_symbols(word, merges))


def doc_token_count(tokens_col: Column, merges: list[str]) -> Column:
    """Σ per-word BPE token counts over a document's token array."""
    return F.aggregate(
        F.transform(tokens_col, lambda w: encode_token_count(w, merges)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
