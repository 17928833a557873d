"""Property gates for round-4 operators: phrase matching equals a
naive text scan, weighted sampling tracks weights, PMI matches a
direct computation."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from neural_search_spark.operators.bm25 import (
    build_bm25,
    build_positional,
    phrase_topk,
)


def _phrase_tf_naive(text: str, phrase: list[str]) -> int:
    toks = [t for t in text.lower().split() if t]
    m = len(phrase)
    return sum(1 for i in range(len(toks) - m + 1) if toks[i : i + m] == phrase)


def test_phrase_matches_naive_scan(spark):
    rng = random.Random(7)
    vocab = ["a", "b", "c", "d", "e"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
        for i in range(200)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    phrase = ["a", "b", "a"]
    pos = build_positional(docs)
    idx = build_bm25(docs)
    got = {
        r["doc_id"]
        for r in phrase_topk(pos, idx, " ".join(phrase), k=1000).collect()
    }
    want = {i for i, t in rows if _phrase_tf_naive(t, phrase) > 0}
    assert got == want

    # scores are monotone in phrase tf for equal doc length
    same_len = [(1000, "a b a x y"), (1001, "a b a a b a".replace("  ", " "))]
    docs2 = spark.createDataFrame(rows + same_len, "doc_id long, text string")
    out = {
        r["doc_id"]: r["score"]
        for r in phrase_topk(
            build_positional(docs2), build_bm25(docs2), "a b a", k=1000
        ).collect()
    }
    assert out[1001] > out[1000]


def test_weighted_sample_tracks_weights(spark, sf_dir):
    """Efraimidis–Spirakis: docs with weight w should appear in the
    sample roughly proportionally to w. Gate loosely: the mean n_chars
    of the sample must exceed the corpus mean (long docs favored)."""
    from neural_search_spark import registry

    sample = registry.q_sample_weighted(spark, sf_dir)
    mean_sample = sample.agg(F.avg("n_chars")).first()[0]
    mean_corpus = (
        registry.catalog.table(spark, sf_dir, "documents").agg(F.avg("n_chars")).first()[0]
    )
    assert mean_sample > mean_corpus


def test_pmi_matches_direct(spark):
    docs = spark.createDataFrame(
        [(1, "x y x y z"), (2, "x y q"), (3, "z z x")],
        "doc_id long, text string",
    )
    from neural_search_spark import registry as R

    # run the same plan shape as the registry query on a local frame
    import neural_search_spark.registry as reg

    orig = reg.catalog.table

    class _Fake:
        pass

    def fake_table(spark_, sf_dir_, name):
        assert name == "documents"
        return docs

    reg.catalog.table = fake_table
    try:
        got = {
            (r["w1"], r["w2"]): (r["c_xy"], r["pmi"])
            for r in reg.q_text_bigram_pmi(spark, "ignored").collect()
        }
    finally:
        reg.catalog.table = orig

    # direct computation
    toks = {1: "x y x y z".split(), 2: "x y q".split(), 3: "z z x".split()}
    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    for t in toks.values():
        for w in t:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(t, t[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    t_uni = sum(uni.values())
    t_bi = sum(bi.values())
    for (a, b), c in bi.items():
        want = round(math.log(c * t_uni * t_uni / (t_bi * uni[a] * uni[b])), 4)
        assert got[(a, b)][0] == c
        assert abs(got[(a, b)][1] - want) < 1e-9


def test_term_suggest_ranking(spark):
    """dist ASC, then doc-freq DESC, then term ASC; input term excluded."""
    from neural_search_spark.operators import bm25 as B

    post = spark.createDataFrame(
        [(1, "stream", 1.0), (2, "stream", 1.0), (1, "steam", 1.0),
         (3, "strem", 1.0), (4, "dream", 1.0), (5, "zzzzzz", 1.0)],
        "doc_id int, token string, tf double",
    )
    rows = B.term_suggest(post, "strem", max_dist=2, k=10).collect()
    # stream: 1 edit (insert 'a'), freq 2; steam: 2 edits, freq 1;
    # dream: 3 edits → excluded; zzzzzz: excluded; 'strem' itself excluded
    assert [(r["suggestion"], r["dist"], r["freq"]) for r in rows] == [
        ("stream", 1, 2),
        ("steam", 2, 1),
    ]


def test_phrase_prefix_single_and_multi(spark):
    """Prefix-only phrase counts all prefix-token occurrences; two-term
    phrase requires adjacency with prefix expansion on the last term."""
    from neural_search_spark.operators import bm25 as B

    docs = spark.createDataFrame(
        [(1, "join window join windfall"), (2, "window join"), (3, "join other")],
        "doc_id long, text string",
    )
    idx = B.build_bm25(docs)
    pos = B.build_positional(docs)
    two = {r["doc_id"] for r in
           B.phrase_prefix_topk(pos, idx, "join win", k=10).collect()}
    assert two == {1}  # doc1: join→window AND join→windfall; doc2 no adjacency
    one = {r["doc_id"] for r in
           B.phrase_prefix_topk(pos, idx, "win", k=10).collect()}
    assert one == {1, 2}


def test_phrase_prefix_compiler_dispatch(spark):
    from neural_search_spark import registry
    from neural_search_spark.plans.compiler import Engine
    from .conftest import SF_SMOKE

    eng = Engine(spark, SF_SMOKE)
    out = eng.search({"match_phrase_prefix": {"query": registry.PHRASE_PREFIX_QUERY}})
    reg = registry.q_match_phrase_prefix(spark, SF_SMOKE)
    assert [r["doc_id"] for r in out.collect()] == [r["doc_id"] for r in reg.collect()]
