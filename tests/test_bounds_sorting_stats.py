"""min_max bounds, K2 sort/search_after, stats, SEISMIC rebuild,
hybrid-filter pushdown."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neural_search_spark import catalog, stats as ST
from neural_search_spark.operators import fusion as FU
from neural_search_spark.operators.sorting import sort_by_fields
from neural_search_spark.plans.compiler import Engine


def _sub(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, score double")


def _norm(spark, rows, lower=None, upper=None):
    u = FU.union_subqueries([_sub(spark, rows)])
    n = FU.normalize(u, "min_max", lower_bounds=lower, upper_bounds=upper)
    return {r["doc_id"]: r["norm_score"] for r in n.collect()}


def test_lower_bound_apply(spark):
    # scores [0.1, 0.5, 0.9]; lower apply 0.3: for scores > 0.3 the
    # effective min is the bound; for 0.1 the true min applies
    out = _norm(spark, [(1, 0.1), (2, 0.5), (3, 0.9)], lower=[{"mode": "apply", "score": 0.3}])
    assert out[3] == pytest.approx((0.9 - 0.3) / (0.9 - 0.3))  # 1.0
    assert out[2] == pytest.approx((0.5 - 0.3) / (0.9 - 0.3))
    assert out[1] == pytest.approx(0.001)  # (0.1-0.1)/(0.9-0.1) = 0 → floor


def test_lower_bound_clip(spark):
    # clip mode: scores below the bound clamp to MIN_SCORE
    out = _norm(spark, [(1, 0.1), (2, 0.5), (3, 0.9)], lower=[{"mode": "clip", "score": 0.3}])
    assert out[1] == pytest.approx(0.001)
    assert out[2] == pytest.approx((0.5 - 0.3) / (0.9 - 0.3))


def test_upper_bound_clip(spark):
    # scores above the bound clamp to 1.0
    out = _norm(spark, [(1, 0.1), (2, 0.5), (3, 0.9)], upper=[{"mode": "clip", "score": 0.8}])
    assert out[3] == pytest.approx(1.0)
    assert out[2] == pytest.approx((0.5 - 0.1) / (0.8 - 0.1))


def test_bounds_ignore_mode_is_noop(spark):
    plain = _norm(spark, [(1, 0.1), (2, 0.9)])
    ignored = _norm(
        spark,
        [(1, 0.1), (2, 0.9)],
        lower=[{"mode": "ignore", "score": 0.3}],
        upper=[{"mode": "ignore", "score": 0.8}],
    )
    assert plain == ignored


def test_sort_by_fields_and_search_after(spark, sf_dir):
    docs = catalog.table(spark, sf_dir, "documents")
    fused = docs.select("doc_id", F.lit(1.0).alias("score")).limit(100)
    page1 = sort_by_fields(fused, docs, [("n_chars", False), ("doc_id", True)], k=5)
    rows1 = page1.collect()
    lens = [r["n_chars"] for r in rows1]
    assert lens == sorted(lens, reverse=True)
    after = [rows1[-1]["n_chars"], rows1[-1]["doc_id"]]
    page2 = sort_by_fields(
        fused, docs, [("n_chars", False), ("doc_id", True)], k=5, search_after=after
    )
    rows2 = page2.collect()
    # no overlap, and ordering continues
    assert {r["doc_id"] for r in rows1}.isdisjoint({r["doc_id"] for r in rows2})
    assert rows2[0]["n_chars"] <= rows1[-1]["n_chars"]


def test_hybrid_filter_pushdown_all_subqueries(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    flt = "n_chars >= 300"
    out = eng.search(
        {
            "hybrid": {
                "queries": [
                    {"neural": {"query_text": "spark join"}},
                    {"neural_sparse": {"query_text": "spark join window"}},
                    {"match": {"field": "text", "query": "spark join"}},
                ],
                "filter": flt,
                "pagination_depth": 30,
            }
        }
    )
    allowed = {r["doc_id"] for r in eng.documents().where(flt).collect()}
    got = {r["doc_id"] for r in out.collect()}
    assert got and got <= allowed


def test_stats_accumulators_and_warmup(spark, sf_dir):
    st = ST.EngineStats(spark)
    docs = catalog.table(spark, sf_dir, "documents")
    counted = st.count_rows(docs, "ingest.docs")
    n = counted.count()
    assert st.snapshot()["ingest.docs"] == n == docs.count()
    info = ST.corpus_stats(docs)
    assert info["docs"] == n and info["avg_chars"] > 0
    ST.warmup(docs)
    ST.clear_cache(spark)


def test_seismic_merge_rebuild_includes_new_docs(spark):
    from neural_search_spark.operators import seismic as SE

    base = spark.createDataFrame(
        [(i, "tok", 2.0) for i in range(20)], "doc_id long, token string, weight double"
    )
    new = spark.createDataFrame(
        [(100, "tok", 3.0)], "doc_id long, token string, weight double"
    )
    idx = SE.merge_rebuild(base, new)
    hits = SE.seismic_search(idx, {"tok": 3.0}, k=5)
    assert 100 in {r["doc_id"] for r in hits.collect()}


def test_agentic_context_exposed(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    eng.search({"agentic": {"query_text": "exact keyword search for spark"}}).collect()
    ctx = eng.last_agent_context
    assert ctx["question"].startswith("exact")
    assert "match" in ctx["dsl_query"]


def test_fuzzy_topk_expansion_and_weighting(spark):
    from neural_search_spark.operators import bm25 as B

    post = spark.createDataFrame(
        [(1, "spark", 2.0), (1, "spak", 1.0), (2, "spork", 3.0), (3, "zzz", 9.0)],
        "doc_id long, token string, weight double",
    )
    out = {r["doc_id"]: r["score"] for r in B.fuzzy_topk(post, "spak", 2).collect()}
    # dists: spak=0 (w 3), spark=1 (w 2), spork=2 (w 1); zzz excluded
    assert out == {1: 2.0 * 2 + 1.0 * 3, 2: 3.0 * 1}


def test_prefix_suggest_ranks_by_doc_freq(spark):
    from neural_search_spark.operators import bm25 as B

    post = spark.createDataFrame(
        [(1, "spark", 1.0), (2, "spark", 1.0), (1, "spot", 1.0), (2, "zebra", 1.0)],
        "doc_id long, token string, weight double",
    )
    rows = B.prefix_suggest(post, "sp", k=5).collect()
    assert [(r["token"], r["doc_freq"]) for r in rows] == [("spark", 2), ("spot", 1)]


def test_more_like_this_excludes_source_and_ranks(spark):
    from neural_search_spark.operators import bm25 as B

    # doc 1 is the source; doc 2 shares its rare term (idf ln2=.693),
    # doc 3 only the common one (idf ln(4/3)=.288 × tf 2 = .575 <
    # doc 2's .981) → 2 outranks 3, and the source never appears
    post = spark.createDataFrame(
        [(1, "rare", 2.0), (1, "common", 1.0),
         (2, "rare", 1.0), (2, "common", 1.0),
         (3, "common", 2.0), (4, "other", 1.0)],
        "doc_id long, token string, weight double",
    )
    rows = B.more_like_this_topk(post, 1, max_terms=5, k=10).collect()
    ids = [r["doc_id"] for r in rows]
    assert 1 not in ids
    assert ids[0] == 2
    scores = {r["doc_id"]: r["score"] for r in rows}
    import math
    assert abs(scores[2] - (math.log(2.0) + math.log(4 / 3))) < 1e-9
    assert abs(scores[3] - 2 * math.log(4 / 3)) < 1e-9


# -- script sort + missing-value placement ----------------------------------


def test_sort_by_script_orders_by_expression(spark):
    from neural_search_spark.operators.sorting import sort_by_script

    results = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0)], "doc_id long, score double"
    )
    corpus = spark.createDataFrame(
        [(1, 10), (2, 25), (3, 17)], "doc_id long, n long"
    )
    out = sort_by_script(results, corpus, "n % 7", ascending=True, k=3).collect()
    # n%7: doc1→3, doc2→4, doc3→3 — asc, ties by doc_id
    assert [r["doc_id"] for r in out] == [1, 3, 2]


def test_sort_missing_placement(spark):
    from neural_search_spark.operators.sorting import sort_by_fields

    results = spark.createDataFrame(
        [(1, 1.0), (2, 1.0), (3, 1.0)], "doc_id long, score double"
    )
    corpus = spark.createDataFrame(
        [(1, 5), (2, None), (3, 9)], "doc_id long, v int"
    )
    first = [r["doc_id"] for r in sort_by_fields(
        results, corpus, [("v", True)], k=3, missing={"v": "_first"}
    ).collect()]
    last = [r["doc_id"] for r in sort_by_fields(
        results, corpus, [("v", True)], k=3, missing={"v": "_last"}
    ).collect()]
    assert first == [2, 1, 3]
    assert last == [1, 3, 2]
