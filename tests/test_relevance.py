"""Gates for relevance analytics: late-interaction MaxSim,
significant terms (JLH), and rank-eval metrics."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from neural_search_spark import catalog, registry
from neural_search_spark.operators import relevance as REL
from neural_search_spark.operators import retrieval as R

from .conftest import SF_CORRECT, SF_SMOKE


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(y * y for y in b))
    return dot / (na * nb)


def test_maxsim_equals_python_reference(spark):
    embs = catalog.table(spark, SF_SMOKE, "embeddings")
    rows = embs.select("vec_id", "embedding").collect()
    qvs = [registry._qvec(spark, SF_SMOKE, i) for i in registry.LATE_QUERY_VEC_IDS]
    # python reference: per doc-group, sum over queries of max cosine
    groups: dict[int, list] = {}
    for r in rows:
        groups.setdefault(r.vec_id // registry.LATE_DOC_GROUP, []).append(r.embedding)
    expect = {
        d: sum(max(_cos(q, v) for v in vecs) for q in qvs)
        for d, vecs in groups.items()
    }
    top = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[: registry.K]
    got = registry.q_late_interaction(spark, SF_SMOKE).collect()
    assert [r.doc_id for r in got] == [d for d, _ in top]
    for r, (_, s) in zip(got, top):
        assert abs(r.score - s) < 1e-3


def test_maxsim_single_query_vector_is_chunk_max(spark):
    """With ONE query vector MaxSim degenerates to R2 chunk-max."""
    embs = catalog.table(spark, SF_SMOKE, "embeddings")
    docs = embs.select(
        F.expr(f"vec_id DIV {registry.LATE_DOC_GROUP}").alias("doc_id"), "embedding"
    )
    qv = registry._qvec(spark, SF_SMOKE)
    li = R.late_interaction_topk(docs, [qv], k=5).collect()
    chunk_scores = docs.select(
        "doc_id",
        R.V.cosine(R.V.as_double(F.col("embedding")), R.V.lit_vector(qv)).alias(
            "score"
        ),
    )
    cm = R.chunk_max_topk(chunk_scores, k=5).collect()
    assert [r.doc_id for r in li] == [r.doc_id for r in cm]
    for a, b in zip(li, cm):
        assert abs(a.score - b.score) < 1e-9


def test_significant_terms_fg_skew(spark):
    # sf0.001 has ~50 docs — the top-50 foreground would be the whole
    # corpus (no skew); use sf0.01 where foreground is a strict subset
    out = registry.q_significant_terms(spark, SF_CORRECT).collect()
    assert 0 < len(out) <= registry.SIG_TOP_N
    n_docs = catalog.table(spark, SF_CORRECT, "documents").count()
    for r in out:
        assert r.fg_df >= registry.SIG_MIN_FG_DF
        assert r.bg_df >= r.fg_df  # foreground ⊆ corpus
        # JLH > 0 ⟺ token over-represented in the foreground
        assert r.score > 0
        assert (r.fg_df / registry.SIG_FG_K) > (r.bg_df / n_docs)
    # descending score order
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True)


def test_rank_eval_bounds_and_self_consistency(spark):
    rows = registry.q_rank_eval(spark, SF_SMOKE).collect()
    assert [r.query_id for r in rows] == sorted(registry.EVAL_QUERY_IDS)
    for r in rows:
        assert 0.0 <= r.ndcg <= 1.0
        assert 0.0 <= r.mrr <= 1.0
        assert 0.0 <= r.recall <= 1.0


def test_rank_eval_perfect_ranking_is_1(spark):
    """A corpus where similarity order puts all relevant docs first
    must score ndcg=mrr=1 and recall=1."""
    qvec = [1.0, 0.0]
    data = [
        (100, qvec, 7),  # the query doc itself — excluded
        (1, [0.9, 0.1], 7),
        (2, [0.8, 0.2], 7),
        (3, [0.1, 0.9], 5),
        (4, [0.0, 1.0], 5),
    ]
    corpus = spark.createDataFrame(data, "doc_id long, embedding array<double>, label int")
    qs = spark.createDataFrame(
        [(100, qvec, 7)], "query_id long, query_vec array<double>, qlabel int"
    )
    out = REL.rank_eval(qs, corpus, depth=4, ndcg_at=3).collect()
    assert len(out) == 1
    r = out[0]
    assert r.ndcg == 1.0 and r.mrr == 1.0 and r.recall == 1.0
