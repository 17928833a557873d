"""Query registry: every implemented operator exposed as
(spark, sf_dir) -> DataFrame, plus the equivalent DuckDB oracle SQL.

Portability rules that make Spark and DuckDB agree bit-for-bit (or to
the 4-decimal rounding applied to float scores):
- all float arithmetic in double precision with the SAME expression
  shape on both sides (sequential-fold dot products, identical CASE
  chains);
- sparse weights are term frequencies (integers in doubles → exact);
- hashing uses md5 hex strings (identical in both engines);
- every score column is `round(x, 4)`; ids are exact.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import catalog
from .functions import chunking as C
from .functions import sparse as S
from .operators import bm25 as B
from .operators import fusion as FU
from .operators import highlight as H
from .operators import rerank as RR
from .operators import retrieval as R

# ---------------------------------------------------------------------------
# shared query constants (same values drive Spark and oracle SQL)
# ---------------------------------------------------------------------------
QUERY_VEC_ID = 42  # stored embedding used as the dense query vector
QUERY_DOC_ID = 7  # document whose text is the sparse query
BM25_QUERY = "spark join stream window"
RADIAL_MIN_SCORE = 0.2
FILTER_MIN_CHARS = 200
HYBRID_WEIGHTS = [0.7, 0.3]
HYBRID_DEPTH = 50
K = 10
RERANK_QUERY_TEXT = "spark join window batch"
HIGHLIGHT_QUERY_TEXT = "spark join"
CHUNK_DOC_LIMIT = 50
CHUNK_TOKEN_LIMIT = 20
CHUNK_CHAR_LIMIT = 120
CHUNK_OVERLAP_RATE = 0.25
CHUNK_DELIMITER = "value"
CHUNK_QUERY_TOKENS = {"spark": 2.0, "join": 1.0}


def _round4(df: DataFrame, *score_cols: str) -> DataFrame:
    out = df
    for c in score_cols or ["score"]:
        out = out.withColumn(c, F.round(F.col(c), 4))
    return out


def _query_tokens_tf(spark: SparkSession, sf_dir: str, doc_id: int = QUERY_DOC_ID) -> dict[str, float]:
    """Driver-side sparse query encoding (tf of the query text) — the
    analogue of hoisted query inference (SURVEY.md §4)."""
    text = catalog.query_text(spark, sf_dir, doc_id)
    tf: dict[str, float] = {}
    for t in text.split():
        tf[t] = tf.get(t, 0.0) + 1.0
    return tf


# ---------------------------------------------------------------------------
# SQL fragments shared by the oracle strings
# ---------------------------------------------------------------------------

def _sql_cos(a: str, b: str) -> str:
    return (
        f"(list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))))"
    )


SQL_QVEC = f"(SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = {QUERY_VEC_ID})"

# (doc_id, token, weight) tf postings over documents — whitespace tokens
SQL_TF_POSTINGS = """
  SELECT doc_id, token, count(*)::DOUBLE AS weight
  FROM (
    SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\\s+'), t -> t != '')) AS token
    FROM documents
  )
  GROUP BY doc_id, token
"""

SQL_QUERY_TOKENS = f"""
  SELECT token, count(*)::DOUBLE AS qw
  FROM (
    SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'), t -> t != '')) AS token
    FROM documents WHERE doc_id = {QUERY_DOC_ID}
  )
  GROUP BY token
"""

SQL_DENSE_SCORED = f"""
  SELECT e.vec_id AS doc_id, {_sql_cos('e.embedding::DOUBLE[]', 'q.qe')} AS score
  FROM embeddings e, q
"""

SQL_SPARSE_SCORED = """
  SELECT p.doc_id, sum(p.weight * qt.qw) AS score
  FROM postings p JOIN qtok qt USING (token)
  GROUP BY p.doc_id
"""

# min_max normalization + weighted arithmetic mean combination over a
# union CTE `u(doc_id, raw_score, subquery_idx)` with weights CTE
# `wts(subquery_idx, w)` — CASE chain mirrors fusion.normalize exactly.
SQL_MINMAX_NORM = """
  SELECT u.doc_id, u.subquery_idx, u.raw_score,
         CASE WHEN max(u.raw_score) OVER sq = min(u.raw_score) OVER sq THEN 1.0
              ELSE CASE WHEN (u.raw_score - min(u.raw_score) OVER sq)
                             / (max(u.raw_score) OVER sq - min(u.raw_score) OVER sq) = 0.0
                        THEN 0.001
                        ELSE (u.raw_score - min(u.raw_score) OVER sq)
                             / (max(u.raw_score) OVER sq - min(u.raw_score) OVER sq)
                   END
         END AS norm_score
  FROM u
  WINDOW sq AS (PARTITION BY u.subquery_idx)
"""


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_r1_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = catalog.table(spark, sf_dir, "embeddings").withColumnRenamed("vec_id", "doc_id")
    qv = catalog.query_vector(spark, sf_dir, QUERY_VEC_ID)
    return _round4(R.dense_topk(emb, qv, k=K))


def q_p1_dense_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    corp = catalog.corpus(spark, sf_dir)
    qv = catalog.query_vector(spark, sf_dir, QUERY_VEC_ID)
    flt = (F.col("lang") == "en") & (F.col("n_chars") >= FILTER_MIN_CHARS)
    return _round4(R.dense_topk(corp, qv, k=K, pre_filter=flt))


def q_p4_radial(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = catalog.table(spark, sf_dir, "embeddings").withColumnRenamed("vec_id", "doc_id")
    qv = catalog.query_vector(spark, sf_dir, QUERY_VEC_ID)
    return _round4(R.radial_search(emb, qv, min_score=RADIAL_MIN_SCORE))


def q_r3_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog.table(spark, sf_dir, "documents")
    postings = S.tf_postings(docs)
    qt = _query_tokens_tf(spark, sf_dir)
    return _round4(R.sparse_topk_postings(postings, qt, k=K))


def q_r10_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog.table(spark, sf_dir, "documents")
    postings = S.tf_postings(docs)
    qt = _query_tokens_tf(spark, sf_dir)
    return _round4(R.two_phase_sparse(postings, qt, k=K))


def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog.table(spark, sf_dir, "documents")
    idx = B.build_bm25(docs)
    return _round4(B.bm25_topk(idx, BM25_QUERY, k=K))


def _hybrid_subqueries(spark: SparkSession, sf_dir: str) -> list[DataFrame]:
    corp = catalog.corpus(spark, sf_dir)
    qv = catalog.query_vector(spark, sf_dir, QUERY_VEC_ID)
    dense = R.dense_topk(corp, qv, k=HYBRID_DEPTH)
    postings = S.tf_postings(catalog.table(spark, sf_dir, "documents"))
    sparse = R.sparse_topk_postings(postings, _query_tokens_tf(spark, sf_dir), k=HYBRID_DEPTH)
    return [dense, sparse]


def q_r6_hybrid_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    subs = _hybrid_subqueries(spark, sf_dir)
    return _round4(
        FU.hybrid_fuse(subs, "min_max", "arithmetic_mean", weights=HYBRID_WEIGHTS, k=K)
    )


def q_n4_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    subs = _hybrid_subqueries(spark, sf_dir)
    return _round4(FU.hybrid_fuse(subs, "rrf", "rrf", k=K))


def q_n2_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    subs = _hybrid_subqueries(spark, sf_dir)
    return _round4(FU.hybrid_fuse(subs, "l2", "arithmetic_mean", weights=HYBRID_WEIGHTS, k=K))


def q_n3_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    subs = _hybrid_subqueries(spark, sf_dir)
    return _round4(FU.hybrid_fuse(subs, "z_score", "arithmetic_mean", weights=HYBRID_WEIGHTS, k=K))


def q_c2_geometric(spark: SparkSession, sf_dir: str) -> DataFrame:
    subs = _hybrid_subqueries(spark, sf_dir)
    return _round4(FU.hybrid_fuse(subs, "min_max", "geometric_mean", weights=HYBRID_WEIGHTS, k=K))


def q_c3_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    subs = _hybrid_subqueries(spark, sf_dir)
    return _round4(FU.hybrid_fuse(subs, "min_max", "harmonic_mean", weights=HYBRID_WEIGHTS, k=K))


def q_k4_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    subs = _hybrid_subqueries(spark, sf_dir)
    return _round4(
        FU.hybrid_fuse(subs, "min_max", "arithmetic_mean", weights=HYBRID_WEIGHTS, k=K, from_=5)
    )


def q_k5_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    subs = _hybrid_subqueries(spark, sf_dir)
    fused = FU.hybrid_fuse(
        subs, "min_max", "arithmetic_mean", weights=HYBRID_WEIGHTS, k=HYBRID_DEPTH
    )
    docs = catalog.table(spark, sf_dir, "documents")
    return _round4(FU.collapse(fused, docs, "source", k=K))


def q_q6_explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    subs = _hybrid_subqueries(spark, sf_dir)
    out = FU.hybrid_explain(subs, "min_max", "arithmetic_mean", weights=HYBRID_WEIGHTS, k=K)
    return _round4(out, "raw_score", "norm_score", "combined_score")


def q_q2_rerank_by_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    subs = _hybrid_subqueries(spark, sf_dir)
    fused = FU.hybrid_fuse(subs, "min_max", "arithmetic_mean", weights=HYBRID_WEIGHTS, k=20)
    docs = catalog.table(spark, sf_dir, "documents")
    return _round4(RR.rerank_by_field(fused, docs, "n_chars", k=K))


def q_q1_rerank_cross_encoder(spark: SparkSession, sf_dir: str) -> DataFrame:
    subs = _hybrid_subqueries(spark, sf_dir)
    fused = FU.hybrid_fuse(subs, "min_max", "arithmetic_mean", weights=HYBRID_WEIGHTS, k=20)
    docs = catalog.table(spark, sf_dir, "documents")
    return _round4(RR.rerank_cross_encoder(fused, docs, RERANK_QUERY_TEXT, k=K))


def q_q7_highlight(spark: SparkSession, sf_dir: str) -> DataFrame:
    subs = _hybrid_subqueries(spark, sf_dir)
    fused = FU.hybrid_fuse(subs, "min_max", "arithmetic_mean", weights=HYBRID_WEIGHTS, k=K)
    docs = catalog.table(spark, sf_dir, "documents")
    return _round4(H.highlight_results(fused, docs, HIGHLIGHT_QUERY_TEXT))


def q_f4_chunk_fixed_token(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog.table(spark, sf_dir, "documents").where(F.col("doc_id") < CHUNK_DOC_LIMIT)
    chunks = C.enforce_max_chunk_limit(
        C.chunk_fixed_token(F.col("text"), CHUNK_TOKEN_LIMIT, CHUNK_OVERLAP_RATE), 100
    )
    return docs.select(
        "doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk")
    ).orderBy("doc_id", "chunk_idx")


def q_f5_chunk_delimiter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog.table(spark, sf_dir, "documents").where(F.col("doc_id") < CHUNK_DOC_LIMIT)
    chunks = C.chunk_delimiter(F.col("text"), CHUNK_DELIMITER)
    return docs.select(
        "doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk")
    ).orderBy("doc_id", "chunk_idx")


def q_f6_chunk_fixed_char(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog.table(spark, sf_dir, "documents").where(F.col("doc_id") < CHUNK_DOC_LIMIT)
    chunks = C.chunk_fixed_char(F.col("text"), CHUNK_CHAR_LIMIT, CHUNK_OVERLAP_RATE)
    return docs.select(
        "doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk")
    ).orderBy("doc_id", "chunk_idx")


def q_r2_chunk_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested chunk scoring: chunk each doc, score chunks by tf dot with
    the chunk query tokens, parent score = max chunk score (R2)."""
    docs = catalog.table(spark, sf_dir, "documents")
    chunks = C.chunk_fixed_token(F.col("text"), CHUNK_TOKEN_LIMIT, CHUNK_OVERLAP_RATE)
    exploded = docs.select("doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk"))
    toks = S.tokens(F.col("chunk"))
    score = F.lit(0.0)
    for t, w in CHUNK_QUERY_TOKENS.items():
        score = score + F.lit(float(w)) * F.size(F.filter(toks, lambda x: x == t)).cast("double")
    chunk_scores = exploded.select("doc_id", "chunk_idx", score.alias("score"))
    return _round4(R.chunk_max_topk(chunk_scores, k=K))


# ---------------------------------------------------------------------------
# oracle SQL
# ---------------------------------------------------------------------------

def _oracle_hybrid_union() -> str:
    """CTE union of the two sub-queries' top-HYBRID_DEPTH lists."""
    return f"""
  q AS {SQL_QVEC},
  dense_scored AS ({SQL_DENSE_SCORED}),
  dense_top AS (
    SELECT doc_id, score FROM dense_scored
    ORDER BY score DESC, doc_id LIMIT {HYBRID_DEPTH}
  ),
  postings AS ({SQL_TF_POSTINGS}),
  qtok AS ({SQL_QUERY_TOKENS}),
  sparse_scored AS ({SQL_SPARSE_SCORED}),
  sparse_top AS (
    SELECT doc_id, score FROM sparse_scored
    ORDER BY score DESC, doc_id LIMIT {HYBRID_DEPTH}
  ),
  u AS (
    SELECT doc_id, score AS raw_score, 0 AS subquery_idx FROM dense_top
    UNION ALL
    SELECT doc_id, score AS raw_score, 1 AS subquery_idx FROM sparse_top
  )
"""


ORACLES: dict[str, str] = {}

ORACLES["r1_neural_dense_topk"] = f"""
WITH q AS {SQL_QVEC},
scored AS ({SQL_DENSE_SCORED})
SELECT doc_id, round(score, 4) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT {K}
"""

ORACLES["p1_dense_filtered_topk"] = f"""
WITH q AS {SQL_QVEC},
scored AS (
  SELECT e.vec_id AS doc_id, {_sql_cos('e.embedding::DOUBLE[]', 'q.qe')} AS score
  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id, q
  WHERE d.lang = 'en' AND d.n_chars >= {FILTER_MIN_CHARS}
)
SELECT doc_id, round(score, 4) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT {K}
"""

ORACLES["p4_radial_search"] = f"""
WITH q AS {SQL_QVEC},
scored AS ({SQL_DENSE_SCORED})
SELECT doc_id, round(score, 4) AS score
FROM scored WHERE score >= {RADIAL_MIN_SCORE}
ORDER BY score DESC, doc_id
"""

ORACLES["r3_neural_sparse_exact"] = f"""
WITH postings AS ({SQL_TF_POSTINGS}),
qtok AS ({SQL_QUERY_TOKENS}),
scored AS ({SQL_SPARSE_SCORED})
SELECT doc_id, round(score, 4) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT {K}
"""

ORACLES["r10_two_phase_sparse"] = f"""
WITH postings AS ({SQL_TF_POSTINGS}),
qtok AS ({SQL_QUERY_TOKENS}),
high AS (SELECT * FROM qtok WHERE qw >= 0.4 * (SELECT max(qw) FROM qtok)),
phase1 AS (
  SELECT p.doc_id, sum(p.weight * h.qw) AS score
  FROM postings p JOIN high h USING (token)
  GROUP BY p.doc_id
  ORDER BY score DESC, doc_id LIMIT {int(K * 5.0)}
),
rescored AS (
  SELECT p.doc_id, sum(p.weight * qt.qw) AS score
  FROM postings p
  JOIN (SELECT doc_id FROM phase1) w USING (doc_id)
  JOIN qtok qt USING (token)
  GROUP BY p.doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM rescored ORDER BY score DESC, doc_id LIMIT {K}
"""

_BM25_TOKENS = sorted({t for t in BM25_QUERY.lower().split()})
_BM25_TOKEN_LIST = ", ".join(f"('{t}')" for t in _BM25_TOKENS)
ORACLES["bm25_match"] = f"""
WITH postings AS ({SQL_TF_POSTINGS}),
q(token) AS (VALUES {_BM25_TOKEN_LIST}),
doclen AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t != ''))::DOUBLE AS dl
  FROM documents
),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM doclen),
dfs AS (
  SELECT p.token, count(*)::DOUBLE AS df
  FROM postings p JOIN q USING (token) GROUP BY p.token
),
scored AS (
  SELECT p.doc_id,
         sum(
           ln(1.0 + (s.n - f.df + 0.5) / (f.df + 0.5))
           * (p.weight * (1.2 + 1.0))
           / (p.weight + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl))
         ) AS score
  FROM postings p
  JOIN q USING (token)
  JOIN dfs f ON f.token = p.token
  JOIN doclen dl ON dl.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY p.doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT {K}
"""

ORACLES["r6_hybrid_minmax_arith"] = f"""
WITH {_oracle_hybrid_union()},
n AS ({SQL_MINMAX_NORM}),
wts(subquery_idx, w) AS (VALUES (0, {HYBRID_WEIGHTS[0]}), (1, {HYBRID_WEIGHTS[1]})),
fused AS (
  SELECT n.doc_id, sum(wts.w * n.norm_score) / sum(wts.w) AS score
  FROM n JOIN wts USING (subquery_idx)
  GROUP BY n.doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM fused ORDER BY score DESC, doc_id LIMIT {K}
"""

ORACLES["n4_rrf_fusion"] = f"""
WITH {_oracle_hybrid_union()},
n AS (
  SELECT doc_id, subquery_idx,
         1.0 / (60.0 + row_number() OVER (PARTITION BY subquery_idx
                                          ORDER BY raw_score DESC, doc_id)) AS norm_score
  FROM u
),
fused AS (
  SELECT doc_id, sum(norm_score) AS score FROM n GROUP BY doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM fused ORDER BY score DESC, doc_id LIMIT {K}
"""


# --- fusion variants -------------------------------------------------------
SQL_L2_NORM = """
  SELECT u.doc_id, u.subquery_idx, u.raw_score,
         CASE WHEN sqrt(sum(u.raw_score * u.raw_score) OVER sq) = 0.0 THEN 0.0
              ELSE u.raw_score / sqrt(sum(u.raw_score * u.raw_score) OVER sq)
         END AS norm_score
  FROM u
  WINDOW sq AS (PARTITION BY u.subquery_idx)
"""

SQL_ZSCORE_NORM = """
  SELECT u.doc_id, u.subquery_idx, u.raw_score,
         CASE WHEN u.raw_score = avg(u.raw_score) OVER sq THEN max(u.raw_score) OVER sq
              WHEN stddev_pop(u.raw_score) OVER sq = 0.0 THEN min(u.raw_score) OVER sq
              ELSE CASE WHEN (u.raw_score - avg(u.raw_score) OVER sq)
                             / stddev_pop(u.raw_score) OVER sq <= 0.0
                        THEN 0.001
                        ELSE (u.raw_score - avg(u.raw_score) OVER sq)
                             / stddev_pop(u.raw_score) OVER sq
                   END
         END AS norm_score
  FROM u
  WINDOW sq AS (PARTITION BY u.subquery_idx)
"""

_SQL_WTS = f"wts(subquery_idx, w) AS (VALUES (0, {HYBRID_WEIGHTS[0]}), (1, {HYBRID_WEIGHTS[1]}))"

ORACLES["n2_l2_fusion"] = f"""
WITH {_oracle_hybrid_union()},
n AS ({SQL_L2_NORM}),
{_SQL_WTS},
fused AS (
  SELECT n.doc_id,
         CASE WHEN sum(CASE WHEN n.norm_score >= 0.0 THEN wts.w ELSE 0.0 END) = 0.0 THEN 0.0
              ELSE sum(CASE WHEN n.norm_score >= 0.0 THEN wts.w * n.norm_score ELSE 0.0 END)
                   / sum(CASE WHEN n.norm_score >= 0.0 THEN wts.w ELSE 0.0 END)
         END AS score
  FROM n JOIN wts USING (subquery_idx)
  GROUP BY n.doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM fused ORDER BY score DESC, doc_id LIMIT {K}
"""

ORACLES["n3_zscore_fusion"] = f"""
WITH {_oracle_hybrid_union()},
n AS ({SQL_ZSCORE_NORM}),
{_SQL_WTS},
fused AS (
  SELECT n.doc_id,
         CASE WHEN sum(CASE WHEN n.norm_score >= 0.0 THEN wts.w ELSE 0.0 END) = 0.0 THEN 0.0
              ELSE sum(CASE WHEN n.norm_score >= 0.0 THEN wts.w * n.norm_score ELSE 0.0 END)
                   / sum(CASE WHEN n.norm_score >= 0.0 THEN wts.w ELSE 0.0 END)
         END AS score
  FROM n JOIN wts USING (subquery_idx)
  GROUP BY n.doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM fused ORDER BY score DESC, doc_id LIMIT {K}
"""

ORACLES["c2_geometric_fusion"] = f"""
WITH {_oracle_hybrid_union()},
n AS ({SQL_MINMAX_NORM}),
{_SQL_WTS},
fused AS (
  SELECT n.doc_id,
         CASE WHEN sum(CASE WHEN n.norm_score > 0.0 THEN wts.w ELSE 0.0 END) = 0.0 THEN 0.0
              ELSE exp(sum(CASE WHEN n.norm_score > 0.0 THEN wts.w * ln(n.norm_score) ELSE 0.0 END)
                       / sum(CASE WHEN n.norm_score > 0.0 THEN wts.w ELSE 0.0 END))
         END AS score
  FROM n JOIN wts USING (subquery_idx)
  GROUP BY n.doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM fused ORDER BY score DESC, doc_id LIMIT {K}
"""

ORACLES["c3_harmonic_fusion"] = f"""
WITH {_oracle_hybrid_union()},
n AS ({SQL_MINMAX_NORM}),
{_SQL_WTS},
fused AS (
  SELECT n.doc_id,
         CASE WHEN sum(CASE WHEN n.norm_score > 0.0 THEN wts.w / n.norm_score ELSE 0.0 END) > 0.0
              THEN sum(CASE WHEN n.norm_score > 0.0 THEN wts.w ELSE 0.0 END)
                   / sum(CASE WHEN n.norm_score > 0.0 THEN wts.w / n.norm_score ELSE 0.0 END)
              ELSE 0.0
         END AS score
  FROM n JOIN wts USING (subquery_idx)
  GROUP BY n.doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM fused ORDER BY score DESC, doc_id LIMIT {K}
"""

_SQL_MINMAX_ARITH_FUSED = f"""
n AS ({SQL_MINMAX_NORM}),
{_SQL_WTS},
fused AS (
  SELECT n.doc_id, sum(wts.w * n.norm_score) / sum(wts.w) AS score
  FROM n JOIN wts USING (subquery_idx)
  GROUP BY n.doc_id
)
"""

ORACLES["k4_pagination"] = f"""
WITH {_oracle_hybrid_union()},
{_SQL_MINMAX_ARITH_FUSED}
SELECT doc_id, round(score, 4) AS score
FROM fused ORDER BY score DESC, doc_id LIMIT {K} OFFSET 5
"""

ORACLES["k5_collapse_by_source"] = f"""
WITH {_oracle_hybrid_union()},
{_SQL_MINMAX_ARITH_FUSED},
top_fused AS (
  SELECT doc_id, score FROM fused ORDER BY score DESC, doc_id LIMIT {HYBRID_DEPTH}
),
collapsed AS (
  SELECT f.doc_id, f.score, d.source,
         row_number() OVER (PARTITION BY d.source ORDER BY f.score DESC, f.doc_id) AS rn
  FROM top_fused f JOIN documents d USING (doc_id)
)
SELECT doc_id, round(score, 4) AS score, source
FROM collapsed WHERE rn = 1
ORDER BY score DESC, doc_id LIMIT {K}
"""

ORACLES["q6_hybrid_explain"] = f"""
WITH {_oracle_hybrid_union()},
{_SQL_MINMAX_ARITH_FUSED},
top_fused AS (
  SELECT doc_id, score AS combined_score FROM fused
  ORDER BY score DESC, doc_id LIMIT {K}
)
SELECT n.doc_id, n.subquery_idx,
       round(n.raw_score, 4) AS raw_score,
       round(n.norm_score, 4) AS norm_score,
       wts.w AS weight,
       round(f.combined_score, 4) AS combined_score
FROM n
JOIN wts USING (subquery_idx)
JOIN top_fused f USING (doc_id)
ORDER BY combined_score DESC, n.doc_id, n.subquery_idx
"""

ORACLES["q2_rerank_by_field"] = f"""
WITH {_oracle_hybrid_union()},
{_SQL_MINMAX_ARITH_FUSED},
top_fused AS (
  SELECT doc_id, score FROM fused ORDER BY score DESC, doc_id LIMIT 20
)
SELECT f.doc_id, round(d.n_chars::DOUBLE, 4) AS score
FROM top_fused f JOIN documents d USING (doc_id)
ORDER BY d.n_chars DESC, f.doc_id LIMIT {K}
"""

_RERANK_TOKENS_SQL = "[" + ", ".join(f"'{t}'" for t in sorted(set(RERANK_QUERY_TEXT.split()))) + "]"
ORACLES["q1_rerank_cross_encoder"] = f"""
WITH {_oracle_hybrid_union()},
{_SQL_MINMAX_ARITH_FUSED},
top_fused AS (
  SELECT doc_id FROM fused ORDER BY score DESC, doc_id LIMIT 20
),
scored AS (
  SELECT f.doc_id,
         len(list_filter(list_distinct(list_filter(regexp_split_to_array(lower(d.text), '\\s+'), t -> t != '')),
                         x -> list_contains({_RERANK_TOKENS_SQL}, x)))::DOUBLE
         / len(list_distinct(list_concat(
               list_distinct(list_filter(regexp_split_to_array(lower(d.text), '\\s+'), t -> t != '')),
               {_RERANK_TOKENS_SQL})))::DOUBLE AS score
  FROM top_fused f JOIN documents d USING (doc_id)
)
SELECT doc_id, round(score, 4) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT {K}
"""

_HL_TERMS = "|".join(sorted({t for t in HIGHLIGHT_QUERY_TEXT.lower().split()}, key=len, reverse=True))
ORACLES["q7_highlight"] = f"""
WITH {_oracle_hybrid_union()},
{_SQL_MINMAX_ARITH_FUSED},
top_fused AS (
  SELECT doc_id, score FROM fused ORDER BY score DESC, doc_id LIMIT {K}
)
SELECT f.doc_id, round(f.score, 4) AS score,
       regexp_replace(d.text, '\\b({_HL_TERMS})\\b', '<em>\\1</em>', 'g') AS highlighted
FROM top_fused f JOIN documents d USING (doc_id)
ORDER BY f.score DESC, f.doc_id
"""

# --- chunkers ---------------------------------------------------------------
_CHUNK_TOK_OVERLAP = int(CHUNK_TOKEN_LIMIT * CHUNK_OVERLAP_RATE)
_CHUNK_TOK_STRIDE = max(CHUNK_TOKEN_LIMIT - _CHUNK_TOK_OVERLAP, 1)
ORACLES["f4_chunk_fixed_token"] = f"""
SELECT doc_id, s.idx AS chunk_idx, s.chunk
FROM (
  SELECT doc_id,
         unnest(list_transform(range(0, (len(toks) - 1) // {_CHUNK_TOK_STRIDE} + 1),
           i -> {{'idx': i,
                  'chunk': array_to_string(list_slice(toks, i * {_CHUNK_TOK_STRIDE} + 1,
                                                      i * {_CHUNK_TOK_STRIDE} + {CHUNK_TOKEN_LIMIT}), ' ')}})) AS s
  FROM (
    SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), t -> t != '') AS toks
    FROM documents WHERE doc_id < {CHUNK_DOC_LIMIT}
  )
  WHERE len(toks) >= 1
)
ORDER BY doc_id, chunk_idx
"""

_CHUNK_CHAR_OVERLAP = int(CHUNK_CHAR_LIMIT * CHUNK_OVERLAP_RATE)
_CHUNK_CHAR_STRIDE = max(CHUNK_CHAR_LIMIT - _CHUNK_CHAR_OVERLAP, 1)
ORACLES["f6_chunk_fixed_char"] = f"""
SELECT doc_id, s.idx AS chunk_idx, s.chunk
FROM (
  SELECT doc_id,
         unnest(list_transform(range(0, (length(text) - 1) // {_CHUNK_CHAR_STRIDE} + 1),
           i -> {{'idx': i,
                  'chunk': substr(text, i * {_CHUNK_CHAR_STRIDE} + 1, {CHUNK_CHAR_LIMIT})}})) AS s
  FROM documents
  WHERE doc_id < {CHUNK_DOC_LIMIT} AND length(text) >= 1
)
ORDER BY doc_id, chunk_idx
"""

ORACLES["f5_chunk_delimiter"] = f"""
SELECT doc_id, (row_number() OVER (PARTITION BY doc_id ORDER BY idx) - 1) AS chunk_idx, chunk
FROM (
  SELECT doc_id, s.idx, s.chunk
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(pieces) + 1),
             i -> {{'idx': i,
                    'chunk': CASE WHEN i < len(pieces)
                                  THEN list_extract(pieces, i) || '{CHUNK_DELIMITER}'
                                  ELSE list_extract(pieces, i) END}})) AS s
    FROM (
      SELECT doc_id, string_split(text, '{CHUNK_DELIMITER}') AS pieces
      FROM documents WHERE doc_id < {CHUNK_DOC_LIMIT}
    )
  )
  WHERE s.chunk != ''
)
ORDER BY doc_id, chunk_idx
"""

_R2_SCORE_SQL = " + ".join(
    f"{float(w)} * len(list_filter(ctoks, x -> x = '{t}'))::DOUBLE"
    for t, w in CHUNK_QUERY_TOKENS.items()
)
ORACLES["r2_chunk_max_topk"] = f"""
WITH chunks AS (
  SELECT doc_id, s.chunk
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(0, (len(toks) - 1) // {_CHUNK_TOK_STRIDE} + 1),
             i -> {{'idx': i,
                    'chunk': array_to_string(list_slice(toks, i * {_CHUNK_TOK_STRIDE} + 1,
                                                        i * {_CHUNK_TOK_STRIDE} + {CHUNK_TOKEN_LIMIT}), ' ')}})) AS s
    FROM (
      SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), t -> t != '') AS toks
      FROM documents
    )
    WHERE len(toks) >= 1
  )
),
chunk_scores AS (
  SELECT doc_id, {_R2_SCORE_SQL} AS score
  FROM (SELECT doc_id, list_filter(regexp_split_to_array(chunk, '\\s+'), t -> t != '') AS ctoks FROM chunks)
),
parent AS (SELECT doc_id, max(score) AS score FROM chunk_scores GROUP BY doc_id)
SELECT doc_id, round(score, 4) AS score
FROM parent ORDER BY score DESC, doc_id LIMIT {K}
"""


SPARK_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "r1_neural_dense_topk": q_r1_dense,
    "p1_dense_filtered_topk": q_p1_dense_filtered,
    "p4_radial_search": q_p4_radial,
    "r3_neural_sparse_exact": q_r3_sparse,
    "r10_two_phase_sparse": q_r10_two_phase,
    "bm25_match": q_bm25,
    "r6_hybrid_minmax_arith": q_r6_hybrid_minmax,
    "n4_rrf_fusion": q_n4_rrf,
    "n2_l2_fusion": q_n2_l2,
    "n3_zscore_fusion": q_n3_zscore,
    "c2_geometric_fusion": q_c2_geometric,
    "c3_harmonic_fusion": q_c3_harmonic,
    "k4_pagination": q_k4_pagination,
    "k5_collapse_by_source": q_k5_collapse,
    "q6_hybrid_explain": q_q6_explain,
    "q2_rerank_by_field": q_q2_rerank_by_field,
    "q1_rerank_cross_encoder": q_q1_rerank_cross_encoder,
    "q7_highlight": q_q7_highlight,
    "f4_chunk_fixed_token": q_f4_chunk_fixed_token,
    "f5_chunk_delimiter": q_f5_chunk_delimiter,
    "f6_chunk_fixed_char": q_f6_chunk_fixed_char,
    "r2_chunk_max_topk": q_r2_chunk_max,
}
