"""BM25 lexical scoring over a postings layout.

The reference delegates lexical `match` to OpenSearch core; hybrid's
canonical use is lexical+neural, so a hybrid engine needs BM25
(SURVEY.md §7 step 4). Spark has no BM25 — this builds it from
DataFrame primitives: corpus stats (N, avgdl), per-token df, per-doc tf,
then the Lucene-style score expression:

    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))
    score  = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))

Scale shape: stats tables are built once per corpus snapshot (one
aggregation pass each) and cached; query-time work is a broadcast join
of the query's tokens against the token-bucketed postings table, a
groupBy(doc), and TakeOrdered top-k — no corpus-wide shuffle per query.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.sparse import tf_postings, tokens

K1 = 1.2
B = 0.75


@dataclass
class BM25Index:
    postings: DataFrame  # (doc_id, token, tf double)
    doclen: DataFrame  # (doc_id, dl double)
    stats: tuple[int, float]  # (N, avgdl)


def build_bm25(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> BM25Index:
    postings = tf_postings(docs, id_col, text_col).withColumnRenamed("weight", "tf")
    doclen = docs.select(
        F.col(id_col), F.size(tokens(F.col(text_col))).cast("double").alias("dl")
    )
    n, avgdl = doclen.agg(F.count("*"), F.avg("dl")).first()
    return BM25Index(postings=postings, doclen=doclen, stats=(int(n), float(avgdl)))


def bm25_topk(
    index: BM25Index,
    query: str,
    k: int = 10,
    id_col: str = "doc_id",
    k1: float = K1,
    b: float = B,
    candidate_ids: DataFrame | None = None,
) -> DataFrame:
    """Top-k BM25. `candidate_ids` restricts scoring to allowed docs
    (hybrid filter pushdown, P2) — corpus stats stay corpus-wide, as in
    Lucene filtered queries."""
    n, avgdl = index.stats
    qtokens = sorted({t for t in query.lower().split() if t})
    spark = index.postings.sparkSession
    from .retrieval import token_frame

    q = token_frame(spark, dict.fromkeys(qtokens, 1.0)).select("token")

    postings = index.postings
    if candidate_ids is not None:
        postings = postings.join(F.broadcast(candidate_ids.select(id_col)), id_col, "semi")
    df_tbl = (
        index.postings.join(F.broadcast(q), "token")
        .groupBy("token")
        .agg(F.count("*").cast("double").alias("df"))
    )
    idf = F.log(F.lit(1.0) + (F.lit(float(n)) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    scored = (
        postings.join(F.broadcast(q), "token")
        .join(F.broadcast(df_tbl), "token")
        .join(index.doclen, id_col)
        .withColumn(
            "term_score",
            idf
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))),
        )
        .groupBy(id_col)
        .agg(F.sum("term_score").alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
