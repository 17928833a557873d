"""Distributed embedding clustering: Lloyd's k-means over a DataFrame.

The training-data curation counterpart of the reference's random
clustering used by the sparse index build (`sparse/algorithm/
RandomClusteringAlgorithm.java` — cluster-then-summarize); here the
clustering is a first-class corpus operator (SemDeDup-style semantic
dedup, corpus cartography, IVF centroid training) rather than a
per-segment index detail.

Scale shape (the standard Spark k-means discipline, same as MLlib's):
- the CORPUS never leaves the executors — each round is one scan that
  computes argmin-distance assignments plus a map-side partial
  aggregation of per-(cluster, dim) sums;
- only the k×dim centroid cells (a few KB) are collected to the
  driver per round, quantized, and shipped back as plan literals for
  the next round — no join, no broadcast table, no shuffle of vectors;
- rounds are a driver loop (iterative algorithms are driver loops in
  Spark by design; each round is one job over the same cached scan).

Cross-engine determinism: centroids are quantized to CENTROID_QUANT
decimals after every round, so an oracle engine replaying the same
unrolled rounds sees bit-identical centroid literals; assignment
tie-breaks go to the lowest centroid id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vector import as_double, lit_vector

CENTROID_QUANT = 6  # decimals kept on intermediate centroids


def _sqdist(v, cvec: list[float]):
    # squared L2 — sqrt is monotone, so argmin is unchanged and we stay
    # polynomial (exactly reproducible as a sequential fold)
    return F.aggregate(
        F.zip_with(v, lit_vector(cvec), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_assign(
    embs: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster_id): argmin squared-L2 over the centroid list.

    argmin via array_min over (dist, cid) structs — linear expression
    size, ties to the LOWEST centroid id (same discipline as
    ann.ivf_assign).
    """
    v = as_double(F.col(vec_col))
    entries = F.array(
        *[
            F.struct(_sqdist(v, cvec).alias("dist"), F.lit(cid).alias("cid"))
            for cid, cvec in centroids
        ]
    )
    return embs.select(
        F.col(id_col), F.array_min(entries)["cid"].cast("int").alias("cluster_id")
    )


def kmeans_lloyd(
    embs: DataFrame,
    seeds: list[tuple[int, list[float]]],
    rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Lloyd's iterations from deterministic seeds.

    Returns (final assignment DataFrame, final quantized centroids).
    Empty clusters keep their previous centroid (standard Lloyd's
    fallback, deterministic).
    """
    # seeds ship unrounded (stored vectors are already bit-identical
    # across engines); only RECOMPUTED centroids are quantized, via
    # engine-side round() (HALF_UP in both Spark and the SQL oracles —
    # Python's round() is banker's and would diverge)
    cents = [(cid, [float(x) for x in cvec]) for cid, cvec in seeds]
    assigned = kmeans_assign(embs, cents, id_col, vec_col)
    for _ in range(rounds):
        cells = (
            embs.join(assigned, id_col)
            .select("cluster_id", F.posexplode(as_double(F.col(vec_col))).alias("pos", "x"))
            .groupBy("cluster_id", "pos")
            .agg(F.round(F.avg("x"), CENTROID_QUANT).alias("v"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in cells:
            by_cid.setdefault(int(r["cluster_id"]), {})[int(r["pos"])] = float(r["v"])
        cents = [
            (
                cid,
                [by_cid[cid][p] for p in sorted(by_cid[cid])]
                if cid in by_cid
                else cvec,
            )
            for cid, cvec in cents
        ]
        assigned = kmeans_assign(embs, cents, id_col, vec_col)
    return assigned, cents
