"""Approximate nearest-neighbor search over embedding columns.

Three tiers (SURVEY.md §7 step 9 / BASELINE.json north star):
- brute-force cosine top-k — the exact baseline (retrieval.dense_topk);
- IVF (inverted-file): corpus pre-assigned to centroid cells, query
  probes the closest few cells — the partition-pruning path: with the
  assigned table written partitioned/bucketed by `cluster_id`, the
  probe filter prunes ~(1 − nprobe/ncells) of the data BEFORE any scan;
- sign-random-projection LSH buckets: deterministic md5-derived
  hyperplanes; near-dup / top-k candidates only meet within a bucket —
  linear-time, join-based, no O(n²).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vector import as_double, cosine, dot, l2_norm, lit_vector


def ivf_assign(
    embs: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its max-cosine centroid → (id, cluster_id).

    Deterministic centroid list is supplied by the caller (e.g. first K
    stored vectors, or KMeans output). At scale, write the result
    partitioned by cluster_id so probes prune partitions.
    """
    v = as_double(F.col(vec_col))
    # argmax via array_max over (sim, -cid) structs: linear expression
    # size (a when-chain would double the tree per centroid), ties break
    # to the LOWEST centroid id, matching a (sim DESC, cid ASC) rank.
    entries = F.array(
        *[
            F.struct(
                F.coalesce(cosine(v, lit_vector(cvec)), F.lit(float("-inf"))).alias("sim"),
                F.lit(-cid).alias("ncid"),
            )
            for cid, cvec in centroids
        ]
    )
    best = F.array_max(entries)
    return embs.select(F.col(id_col), (-best["ncid"]).cast("int").alias("cluster_id"))


def dense_scores_arrow(
    embs: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, score): dot(embedding, query) as one BLAS matvec per
    Arrow batch — the WIDE-embedding scoring path.

    functions/vector.py::dot_lit is the right form at the contract
    dims (bit-exact fold order, whole-stage codegen), but its
    sequential chain is a dim-deep expression tree and Spark's
    recursive column converter overflows the driver stack above ~300
    terms (measured at dim 384, round 8). Production embeddings are
    384-1536 wide, so the scale scripts score through this kernel:
    O(batch·dim) contiguous float64 work, no expression tree at all.
    BLAS sums in a different order than the fold, so scores can
    differ from dot_lit by ~1 ulp — use for measurements and
    production top-k, not for oracle-hash-matched contract queries
    at dim 32."""
    import numpy as np
    import pandas as pd

    q = np.asarray(query_vec, dtype=np.float64)

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            V = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            yield pd.DataFrame({id_col: pdf[id_col], "score": V @ q})

    # id dtype follows the input schema (int32 / string ids pass
    # through untouched), not a hardcoded bigint
    id_type = embs.schema[id_col].dataType.simpleString()
    return embs.select(id_col, vec_col).mapInPandas(
        gen, schema=f"{id_col} {id_type}, score double"
    )


def ivf_assign_arrow(
    embs: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Vectorized ingest-time IVF assignment: one numpy matmul per
    Arrow batch instead of |C| struct expressions per row.

    `ivf_assign`'s expression form is right for the handful of
    centroids a contract query carries, but its plan grows linearly
    with |C| (256 centroids × a 32-term cosine each = an 8k-node
    projection per row). Ingest-time assignment at index-build scale
    wants the Arrow batch form: normalize the centroid matrix once
    per executor, then each batch is a single (B×d)·(d×|C|) matmul +
    argmax. Same contract as ivf_assign — max cosine, ties to the
    LOWEST centroid id (np.argmax keeps the first maximum and the
    centroid matrix is laid out in ascending-cid order); zero-norm
    vectors get sim 0 everywhere and fall to the lowest cid, matching
    the coalesce(-inf) tie chain. Note the two forms sum in different
    FP orders (normalize-then-BLAS-matmul here vs a sequential dot
    fold divided by norms in ivf_assign), so a vector whose top two
    cells tie within ~1 ulp may legitimately assign differently;
    tests/test_vector_unrolled.py pins equality on data whose argmax
    gaps dwarf that."""
    import numpy as np
    import pandas as pd

    order = sorted(centroids, key=lambda c: c[0])
    cids = np.array([c for c, _ in order], dtype=np.int64)
    C = np.array([v for _, v in order], dtype=np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)

    def gen(batches):
        for pdf in batches:
            if pdf.empty:  # norm(axis=1) raises AxisError on 0-row 1-D
                continue
            V = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            nrm = np.linalg.norm(V, axis=1, keepdims=True)
            np.divide(V, nrm, out=V, where=nrm != 0)
            best = cids[np.argmax(V @ Cn.T, axis=1)]
            yield pd.DataFrame(
                {id_col: pdf[id_col], "cluster_id": best.astype("int32")}
            )

    return embs.select(id_col, vec_col).mapInPandas(
        gen, schema=f"{id_col} long, cluster_id int"
    )


def ivf_topk(
    embs: DataFrame,
    centroids: list[tuple[int, list[float]]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: probe the nprobe closest cells, exact cosine inside.

    The cell filter happens BEFORE the scan of vectors (partition
    pruning when the assignment is the table layout), so cost is
    ~nprobe/ncells of brute force.
    """
    import math

    def cos_py(a: list[float], b: list[float]) -> float:
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb) if na and nb else 0.0

    probe_ids = [
        cid
        for cid, _ in sorted(
            centroids, key=lambda c: (-cos_py(query_vec, c[1]), c[0])
        )[:nprobe]
    ]
    # single scan: assignment + probe filter + scoring in one select —
    # no self-join. (With a PRE-assigned table partitioned by
    # cluster_id, the isin() filter becomes partition pruning and the
    # assignment expressions disappear; this inline form is for an
    # unindexed corpus.)
    v = as_double(F.col(vec_col))
    entries = F.array(
        *[
            F.struct(
                F.coalesce(cosine(v, lit_vector(cvec)), F.lit(float("-inf"))).alias("sim"),
                F.lit(-cid).alias("ncid"),
            )
            for cid, cvec in centroids
        ]
    )
    q = lit_vector(query_vec)
    scored = embs.select(
        F.col(id_col).alias("doc_id"),
        (-F.array_max(entries)["ncid"]).cast("int").alias("cluster_id"),
        cosine(v, q).alias("score"),
    )
    return (
        scored.where(F.col("cluster_id").isin(probe_ids))
        .select("doc_id", "score")
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(k)
    )


def knn_join(
    embs: DataFrame,
    centroids: list[tuple[int, list[float]]],
    m: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate kNN-JOIN: top-m cosine neighbors for EVERY row,
    candidates blocked by shared IVF cell.

    The all-pairs similarity graph is the backbone op of training-data
    pipelines (near-dup clustering, label propagation, diversity
    sampling). Blocking by cluster turns O(n²) into Σ|cell|² — with
    balanced cells, n²/ncells — and at scale each cell's self-join is
    co-located when the table is partitioned by cluster_id.
    Recall < 1 for pairs straddling cell boundaries (probe >1 cells or
    use SRP-OR for higher recall).
    """
    from .dedup import unit_vectors

    assigned = ivf_assign(embs, centroids, id_col, vec_col)
    unit = unit_vectors(embs, id_col, vec_col)
    side = unit.join(assigned, id_col)
    a = side.select(
        F.col("cluster_id"), F.col(id_col).alias("a"), F.col("unit").alias("ua")
    )
    b = side.select(
        F.col("cluster_id"), F.col(id_col).alias("b"), F.col("unit").alias("ub")
    )
    pairs = (
        a.join(b, ["cluster_id"])
        .where(F.col("a") != F.col("b"))
        .select("a", "b", dot(F.col("ua"), F.col("ub")).alias("score"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("a").orderBy(F.col("score").desc(), F.col("b"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= m)
        .orderBy("a", "rank")
    )


def _srp_dot_sql(col_name: str, plane: list[float]) -> str:
    """dot(col, plane) as one SQL string — the exact fold of
    functions.vector.dot (zip_with + sequential aggregate), parsed
    server-side in one call instead of per-element py4j Column calls."""
    arr = "array(" + ", ".join(f"{x!r}D" for x in plane) + ")"
    return (
        f"aggregate(zip_with({col_name}, {arr}, (x, y) -> x * y),"
        " 0.0D, (a, b) -> a + b)"
    )


def _srp_planes(dim: int, n_planes: int, seed: str = "srp") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 — components in
    [-0.5, 0.5), reproducible across runs and languages."""
    planes = []
    for p in range(n_planes):
        comps = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()
            comps.append(int(h[:8], 16) / float(0xFFFFFFFF) - 0.5)
        planes.append(comps)
    return planes


def srp_bucket(
    embs: DataFrame,
    dim: int,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-random-projection bucket id per vector → (id, bucket).

    bucket = bit string of sign(v·plane_p); cosine-similar vectors land
    in the same bucket with probability (1 − θ/π)^n_planes.
    """
    v = as_double(F.col(vec_col))
    bits = ", ".join(
        f"CASE WHEN {_srp_dot_sql('__v', plane)} >= 0.0D THEN '1' ELSE '0' END"
        for plane in _srp_planes(dim, n_planes)
    )
    return embs.select(F.col(id_col), v.alias("__v")).select(
        F.col(id_col), F.expr(f"concat({bits})").alias("bucket")
    )


def lsh_bucketed_neardup(
    embs: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate embedding near-dup: pairs meet only inside an SRP
    bucket, then exact cosine filters. Linear-time candidate
    generation — the 100 TB replacement for the brute-force O(n²) pass
    (recall < 1.0: pairs split across buckets are missed; raise
    n_planes bands or OR multiple tables for higher recall).

    bucket + unit vector are computed in ONE projection over the scan
    (no id-join between derived frames): the only shuffle in the plan
    is the bucket hash for the self-join.

    The plane-sign bits are assembled as ONE SQL expression string
    (r10 batch 3 — the same single-parse pattern as
    lsh_multitable_neardup_blocked): the Column-per-plane loop cost
    ~0.8 s of driver py4j time per query at 8 planes × 64 dims.
    Identical fold, identical bits."""
    from ..functions.common import let

    v = as_double(F.col(vec_col))
    bits = ", ".join(
        f"CASE WHEN {_srp_dot_sql('__v', plane)} >= 0.0D THEN '1' ELSE '0' END"
        for plane in _srp_planes(dim, n_planes)
    )
    with_vec = embs.select(
        F.col(id_col), v.alias("__v")
    ).select(
        F.col(id_col),
        F.expr(f"concat({bits})").alias("bucket"),
        let(
            l2_norm(F.col("__v")),
            lambda nrm: F.transform(F.col("__v"), lambda x: x / nrm),
        ).alias("unit"),
    )
    a = with_vec.select(
        F.col("bucket"), F.col(id_col).alias("a"), F.col("unit").alias("ua")
    )
    b = with_vec.select(
        F.col("bucket"), F.col(id_col).alias("b"), F.col("unit").alias("ub")
    )
    return (
        a.join(b, ["bucket"])
        .where(F.col("a") < F.col("b"))
        .withColumn("cos", dot(F.col("ua"), F.col("ub")))
        .where(F.col("cos") >= threshold)
        .select("a", "b", F.col("cos").alias("cosine"))
    )


def lsh_multitable_neardup(
    embs: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """OR-composition of `n_tables` independent SRP hash tables: a pair
    becomes a candidate if it collides in ANY table, so recall
    compounds as 1−(1−p^b)^T (the standard LSH amplification the
    single-table variant lacks). Plan shape: ONE projection computes
    the unit vector and all T bucket ids, `posexplode` lays them out as
    (table, bucket, id), and a single self-equi-join on (table, bucket)
    generates candidates — one shuffle, linear in T·n. Candidate pairs
    dedup on (a, b) BEFORE the exact-cosine verify, so each pair pays
    the D-dim dot product once no matter how many tables it collides
    in."""
    from ..functions.common import let

    v = as_double(F.col(vec_col))
    tables_sql = []
    for t in range(n_tables):
        bits = ", ".join(
            f"CASE WHEN {_srp_dot_sql('__v', plane)} >= 0.0D THEN '1' ELSE '0' END"
            for plane in _srp_planes(dim, n_planes, seed=f"srp{t}")
        )
        tables_sql.append(f"concat({bits})")
    with_vec = embs.select(F.col(id_col), v.alias("__v")).select(
        F.col(id_col),
        F.expr("array(" + ", ".join(tables_sql) + ")").alias("_buckets"),
        let(
            l2_norm(F.col("__v")),
            lambda nrm: F.transform(F.col("__v"), lambda x: x / nrm),
        ).alias("unit"),
    )
    laid_out = with_vec.select(
        F.col(id_col),
        "unit",
        F.posexplode(F.col("_buckets")).alias("table", "bucket"),
    )
    a = laid_out.select(
        "table", "bucket", F.col(id_col).alias("a"), F.col("unit").alias("ua")
    )
    b = laid_out.select(
        "table", "bucket", F.col(id_col).alias("b"), F.col("unit").alias("ub")
    )
    cands = (
        a.join(b, ["table", "bucket"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "ua", "ub")
        .dropDuplicates(["a", "b"])
    )
    return (
        cands.withColumn("cos", dot(F.col("ua"), F.col("ub")))
        .where(F.col("cos") >= threshold)
        .select("a", "b", F.col("cos").alias("cosine"))
    )


def lsh_multitable_neardup_blocked(
    embs: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_block_rows: int | None = None,
) -> DataFrame:
    """`lsh_multitable_neardup` with BLOCK-LOCAL scoring: candidate
    semantics are identical (OR over n_tables SRP hash tables,
    equivalence-tested), but instead of materializing candidate pairs
    and evaluating an interpreted 64-term fold per pair, each (table,
    bucket) group scores ALL its within-bucket pairs in one vectorized
    numpy pass via `applyInPandas` — the dominant cost drops from
    per-pair expression interpretation to a dense rank-1-update loop.

    Float parity with the SQL oracle is preserved by construction:
    the pair score accumulates SEQUENTIALLY over dimensions
    (S += u[:,i]⊗u[:,i], i in order), the same association as the
    `aggregate(zip_with(...))` left fold and DuckDB's
    list_dot_product; unit vectors divide element-wise after a
    sequential sum of squares, mirroring `_SQL_UNIT`.

    Scale shape: ONE shuffle (the groupBy on (table, bucket)); each
    task holds one bucket's vectors — the block size is controlled by
    n_planes exactly like the expression variant.

    `max_block_rows`: hot-bucket skew guard. N-scaled planes keep the
    EXPECTED bucket size constant, but a degenerate corpus (one viral
    template duplicated millions of times) still lands one giant
    bucket, and a groupBy group is atomic — one task, an n×n score
    matrix, no help from AQE (skew-join splitting applies to joins,
    not aggregation groups). With max_block_rows set, each oversized
    bucket is cut into hash-assigned blocks of that many rows IN
    EXPECTATION (xxhash64(id) mod nblocks — no window pass anywhere,
    so not even the counting serializes the hot bucket) and every
    block-grid cell (bi ≤ bj) becomes its own task scoring only its
    ~B×B cross pairs. The pair SET and every cosine are bit-identical
    to the unblocked path (same per-pair dimension-sequential fold;
    coverage is assignment-independent); total work is the same
    Σ|bucket|² — the grid bounds per-task memory to ~B² and spreads
    the hot bucket across the cluster instead of pinning one executor.
    """
    import numpy as np
    import pandas as pd

    # all T×P hyperplane signs assembled as ONE SQL expression string:
    # one parse server-side instead of thousands of py4j Column calls
    # (the lsh_topk lesson — plan construction, not execution, is the
    # driver-side cost of literal-heavy expressions). NOTE: unrolling
    # each plane dot to an element_at sum (the SEISMIC pass-1 lesson)
    # was MEASURED here and reverted — 32 planes × 64 dims = 2048
    # multiply-adds in one projection blows past the codegen method
    # budget and lands on the interpreted expression TREE, 2.4× slower
    # than the fold (sf0.1 local[8]: direct 2.1 → 5.1 s); the lesson
    # applies to ≤ a few dozen unrolled terms, not thousands.
    def _arr(vec: list[float]) -> str:
        return "array(" + ", ".join(f"{x!r}D" for x in vec) + ")"

    def _dot_sql(arr_sql: str) -> str:
        return (
            f"aggregate(zip_with(__v, {arr_sql}, (x, y) -> x * y),"
            " 0.0D, (a, b) -> a + b)"
        )

    tables_sql = []
    for t in range(n_tables):
        bits = ", ".join(
            f"CASE WHEN {_dot_sql(_arr(plane))} >= 0.0D THEN '1' ELSE '0' END"
            for plane in _srp_planes(dim, n_planes, seed=f"srp{t}")
        )
        tables_sql.append(f"concat({bits})")
    buckets_sql = "array(" + ", ".join(tables_sql) + ")"
    laid = embs.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("__v")
    ).select(
        F.col(id_col),
        "__v",
        F.posexplode(F.expr(buckets_sql)).alias("table", "bucket"),
    )

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        empty = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                              "b": pd.Series([], dtype="int64"),
                              "cosine": pd.Series([], dtype="float64")})
        if n < 2:
            return empty
        ids = pdf[id_col].to_numpy()
        E = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["__v"]])
        norm2 = np.zeros(n)
        for i in range(E.shape[1]):  # sequential dims = the SQL fold
            norm2 = norm2 + E[:, i] * E[:, i]
        U = E / np.sqrt(norm2)[:, None]
        S = np.zeros((n, n))
        for i in range(U.shape[1]):
            S = S + U[:, i, None] * U[None, :, i]
        iu, ju = np.triu_indices(n, 1)
        cos = S[iu, ju]
        mask = cos >= threshold
        if not mask.any():
            return empty
        a_ids, b_ids = ids[iu[mask]], ids[ju[mask]]
        lo = np.minimum(a_ids, b_ids)
        hi = np.maximum(a_ids, b_ids)
        return pd.DataFrame({"a": lo, "b": hi, "cosine": cos[mask]})

    if max_block_rows is None:
        return (
            laid.groupBy("table", "bucket")
            .applyInPandas(score_bucket, "a long, b long, cosine double")
            .dropDuplicates(["a", "b"])
        )

    # Materialize the bucketed frame ONCE before the grid split
    # (optimization r10): the size aggregation, the tagged join probe,
    # the small-bucket branch and the grid cells otherwise each re-run
    # the T×P hyperplane-sign pass over the corpus (8 parquet scans in
    # the measured plan — the SRP fold is the expensive part). Guide
    # §8's "compute the fingerprint once", in-process: checkpointed
    # per query execution, never cached across runs; at 100 TB this
    # frame is the bucketing job's scratch output.
    laid = laid.localCheckpoint(eager=True)

    # --- hot-bucket grid path, gated on OBSERVED bucket size -------------
    # Bucket sizes come from a groupBy count (map-side partial agg —
    # even the hot bucket's count is computed DISTRIBUTED) shuffle-
    # joined back on (table, bucket). NOT broadcast: the size frame has
    # one row per non-empty bucket, which at N-scaled plane counts
    # grows with the corpus — not broadcastable at 100 TB. NOT a window
    # count (the round-6 shape): Window.partitionBy(table, bucket)
    # routes every row of the hot bucket through ONE task just to
    # count it — reintroducing the single-task hotspot this path
    # exists to avoid — whereas a shuffle join's probe side streams
    # and AQE can skew-split it.
    #
    # Block assignment is HASH-based (xxhash64(id) mod nblocks), not
    # row_number — a row_number window is, again, one serialized task
    # per hot bucket. Hash blocks hit max_block_rows in EXPECTATION
    # (binomial around the target), bounding per-cell memory
    # statistically rather than exactly: the right trade at 100 TB,
    # where the window's guaranteed bound costs a buffered pass over
    # the very bucket that is too big for one task. Pair coverage is
    # assignment-independent — rows x (block i) and y (block j, i ≤ j)
    # meet in exactly cell (i, j): x replicates as A to (i, k ≥ i) and
    # as B to (k < i, i) — and every cosine is the same row-local
    # dimension-sequential fold, so the output pair set is
    # bit-identical to the row_number version (equivalence-tested at
    # B ∈ {4, 16, 100000}).
    #
    # Cell replication is ONE explode, not joins: with cnt and bn in
    # hand, a row derives its own grid cells — the earlier 3-consumer
    # shape (grid frame + rows_a/rows_b equi-joins) re-computed the
    # bucket-hash scan three times and measured ~30-50% no-op
    # overhead. Replication is ~nb copies per row, never nb², and the
    # (table, bucket, bn_a, bn_b) shuffle spreads cells across the
    # cluster.
    sizes = laid.groupBy("table", "bucket").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    tagged = laid.join(sizes, ["table", "bucket"])
    small = tagged.where(F.col("__cnt") <= max_block_rows).drop("__cnt")
    small_pairs = small.groupBy("table", "bucket").applyInPandas(
        score_bucket, "a long, b long, cosine double"
    )

    nblocks = (
        ((F.col("__cnt") - F.lit(1)) / F.lit(max_block_rows)).cast("int")
        + F.lit(1)
    )
    blocked = (
        tagged.where(F.col("__cnt") > max_block_rows)
        .withColumn(
            "bn", F.pmod(F.xxhash64(F.col(id_col)), nblocks).cast("int")
        )
        .withColumn("nbm", nblocks - F.lit(1))
    )
    cells = blocked.select(
        "table",
        "bucket",
        F.col(id_col),
        "__v",
        F.explode(
            F.expr(
                "concat("
                " transform(sequence(bn, nbm),"
                "           j -> struct(bn AS bn_a, j AS bn_b, 'A' AS side)),"
                " CASE WHEN bn > 0 THEN"
                "   transform(sequence(0, bn - 1),"
                "             i -> struct(i AS bn_a, bn AS bn_b, 'B' AS side))"
                " ELSE array() END)"
            )
        ).alias("c"),
    ).select(
        "table", "bucket",
        F.col("c.bn_a").alias("bn_a"), F.col("c.bn_b").alias("bn_b"),
        id_col, "__v", F.col("c.side").alias("side"),
    )

    def score_grid(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                              "b": pd.Series([], dtype="int64"),
                              "cosine": pd.Series([], dtype="float64")})

        def unit(frame: pd.DataFrame):
            ids = frame[id_col].to_numpy()
            E = np.stack([np.asarray(x, dtype=np.float64) for x in frame["__v"]])
            norm2 = np.zeros(len(E))
            for i in range(E.shape[1]):  # sequential dims = the SQL fold
                norm2 = norm2 + E[:, i] * E[:, i]
            return ids, E / np.sqrt(norm2)[:, None]

        if pdf["bn_a"].iat[0] == pdf["bn_b"].iat[0]:
            sub = pdf[pdf["side"] == "A"]  # diagonal cell: A == B rows
            if len(sub) < 2:
                return empty
            ids, U = unit(sub)
            S = np.zeros((len(U), len(U)))
            for i in range(U.shape[1]):
                S = S + U[:, i, None] * U[None, :, i]
            iu, ju = np.triu_indices(len(U), 1)
            mask = S[iu, ju] >= threshold
            if not mask.any():
                return empty
            a_ids, b_ids = ids[iu[mask]], ids[ju[mask]]
            cosv = S[iu[mask], ju[mask]]
        else:
            fa, fb = pdf[pdf["side"] == "A"], pdf[pdf["side"] == "B"]
            if not len(fa) or not len(fb):
                return empty
            ids_a, Ua = unit(fa)
            ids_b, Ub = unit(fb)
            S = np.zeros((len(Ua), len(Ub)))
            for i in range(Ua.shape[1]):
                S = S + Ua[:, i, None] * Ub[None, :, i]
            mask = S >= threshold
            if not mask.any():
                return empty
            ia, jb = np.nonzero(mask)
            a_ids, b_ids, cosv = ids_a[ia], ids_b[jb], S[ia, jb]
        lo = np.minimum(a_ids, b_ids)
        hi = np.maximum(a_ids, b_ids)
        return pd.DataFrame({"a": lo, "b": hi, "cosine": cosv})

    big_pairs = (
        cells.groupBy("table", "bucket", "bn_a", "bn_b")
        .applyInPandas(score_grid, "a long, b long, cosine double")
    )
    # one global pair-dedup across both branches: the same pair can
    # surface from a small bucket in one table and a split bucket in
    # another
    return small_pairs.unionByName(big_pairs).dropDuplicates(["a", "b"])


def lsh_topk(
    embs: DataFrame,
    qv: list[float],
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query-time SRP-LSH top-k: hash the query into its bucket per
    table on the DRIVER (planes are deterministic md5 literals), scan
    only rows whose bucket matches in ANY table, exact-cosine the
    candidates, top-k.

    The bucket predicate is a pure column expression over the scan —
    candidate generation is a filter (no shuffle, no index lookup
    structure), pruning ~(1 − (1 − 2^-n_planes)^n_tables) of the
    corpus; at 100 TB, persisting the bucket ids as table columns
    (sources/layout.py discipline) turns the filter into partition
    pruning. Recall follows the multi-table OR-amplification of
    `lsh_multitable_neardup`.

    The whole predicate is assembled as ONE SQL expression string
    (single parse server-side): building the 16+ hyperplane dot
    products as Column-API higher-order functions costs ~2 s of
    py4j round-trips per query on the driver — 5× the actual
    execution time — while one `F.expr` parse is milliseconds.
    """
    dim = len(qv)

    def _arr(vec: list[float]) -> str:
        return "array(" + ", ".join(f"{x!r}D" for x in vec) + ")"

    def _dot_sql(vec_sql: str, arr_sql: str) -> str:
        return (
            f"aggregate(zip_with({vec_sql}, {arr_sql}, (x, y) -> x * y),"
            " 0.0D, (a, b) -> a + b)"
        )

    vec_sql = f"transform({vec_col}, x -> CAST(x AS double))"
    table_eqs = []
    for t in range(n_tables):
        planes = _srp_planes(dim, n_planes, seed=f"srp{t}")
        qbits = "".join(
            "1" if sum(q * p for q, p in zip(qv, plane)) >= 0.0 else "0"
            for plane in planes
        )
        bits = ", ".join(
            f"CASE WHEN {_dot_sql(vec_sql, _arr(plane))} >= 0.0D"
            " THEN '1' ELSE '0' END"
            for plane in planes
        )
        table_eqs.append(f"(concat({bits}) = '{qbits}')")
    cond = F.expr(" OR ".join(table_eqs))
    v = as_double(F.col(vec_col))
    return (
        embs.where(cond)
        .select(
            F.col(id_col).alias("doc_id"),
            F.round(cosine(v, lit_vector(qv)), 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(k)
    )
