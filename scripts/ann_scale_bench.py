"""Measure dense IVF vs brute-force cosine AT INDEX SCALE — the dense
counterpart of scripts/seismic_scale_bench.py (round-6's measured
SEISMIC anchor). The claim under test is the one ann.py's docstrings
make for 100 TB: with the corpus written PARTITIONED BY cluster_id,
an nprobe/ncells probe filter becomes partition pruning at the file
source, so IVF query cost is ~nprobe/ncells of the full scan while
brute force grows linearly with the corpus.

Corpus: a Gaussian-mixture embedding table (1024 latent centers,
dim 32, L2-normalized) — clustered structure is IVF's design
assumption, mirroring how seismic_scale_bench generates SPLADE-shaped
postings instead of abusing the tiny synthetic text corpus.

Pipeline measured:
- ingest: k-means centroids (sampled, numpy Lloyd) → ivf_assign_arrow
  (one matmul per Arrow batch — the |C|=256 regime where the
  expression form's plan would carry 256 struct cosines per row) →
  write partitionBy(cluster_id).
- exact: full scan of the SAME table, dot_lit codegen scoring (the
  unrolled form; vectors are unit-norm so dot == cosine), top-10.
- IVF: identical scan + probe filter on the partition column
  (`.where(cluster_id.isin(probes))` → PartitionFilters at the scan,
  verified in the printed plan) — nprobe=8 of 256 cells.
- recall@10 of IVF vs exact per query.

Usage: python scripts/ann_scale_bench.py [n_docs] [n_queries]
Writes the table to stdout; BASELINE.md/SCALING.md record the run.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/tmp/ann_scale"
# ANN_SCALE_DIM sweeps the embedding width (round-8: dim 384 is the
# production-embedding regime where PQ's I/O win shows up in latency,
# not just footprint — BASELINE.md records both runs). Artifacts of
# different dims get distinct paths; dim 32 keeps the legacy names so
# the round-7 corpus is reused.
DIM = int(os.environ.get("ANN_SCALE_DIM", "32"))
_DTAG = "" if DIM == 32 else f"_d{DIM}"
N_CENTERS = 1024  # latent mixture centers in the corpus
K_CELLS = 256     # IVF cells
NPROBE = 16
SEED = 20260816


def build_vectors(n_docs: int) -> str:
    path = f"{OUT}/vectors_{n_docs}{_DTAG}.parquet"
    if os.path.exists(path):
        print(f"vectors exist: {path}")
        return path
    os.makedirs(OUT, exist_ok=True)
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(SEED)
    centers = rng.standard_normal((N_CENTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # iid noise norm grows with √dim while the unit centers don't, so a
    # fixed per-component σ makes high dims GEOMETRICALLY harder (at
    # dim 384, σ=0.2 noise has norm ~3.9 vs the unit center — vectors
    # are near-uniform on the sphere and any cell structure vanishes).
    # Scale σ by √(32/dim) to keep the noise-to-center angle identical
    # to the dim-32 corpus: the cross-dim comparison then isolates the
    # per-row I/O+compute effect (the claim under test), not a change
    # in clusterability.
    sigma = 0.2 * (32.0 / DIM) ** 0.5
    writer = None
    chunk = 500_000
    for start in range(0, n_docs, chunk):
        n = min(chunk, n_docs - start)
        which = rng.integers(0, N_CENTERS, n)
        v = centers[which] + sigma * rng.standard_normal((n, DIM))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        tbl = pa.table({
            "vec_id": np.arange(start, start + n, dtype=np.int64),
            "embedding": list(v.astype(np.float32)),
        })
        if writer is None:
            writer = pq.ParquetWriter(path, tbl.schema)
        writer.write_table(tbl)
    writer.close()
    print(f"built vectors: {n_docs} x {DIM}")
    return path


def kmeans_centroids(path: str, k: int, sample: int = 200_000,
                     iters: int = 6) -> list[tuple[int, list[float]]]:
    """Centroids are persisted next to the vectors: DuckDB's reservoir
    sample is not deterministic across processes even with REPEATABLE,
    and probes computed from re-trained centroids would point at the
    wrong cells of a cached index (recall collapses to ~0 — measured,
    that's why this cache exists)."""
    import duckdb

    cpath = path.replace(".parquet", f"_centroids_{k}.npy")
    if os.path.exists(cpath):
        C = np.load(cpath)
        print(f"centroids loaded: {cpath}")
        return [(int(j), [float(x) for x in C[j]]) for j in range(k)]

    t0 = time.perf_counter()
    V = np.array(
        duckdb.sql(
            f"SELECT embedding FROM '{path}' "
            f"USING SAMPLE reservoir({sample} ROWS) REPEATABLE ({SEED})"
        ).fetchnumpy()["embedding"].tolist(),
        dtype=np.float64,
    )
    rng = np.random.default_rng(SEED + 1)
    C = V[rng.choice(len(V), k, replace=False)]
    for _ in range(iters):
        C_ = C / np.linalg.norm(C, axis=1, keepdims=True)
        a = np.argmax(V @ C_.T, axis=1)
        for j in range(k):
            m = a == j
            if m.any():
                C[j] = V[m].mean(axis=0)
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    np.save(cpath, C)
    print(f"kmeans: {k} cells over {len(V)} samples, "
          f"{time.perf_counter() - t0:.1f}s")
    return [(int(j), [float(x) for x in C[j]]) for j in range(k)]


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    nprobe = int(sys.argv[3]) if len(sys.argv) > 3 else NPROBE
    path = build_vectors(n_docs)
    centroids = kmeans_centroids(path, K_CELLS)

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import functions as F

    from neural_search_spark.functions.vector import dot_lit
    from neural_search_spark.operators.ann import ivf_assign_arrow
    from neural_search_spark.session import get_spark

    spark = get_spark("ann-scale")
    vectors = spark.read.parquet(path)

    # ---- ingest: assign + partitioned layout ----
    idx_path = f"{OUT}/ivf_{n_docs}{_DTAG}"
    t0 = time.perf_counter()
    if not os.path.exists(idx_path):
        assigned = ivf_assign_arrow(vectors, centroids)
        # repartition ON the partition column before partitionBy: else
        # every task holds open writers+buffers for up to |cells| files
        # at once — 32 tasks × 256 cells of wide rows OOMed the 4M×384
        # write (measured round 8); clustered, each task streams into
        # its own cell's files. This is the production layout-write
        # pattern at any scale.
        (
            vectors.join(assigned, "vec_id")
            .repartition("cluster_id")
            .write.partitionBy("cluster_id")
            .parquet(idx_path)
        )
    build_s = time.perf_counter() - t0
    index = spark.read.parquet(idx_path)
    print(f"IVF layout build: {build_s:.1f}s  rows: {index.count()}")

    # ---- queries: perturbed corpus vectors ----
    rng = np.random.default_rng(SEED + 2)
    q_ids = rng.integers(0, n_docs, n_queries)
    base = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in vectors.where(
            F.col("vec_id").isin([int(i) for i in q_ids])
        ).collect()
    }
    C = np.array([v for _, v in centroids])
    queries = []
    for qid in q_ids:
        # query noise scales like the corpus noise (see build_vectors):
        # constant σ would push the query ~45° off its base at dim 384
        qv = base[int(qid)] + 0.05 * (32.0 / DIM) ** 0.5 * rng.standard_normal(DIM)
        qv /= np.linalg.norm(qv)
        queries.append([float(x) for x in qv])

    def timed(fn, reps=2):
        best, out = float("inf"), None
        fn()  # warm
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t0)
        return best, out

    from neural_search_spark.operators.ann import dense_scores_arrow

    def scored(frame, qv):
        # dot_lit's bit-exact unrolled chain caps at ~dim 300 (the
        # column converter recurses per term — StackOverflow at 384);
        # wide production dims score through the Arrow matvec kernel.
        if DIM <= 64:
            return frame.select(
                "vec_id", dot_lit(F.col("embedding"), qv).alias("score")
            )
        return dense_scores_arrow(frame, qv)

    rows = []
    for qi, qv in enumerate(queries):
        t_ex, ex = timed(
            lambda: scored(index, qv)
            .orderBy(F.col("score").desc(), "vec_id").limit(10).collect()
        )
        ex_ids = [r["vec_id"] for r in ex]

        probes = np.argsort(-(C @ np.array(qv)))[:nprobe]
        probe_ids = [int(p) for p in probes]
        t_iv, iv = timed(
            lambda: scored(
                index.where(F.col("cluster_id").isin(probe_ids)), qv
            )
            .orderBy(F.col("score").desc(), "vec_id").limit(10).collect()
        )
        iv_ids = [r["vec_id"] for r in iv]
        rec = len(set(iv_ids) & set(ex_ids)) / 10.0
        rows.append((qi, t_ex, t_iv, t_ex / t_iv, rec))
        print(f"q{qi}: exact {t_ex:.2f}s  ivf {t_iv:.2f}s  "
              f"speedup {t_ex / t_iv:.1f}x  recall@10 {rec:.2f}")

    # plan evidence: the probe filter must be a PartitionFilter
    plan = (
        index.where(F.col("cluster_id").isin([1, 2]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    pruned = "PartitionFilters: [" in plan and "cluster_id" in plan.split(
        "PartitionFilters:"
    )[1][:200]
    print(f"probe filter is partition pruning: {pruned}")

    import statistics as st

    sp = [r[3] for r in rows]
    rc = [r[4] for r in rows]
    print(f"\nSUMMARY docs={n_docs} dim={DIM} cells={K_CELLS} "
          f"nprobe={nprobe}: median speedup {st.median(sp):.1f}x "
          f"(min {min(sp):.1f}x), mean recall@10 {st.mean(rc):.2f} "
          f"(min {min(rc):.2f}); layout build {build_s:.1f}s")


if __name__ == "__main__":
    main()
