"""IVF-PQ at index scale — extends scripts/ann_scale_bench.py's 4M
measurement with the compressed-codes tier: within the probed cells
only the PQ codes are scanned (integer ADC), and the wide float
vectors are joined for just the shortlist rescore. Reuses the
vectors, persisted centroids and partitioned IVF layout that
ann_scale_bench built under /tmp/ann_scale.

Usage: python scripts/ann_scale_pq.py [n_docs] [n_queries] [nprobe]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/tmp/ann_scale"
# ANN_SCALE_DIM mirrors ann_scale_bench.py: dim 384 is the
# production-embedding regime (1536 B/row float32) where scanning
# 48 B PQ codes instead of the wide vectors wins LATENCY, not just
# footprint — at dim 32 (128 B/row) the I/O delta is hidden by the
# per-row CPU cost and plain IVF wins (BASELINE.md r7 note).
DIM = int(os.environ.get("ANN_SCALE_DIM", "32"))
_DTAG = "" if DIM == 32 else f"_d{DIM}"
K_CELLS = 256
SEED = 20260816


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    nprobe = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    vec_path = f"{OUT}/vectors_{n_docs}{_DTAG}.parquet"
    idx_path = f"{OUT}/ivf_{n_docs}{_DTAG}"
    cen_path = vec_path.replace(".parquet", f"_centroids_{K_CELLS}.npy")
    for p in (vec_path, idx_path, cen_path):
        if not os.path.exists(p):
            sys.exit(f"missing {p} — run scripts/ann_scale_bench.py first")

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import functions as F

    from neural_search_spark.functions.vector import dot_lit
    from neural_search_spark.operators import pq as PQ
    from neural_search_spark.session import get_spark

    spark = get_spark("ann-scale-pq")
    C = np.load(cen_path)
    centroids = [(int(j), [float(x) for x in C[j]]) for j in range(K_CELLS)]
    index = spark.read.parquet(idx_path)  # vec_id, embedding, cluster_id

    # ---- ingest: train codebooks on a sample, encode codes table ----
    # m scales with dim at dsub=8 floats/subspace (dim 32 keeps the
    # legacy m=8/dsub=4 so the r7 codes table is reused): k=256 codes
    # → 1 byte/subspace, so compression = 4*dim/m bytes-over-bytes.
    m_sub = 8 if DIM == 32 else max(8, DIM // 8)
    codes_path = f"{OUT}/pq_{n_docs}{_DTAG}"
    t0 = time.perf_counter()
    books = PQ.train_codebooks(index, m=m_sub, k=256, sample_n=8192)
    if not os.path.exists(codes_path):
        (
            PQ.encode_pq(index, books)
            .join(index.select("vec_id", "cluster_id"), "vec_id")
            .write.partitionBy("cluster_id")
            .parquet(codes_path)
        )
    build_s = time.perf_counter() - t0
    codes = spark.read.parquet(codes_path)
    print(f"PQ codes build: {build_s:.1f}s  rows: {codes.count()}  "
          f"m={len(books)} k={len(books[0])}")

    # ---- forward index: id-SORTED wide table, small row groups ----
    # The serving-system rescore layout (judge r8 #3): globally sorted
    # by vec_id via repartitionByRange + sortWithinPartitions, row
    # groups capped at 128 KB so an In(vec_id, shortlist) predicate
    # prunes at row-group granularity — the rescore reads ~shortlist
    # row groups instead of the probed 1/nprobe wide slice.
    fwd_path = f"{OUT}/fwd_{n_docs}{_DTAG}"
    if not os.path.exists(fwd_path):
        t0 = time.perf_counter()
        (
            spark.read.parquet(vec_path)
            .repartitionByRange(max(32, n_docs // 8192), "vec_id")
            .sortWithinPartitions("vec_id")
            .write.option("parquet.block.size", 131072)
            .parquet(fwd_path)
        )
        print(f"forward layout build: {time.perf_counter() - t0:.1f}s")
    forward = spark.read.parquet(fwd_path)

    rng = np.random.default_rng(SEED + 2)
    q_ids = rng.integers(0, n_docs, n_queries)
    vectors = spark.read.parquet(vec_path)
    base = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in vectors.where(
            F.col("vec_id").isin([int(i) for i in q_ids])
        ).collect()
    }
    queries = []
    for qid in q_ids:
        # query noise scales like the corpus noise (see build_vectors):
        # constant σ would push the query ~45° off its base at dim 384
        qv = base[int(qid)] + 0.05 * (32.0 / DIM) ** 0.5 * rng.standard_normal(DIM)
        qv /= np.linalg.norm(qv)
        queries.append([float(x) for x in qv])

    def timed(fn, reps=2):
        best, out = float("inf"), None
        fn()
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t0)
        return best, out

    import statistics as st

    from neural_search_spark.operators.ann import dense_scores_arrow

    def scored(frame, qv):
        # same dim gate as ann_scale_bench: dot_lit's unrolled chain
        # overflows the column converter above ~300 terms
        if DIM <= 64:
            return frame.select(
                "vec_id", dot_lit(F.col("embedding"), qv).alias("score")
            )
        return dense_scores_arrow(frame, qv)

    sp, rc, ivf_sp, fw_sp = [], [], [], []
    for qi, qv in enumerate(queries):
        t_ex, ex = timed(
            lambda: scored(index, qv)
            .orderBy(F.col("score").desc(), "vec_id").limit(10).collect()
        )
        ex_ids = [r["vec_id"] for r in ex]

        probes = np.argsort(-(C @ np.array(qv)))[:nprobe]
        probe_ids = [int(p) for p in probes]
        t_iv, _ = timed(
            lambda: scored(
                index.where(F.col("cluster_id").isin(probe_ids)), qv
            )
            .orderBy(F.col("score").desc(), "vec_id").limit(10).collect()
        )
        # rescore against the probe-pruned clustered frame, not the
        # full vectors table: shortlist members are in probed cells by
        # construction, so the join reads the same pruned slice the
        # IVF scan reads — the docstring's shortlist-only cost model
        pruned = index.where(
            F.col("cluster_id").isin(probe_ids)
        ).select("vec_id", "embedding")
        t_pq, pqr = timed(
            lambda: PQ.ivfpq_topk_arrow(
                codes, pruned, books, centroids, qv,
                k=10, nprobe=nprobe, shortlist=400,
            ).collect()
        )
        pq_ids = [r["doc_id"] for r in pqr]
        rec = len(set(pq_ids) & set(ex_ids)) / 10.0

        # forward-index rescore: IN-list pushdown into the sorted
        # layout replaces the join against the probed wide slice
        t_fw, fwr = timed(
            lambda: PQ.ivfpq_topk_forward(
                codes, forward, books, centroids, qv,
                k=10, nprobe=nprobe, shortlist=400,
            ).collect()
        )
        fw_ids = [r["doc_id"] for r in fwr]
        rec_fw = len(set(fw_ids) & set(ex_ids)) / 10.0
        assert fw_ids == pq_ids, "forward rescore must match join rescore"

        sp.append(t_ex / t_pq)
        ivf_sp.append(t_ex / t_iv)
        fw_sp.append(t_ex / t_fw)
        rc.append(rec)
        print(f"q{qi}: exact {t_ex:.2f}s  ivf {t_iv:.2f}s  "
              f"ivfpq {t_pq:.2f}s  ivfpq-fwd {t_fw:.2f}s  "
              f"speedup {t_ex / t_pq:.1f}x/{t_ex / t_fw:.1f}x  "
              f"recall@10 {rec:.2f}/{rec_fw:.2f}")

    print(f"\nSUMMARY docs={n_docs} cells={K_CELLS} nprobe={nprobe} "
          f"shortlist=400: IVF-PQ median speedup {st.median(sp):.1f}x, "
          f"IVF-PQ-FORWARD {st.median(fw_sp):.1f}x "
          f"(IVF alone {st.median(ivf_sp):.1f}x), mean recall@10 "
          f"{st.mean(rc):.2f} (min {min(rc):.2f}); codes build "
          f"{build_s:.1f}s")


if __name__ == "__main__":
    main()
