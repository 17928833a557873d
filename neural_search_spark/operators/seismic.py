"""SEISMIC sparse ANN as a Spark data layout (SURVEY.md §2.9, A1–A6).

The reference implements SEISMIC (Bruch et al., SIGIR 2024) as a custom
Lucene codec: per-token posting lists are truncated (A2), byte-quantized
(A1), clustered (A3), and each cluster carries a pruned "summary"
vector (A4); search skips whole clusters whose summary·query falls
below a heap-derived threshold (A5), scoring only surviving members
exactly via a forward index (A6).

Spark realization — layout instead of codec:
- build produces two tables:
    postings_clustered(token, cluster_id, summary map<string,double>,
                       members array<id>)   — bucket/partition by token
    forward(doc_id, vector map<string,double>)
- search is a plan: broadcast the query's top_n tokens → join the
  clustered postings (partition pruning on token) → summary dot →
  static two-pass threshold (the adaptive heap of
  `sparse/query/SeismicBaseScorer.java:136-180` has no lazy-plan
  equivalent; pass 1 estimates the k-th summary score, pass 2 keeps
  clusters within heap_factor of it) → explode members → join forward
  → exact dot → top-k.

Determinism deviation from the reference: cluster centers are the
top-weight postings rather than random picks
(`sparse/algorithm/seismic/RandomClusteringAlgorithm.java:42-61` uses
`Collections.shuffle`) — same structure, reproducible builds.

Defaults follow `sparse/common/SparseConstants.java:31-39`:
n_postings 0.0005×docs (min 160), cluster_ratio 0.1,
summary_prune_ratio 0.4, quantization ceilings 3.0/16.0,
approximate_threshold 1,000,000; search params top_n 10, k 10,
heap_factor 1.0 (`sparse/query/SparseAnnQueryBuilder.java:85-87`).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .retrieval import sparse_topk_postings

CLUSTER_RATIO = 0.1
SUMMARY_PRUNE_RATIO = 0.4
N_POSTINGS_RATIO = 0.0005
N_POSTINGS_MIN = 160
QUANT_CEIL_INGEST = 3.0
QUANT_CEIL_SEARCH = 16.0
APPROXIMATE_THRESHOLD = 1_000_000
DEFAULT_TOP_N = 10
DEFAULT_HEAP_FACTOR = 1.0


def quantize_expr(w, ceiling: float):
    """A1 byte quantization (`sparse/quantization/ByteQuantizer.java:24-33`)."""
    clamped = F.least(F.greatest(w, F.lit(0.0)), F.lit(ceiling))
    return F.round(clamped * 255.0 / ceiling).cast("int")


@dataclass
class SeismicIndex:
    postings_clustered: DataFrame  # token, cluster_id, summary, members
    forward: DataFrame  # doc_id, vector (quantized map)
    n_docs: int


_CLUSTER_SCHEMA = (
    "token string, cluster_id int, summary map<string,double>, members array<long>"
)


def _cluster_token_group(pdf: pd.DataFrame, summary_prune_ratio: float = SUMMARY_PRUNE_RATIO) -> pd.DataFrame:
    """A3+A4 for one token's (truncated) posting list — runs as
    applyInPandas per token; lists are ≤ n_postings rows so the Python
    work is tiny and fully data-parallel across tokens.

    `summary_prune_ratio` < 1.0 keeps the heaviest entries covering
    that fraction of summary mass (the reference's 40% default,
    `PostingsProcessingUtils.java:70-108`) — the bound then UNDER-
    estimates some members' scores and threshold pruning is heuristic;
    at 1.0 the summary is a true upper bound and adaptive
    heap_factor=1.0 search is provably exact."""
    token = pdf["token"].iloc[0]
    pdf = pdf.sort_values(["q", "doc_id"], ascending=[False, True]).reset_index(drop=True)
    n = len(pdf)
    k = max(1, math.ceil(n * CLUSTER_RATIO))
    center_vecs = [dict(v) for v in pdf["vector"].iloc[:k]]

    def dot(a: dict, b: dict) -> float:
        # summed in sorted-token order: dict iteration order inherits
        # the Arrow map entry order, which can differ between physical
        # executions of the same plan — a float-summation-order hazard
        # that flips near-tie cluster assignments (and with a lazy,
        # unpersisted build, two actions over the index could then see
        # DIFFERENT clusterings). Sorting makes the kernel a pure
        # function of the group's row set.
        if len(b) < len(a):
            a, b = b, a
        return sum(w * b[t] for t, w in sorted(a.items()) if t in b)

    assignments: list[list[int]] = [[] for _ in range(k)]
    vecs = pdf["vector"].tolist()
    ids = pdf["doc_id"].tolist()
    for i in range(n):
        v = dict(vecs[i])
        best, best_d = 0, -1.0
        for c in range(k):
            d = dot(v, center_vecs[c])
            if d > best_d:
                best, best_d = c, d
        assignments[best].append(i)

    rows = []
    for c, members in enumerate(assignments):
        if not members:
            continue
        # summary = token-wise max over member vectors (A4)…
        summary: dict[str, float] = {}
        for i in members:
            for t, w in dict(vecs[i]).items():
                if w > summary.get(t, -1.0):
                    summary[t] = w
        # …pruned to the heaviest entries covering summary_prune_ratio
        # of total mass (`PostingsProcessingUtils.java:70-108`)
        total = sum(summary.values())
        kept: dict[str, float] = {}
        acc = 0.0
        for t, w in sorted(summary.items(), key=lambda kv: (-kv[1], kv[0])):
            if acc > summary_prune_ratio * total:
                break
            kept[t] = w
            acc += w
        rows.append((token, c, kept, [ids[i] for i in members]))
    return pd.DataFrame(rows, columns=["token", "cluster_id", "summary", "members"])


def build_seismic(
    postings: DataFrame,
    id_col: str = "doc_id",
    summary_prune_ratio: float = SUMMARY_PRUNE_RATIO,
) -> SeismicIndex:
    """Build the SEISMIC layout from (doc_id, token, weight) postings.

    One window pass (truncation A2 + quantization A1), one map-side
    groupBy to form the forward index, one applyInPandas over tokens
    (A3+A4). At scale, write both outputs bucketed: postings by token
    (search prunes on token), forward by doc_id (member lookup is a
    co-located join).
    """
    n_docs = postings.select(id_col).distinct().count()
    n_keep = max(int(math.ceil(n_docs * N_POSTINGS_RATIO)), N_POSTINGS_MIN)

    q = postings.withColumn("q", quantize_expr(F.col("weight"), QUANT_CEIL_INGEST).cast("double"))
    # forward index: quantized sparse vector per doc (A6)
    forward = q.groupBy(id_col).agg(
        F.map_from_entries(F.collect_list(F.struct("token", "q"))).alias("vector")
    )
    # A2: per-token top-n_postings by weight
    w = Window.partitionBy("token").orderBy(F.col("q").desc(), F.col(id_col))
    truncated = q.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= n_keep)
    with_vec = truncated.join(forward, id_col).select(id_col, "token", "q", "vector")
    clustered = with_vec.groupBy("token").applyInPandas(
        lambda pdf: _cluster_token_group(pdf, summary_prune_ratio), _CLUSTER_SCHEMA
    )
    return SeismicIndex(postings_clustered=clustered, forward=forward, n_docs=n_docs)


def seismic_search(
    index: SeismicIndex,
    query_tokens: dict[str, float],
    k: int = 10,
    top_n: int = DEFAULT_TOP_N,
    heap_factor: float = DEFAULT_HEAP_FACTOR,
    id_col: str = "doc_id",
    adaptive: bool = False,
    probe: int | None = None,
) -> DataFrame:
    """A5 cluster-skipping search.

    Returns (doc_id, score) top-k where score is the exact quantized
    dot product over the forward index for surviving cluster members.

    Two pruning modes, both one lazy plan (no driver collect):
    - static (default): threshold = k-th cluster summary UPPER BOUND /
      heap_factor — the original two-pass approximation.
    - adaptive=True: the Spark analogue of the reference's running-heap
      threshold (`sparse/query/SeismicBaseScorer.java:207-225`). The
      heap's "k-th best so far" becomes a PROBE stage: exact-score the
      members of the `probe` clusters with the highest summary bounds
      (the docs the sequential scorer would visit first), take the
      k-th exact score, and prune every cluster whose summary bound
      falls below it / heap_factor. With UNPRUNED summaries the bound
      is a true upper bound and heap_factor=1.0 is provably exact;
      with the reference's 40%-mass summary pruning it is the same
      heuristic the reference runs (empirically exact on the test
      corpora — gated in tests/test_seismic.py). heap_factor > 1
      keeps more clusters, < 1 prunes aggressively — same knob
      direction as the static mode.
    """
    spark = index.postings_clustered.sparkSession
    # quantize the query like the reference's search-side ceiling — to
    # an INTEGER byte value (A1 applies to both sides): with integer
    # query weights and the integer-valued forward index, every dot
    # product and partial sum below is an exact integer in a double, so
    # scores are bit-identical regardless of aggregation order across
    # partitions (a float-valued query weight made exact_of's groupBy
    # sum order-sensitive — ULP-level run-to-run drift that flaked the
    # adaptive-vs-full equality test under full-suite scheduling)
    qt = {
        t: float(math.floor(min(max(w, 0.0), QUANT_CEIL_SEARCH) * 255.0 / QUANT_CEIL_SEARCH + 0.5))
        for t, w in sorted(query_tokens.items(), key=lambda kv: (-kv[1], kv[0]))[:top_n]
    }
    from .retrieval import token_frame

    q_df = token_frame(spark, qt)

    # pass 1: summary upper-bound score per (token, cluster). The dot
    # with the query is UNROLLED over the <= top_n query tokens as a
    # sum of element_at lookups — a fixed codegen expression — instead
    # of a map_zip_with/aggregate fold, which runs INTERPRETED per row
    # (the expression-engine lesson: higher-order functions get no
    # whole-stage codegen). At 4M docs (≈1M (token,cluster) rows) the
    # fold dominated pass 1; the unrolled form cut the whole search
    # ~2.5 s → ~1.5 s warm. Term order is the fixed qt insertion order
    # (weight-desc, token tie-break), so the float sum is deterministic.
    cand = index.postings_clustered.join(F.broadcast(q_df), "token")
    # seed 0.0 so an empty query map yields summary_dot = 0.0 (the
    # F.aggregate fold this unrolling replaced returned 0.0 there);
    # 0.0 + x is exact in IEEE754, so the float-sum order is unchanged.
    # r10: the unrolled sum is ONE SQL string parsed server-side — the
    # per-term Column loop cost ~4 py4j round trips per query token
    # (~0.8 s of driver time per invocation at ~100 tokens). Identical
    # term order (qt insertion order) and identical ops.
    def _sql_str(t: str) -> str:
        return "'" + t.replace("\\", "\\\\").replace("'", "\\'") + "'"

    sdot_sql = " + ".join(
        ["0.0D"]
        + [
            f"(coalesce(element_at(summary, {_sql_str(t)}), 0.0D)"
            f" * {float(w)!r}D)"
            for t, w in qt.items()
        ]
    )
    scored_clusters = cand.select(
        "token", "cluster_id", "members", F.expr(sdot_sql).alias("summary_dot")
    )

    def exact_of(members_df: DataFrame) -> DataFrame:
        return (
            members_df.join(index.forward, id_col)
            .join(
                F.broadcast(q_df),
                F.map_contains_key(F.col("vector"), F.col("token")),
            )
            .select(
                id_col,
                (F.col("qw") * F.element_at(F.col("vector"), F.col("token"))).alias("p"),
            )
            .groupBy(id_col)
            .agg(F.sum("p").alias("score"))
        )

    if adaptive:
        # probe = the clusters a sequential heap scorer would visit
        # first (highest summary bounds). A cluster is a (token,
        # cluster_id) entity — cluster_id alone is only unique WITHIN a
        # token's posting list, so deduping on bare cluster_id kept an
        # arbitrary token's row (scheduler-dependent: the source of a
        # consistent full-suite-only test failure). Rows of
        # postings_clustered are already unique per (token, cluster_id);
        # the integer summary_dot + (token, cluster_id) tie-break makes
        # the probe choice a total order.
        probe_n = probe if probe is not None else max(k, 4)
        top_probe = (
            scored_clusters.select("token", "cluster_id", "members", "summary_dot")
            .orderBy(F.col("summary_dot").desc(), "token", "cluster_id")
            .limit(probe_n)
        )
        probe_members = top_probe.select(F.explode("members").alias(id_col)).distinct()
        kth_df = (
            exact_of(probe_members)
            .select("score")
            .orderBy(F.col("score").desc())
            .limit(k)
            .agg((F.min("score") / F.lit(float(heap_factor))).alias("threshold"))
            .where(F.col("threshold").isNotNull())
        )
    else:
        # static threshold = kth summary upper bound / heap_factor,
        # computed INSIDE the plan as a 1-row broadcast frame (no
        # driver collect; an empty candidate set yields an empty cross
        # join, i.e. an empty result, for free)
        kth_df = (
            scored_clusters.select("summary_dot")
            .orderBy(F.col("summary_dot").desc())
            .limit(k)
            .agg((F.min("summary_dot") / F.lit(float(heap_factor))).alias("threshold"))
            .where(F.col("threshold").isNotNull())
        )

    # pass 2: exact scoring of surviving clusters' members
    survivors = scored_clusters.crossJoin(F.broadcast(kth_df)).where(
        F.col("summary_dot") >= F.col("threshold")
    )
    members = survivors.select(F.explode("members").alias(id_col)).distinct()
    if adaptive:
        # probed docs are already exact-scored candidates; keep them in
        # the final set even if their cluster's bound fell under the
        # threshold (the heap never evicts what it has already scored)
        members = members.unionByName(
            top_probe.select(F.explode("members").alias(id_col))
        ).distinct()
    exact = exact_of(members)
    return exact.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def merge_rebuild(postings: DataFrame, new_postings: DataFrame, id_col: str = "doc_id") -> SeismicIndex:
    """S5 segment-merge re-clustering: on merge, the reference re-runs
    SEISMIC clustering over the merged segment in background threads
    (`sparse/codec/MergeHelper.java`,
    `sparse/algorithm/seismic/BatchClusteringTask.java`). Spark shape:
    an OPTIMIZE-style batch job unioning the postings and rebuilding the
    clustered layout — idempotent, schedulable, no incremental state."""
    return build_seismic(postings.unionByName(new_postings), id_col=id_col)


def sparse_ann_topk(
    postings: DataFrame,
    query_tokens: dict[str, float],
    k: int = 10,
    id_col: str = "doc_id",
    approximate_threshold: int = APPROXIMATE_THRESHOLD,
    top_n: int = DEFAULT_TOP_N,
    heap_factor: float = DEFAULT_HEAP_FACTOR,
    adaptive: bool = False,
) -> DataFrame:
    """R7/R8: SEISMIC when the segment is big enough, exact otherwise.

    Parity: `sparse/query/SparseQueryWeight.java:100-102` — segments
    under `approximate_threshold` docs use exact FeatureField scoring.
    ``top_n``/``heap_factor`` mirror the SparseAnnQueryBuilder params
    (`sparse/query/SparseAnnQueryBuilder.java:85-87`); they only apply
    on the approximate path — exact scoring uses every query token.
    """
    n_docs = postings.select(id_col).distinct().count()
    if n_docs < approximate_threshold:
        return sparse_topk_postings(postings, query_tokens, k=k, id_col=id_col)
    index = build_seismic(postings, id_col=id_col)
    qmx = max(query_tokens.values()) or 1.0
    scaled = {t: w / qmx * QUANT_CEIL_SEARCH for t, w in query_tokens.items()}
    return seismic_search(
        index, scaled, k=k, top_n=top_n, heap_factor=heap_factor, id_col=id_col,
        adaptive=adaptive,
    )
