"""Sparse-vector pruning — parity with `util/prune/PruneUtils.java`.

All four strategies plus the split (two-phase) variant. Inputs are map
columns `map<string,double>`; everything is JVM-side higher-order
functions — no UDFs, so pruning is vectorized inside codegen.

Reference semantics (`util/prune/PruneUtils.java`):
- top_k      (:34-62)  keep the k largest weights
- max_ratio  (:73-93)  keep weights >= ratio * max(weight)
- abs_value  (:96-122) keep weights >= threshold
- alpha_mass (:125-156) keep largest weights until their cumulative
  mass exceeds alpha * total mass (the element crossing the boundary is
  kept, matching the reference's `while sum <= alpha*total` loop)
- split variants (:170-209) return (kept, pruned) halves.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _sorted_entries(m: Column) -> Column:
    # entries sorted by weight desc, key asc for determinism
    return F.array_sort(
        F.map_entries(m),
        lambda a, b: F.when(a["value"] > b["value"], -1)
        .when(a["value"] < b["value"], 1)
        .when(a["key"] < b["key"], -1)
        .when(a["key"] > b["key"], 1)
        .otherwise(0),
    )


def prune_top_k(m: Column, k: int) -> Column:
    return F.map_from_entries(F.slice(_sorted_entries(m), 1, k))


def prune_max_ratio(m: Column, ratio: float) -> Column:
    mx = F.array_max(F.map_values(m))
    return F.map_filter(m, lambda k, v: v >= ratio * mx)


def prune_abs_value(m: Column, threshold: float) -> Column:
    return F.map_filter(m, lambda k, v: v >= threshold)


def prune_alpha_mass(m: Column, alpha: float) -> Column:
    """Keep the largest entries while the running mass (inclusive of the
    current entry's predecessor) is <= alpha * total, i.e. the first
    entry to push cumulative mass past alpha is still kept."""
    ent = _sorted_entries(m)
    total = F.aggregate(F.map_values(m), F.lit(0.0), lambda a, x: a + x)
    # prefix[i] = sum of weights strictly before i. O(n²) per map, fine
    # for pruned sparse vectors (tens-to-hundreds of tokens).
    n = F.size(ent)
    # guard: sequence(0, -1) would generate a DESCENDING range in Spark
    idx = F.when(n >= 1, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    kept = F.filter(
        F.zip_with(
            ent,
            idx,
            lambda e, i: F.struct(
                e["key"].alias("key"),
                e["value"].alias("value"),
                F.aggregate(
                    F.slice(ent, 1, i), F.lit(0.0), lambda a, x: a + x["value"]
                ).alias("prefix"),
            ),
        ),
        lambda s: s["prefix"] <= alpha * total,
    )
    return F.map_from_entries(
        F.transform(kept, lambda s: F.struct(s["key"].alias("key"), s["value"].alias("value")))
    )


def prune_split(m: Column, kept: Column) -> Column:
    """The pruned complement (two-phase path, PruneUtils.java:170-209)."""
    return F.map_filter(m, lambda k, v: ~F.array_contains(F.map_keys(kept), k))
