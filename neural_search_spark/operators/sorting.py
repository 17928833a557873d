"""K2: hybrid results sorted by arbitrary fields + search_after paging.

Parity: `search/collector/HybridTopFieldDocSortCollector.java` (sort by
field(s) incl. doc-value fields), `PagingFieldCollector.java`
(search_after). In Spark: join the fused ids with the needed doc-value
columns, `orderBy` the sort spec, and implement search_after as a
lexicographic tuple predicate — which Catalyst pushes down as far as
the data layout allows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _lex_after(sort_cols: list[tuple[str, bool]], after: list) -> Column:
    """Strict lexicographic (row > after) predicate for search_after.

    For each prefix: all previous keys equal AND this key strictly past
    its after-value in sort direction.
    """
    cond = F.lit(False)
    for i in range(len(sort_cols)):
        clause = F.lit(True)
        for j in range(i):
            col_j, _ = sort_cols[j]
            clause = clause & (F.col(col_j) == F.lit(after[j]))
        col_i, asc = sort_cols[i]
        cmp = (F.col(col_i) > F.lit(after[i])) if asc else (F.col(col_i) < F.lit(after[i]))
        cond = cond | (clause & cmp)
    return cond


def sort_by_fields(
    results: DataFrame,
    corpus: DataFrame,
    sort_cols: list[tuple[str, bool]],
    k: int = 10,
    search_after: list | None = None,
    id_col: str = "doc_id",
    missing: dict[str, str] | None = None,
) -> DataFrame:
    """Sort fused results by document fields (asc flag per column),
    optionally resuming after a previous page's last sort key.
    `missing` maps column → "_first" | "_last" (the OpenSearch
    missing-value placement knob); unspecified columns keep Spark's
    default null placement."""
    need = [c for c, _ in sort_cols if c != id_col and c not in results.columns]
    joined = results.join(corpus.select(id_col, *need), id_col) if need else results
    if search_after is not None:
        joined = joined.where(_lex_after(sort_cols, search_after))
    order = []
    for c, asc in sort_cols:
        m = (missing or {}).get(c)
        col = F.col(c)
        if m == "_first":
            order.append(col.asc_nulls_first() if asc else col.desc_nulls_first())
        elif m == "_last":
            order.append(col.asc_nulls_last() if asc else col.desc_nulls_last())
        else:
            order.append(col.asc() if asc else col.desc())
    return joined.orderBy(*order).limit(k)


def sort_by_script(
    results: DataFrame,
    corpus: DataFrame,
    script: str,
    ascending: bool = True,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Script-based sort (the Painless sort-script analogue): a
    Spark-SQL expression over document columns, evaluated as a plain
    projection on the page being sorted — Catalyst folds it into the
    scan, so the script costs one narrow map over the PAGE, never a
    corpus pass. Ties break on `id_col` for determinism."""
    joined = results.join(corpus, id_col)
    key = F.expr(script)
    return (
        joined.withColumn("_sort_key", key)
        .orderBy(
            F.col("_sort_key").asc() if ascending else F.col("_sort_key").desc(),
            id_col,
        )
        .limit(k)
    )
