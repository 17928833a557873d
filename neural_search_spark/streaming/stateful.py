"""Custom stateful streaming operator: running top-k per key.

The reference has no streaming surface (§2.12); this is the
parity-plus piece: a continuously-maintained per-key top-k leaderboard
(e.g. best-scoring documents per query/category as new data streams
in), implemented with `applyInPandasWithState` — Spark's escape hatch
for operators its built-in streaming aggregations can't express.

State per key = the current top-k (ids + scores) as parallel lists;
each micro-batch merges its rows into the state and emits the updated
leaderboard. State size is O(k) per key — bounded regardless of stream
length.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string, doc_id long, score double, rank int"
STATE_SCHEMA = "ids array<long>, scores array<double>"


def _merge_topk(
    ids: list[int], scores: list[float], new_ids: list[int], new_scores: list[float], k: int
) -> tuple[list[int], list[float]]:
    pool: dict[int, float] = {}
    for i, s in zip(ids, scores):
        pool[int(i)] = max(pool.get(int(i), float("-inf")), float(s))
    for i, s in zip(new_ids, new_scores):
        pool[int(i)] = max(pool.get(int(i), float("-inf")), float(s))
    best = sorted(pool.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [i for i, _ in best], [s for _, s in best]


def make_topk_state_fn(k: int):
    def topk_fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ids, scores = state.get
            ids, scores = list(ids), list(scores)
        else:
            ids, scores = [], []
        for pdf in pdfs:
            ids, scores = _merge_topk(
                ids, scores, pdf["doc_id"].tolist(), pdf["score"].tolist(), k
            )
        state.update((ids, scores))
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(ids),
                "doc_id": ids,
                "score": scores,
                "rank": list(range(1, len(ids) + 1)),
            }
        )

    return topk_fn


def streaming_topk(
    stream: DataFrame,
    k: int = 5,
    key_col: str = "key",
) -> DataFrame:
    """(key, doc_id, score) stream → continuously updated per-key
    top-k with ranks. Works identically on a batch frame (one "batch")
    for testing the merge logic."""
    return stream.groupBy(key_col).applyInPandasWithState(
        make_topk_state_fn(k),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
