"""Differential test: the DataFrame fusion pipeline vs an independent
pure-Python reimplementation of the reference formulas, over
hypothesis-generated score lists."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from neural_search_spark.operators import fusion as FU

scores_list = st.lists(
    st.floats(min_value=-5.0, max_value=100.0, allow_nan=False, width=32),
    min_size=1,
    max_size=8,
)


def _py_minmax(scores: list[float]) -> list[float]:
    mn, mx = min(scores), max(scores)
    out = []
    for s in scores:
        if mx == mn:
            out.append(1.0)
        else:
            n = (s - mn) / (mx - mn)
            out.append(0.001 if n == 0.0 else n)
    return out


def _py_arith(per_doc: dict[int, dict[int, float]], weights: list[float]) -> dict[int, float]:
    out = {}
    for doc, subs in per_doc.items():
        num = sum(weights[i] * s for i, s in subs.items() if s >= 0.0)
        den = sum(weights[i] for i, s in subs.items() if s >= 0.0)
        out[doc] = 0.0 if den == 0.0 else num / den
    return out


@pytest.mark.usefixtures("spark")
@given(s0=scores_list, s1=scores_list)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_minmax_arith_fusion_matches_reference_math(spark, s0, s1):
    subs = [
        spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(lst)], "doc_id long, score double"
        )
        for lst in (s0, s1)
    ]
    got = {
        r["doc_id"]: r["score"]
        for r in FU.combine(
            FU.normalize(FU.union_subqueries(subs), "min_max"),
            "arithmetic_mean",
            [0.7, 0.3],
        ).collect()
    }
    n0, n1 = _py_minmax(s0), _py_minmax(s1)
    per_doc: dict[int, dict[int, float]] = {}
    for i, v in enumerate(n0):
        per_doc.setdefault(i, {})[0] = v
    for i, v in enumerate(n1):
        per_doc.setdefault(i, {})[1] = v
    want = _py_arith(per_doc, [0.7, 0.3])
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-9, abs=1e-12), (
            d, s0, s1, got[d], want[d],
        )
