"""Property test: the vectorized-numpy repetition kernel
(registry._gopher_rep_batches — np.unique factorization + lexsort
run-length counting + reduceat folds) must agree exactly with a naive
per-document Counter reference on random corpora. The planted-doc
tests pin a handful of shapes; this pins the kernel's vectorized
bookkeeping (doc-boundary masks, run boundaries, reduceat segment
indices) across arbitrary ones."""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from neural_search_spark.registry import (
    GOPHER_DUP_FRAC_MAX,
    GOPHER_TOP_FRAC_MAX,
    _gopher_rep_batches,
)

word = st.sampled_from(["a", "bb", "ccc", "zz", "q", "longword"])
doc = st.lists(word, min_size=0, max_size=25).map(" ".join)
corpus = st.lists(doc, min_size=1, max_size=8)


def _naive(text: str) -> dict[str, int]:
    toks = [t for t in re.split(r"\s+", text.lower(), flags=re.ASCII) if t]
    out: dict[str, int] = {}
    for n in range(2, 11):
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        c = Counter(grams)
        key = f"t{n}" if n in GOPHER_TOP_FRAC_MAX else f"d{n}"
        if n in GOPHER_TOP_FRAC_MAX:
            out[key] = max((cnt * len(g) for g, cnt in c.items()), default=0)
        else:
            out[key] = sum(cnt * len(g) for g, cnt in c.items() if cnt >= 2)
    return out


@given(texts=corpus)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_kernel_matches_naive_counter(texts):
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "tc": [len(t) for t in texts],
            "text": texts,
        }
    )
    (got,) = list(_gopher_rep_batches(iter([pdf])))
    for i, t in enumerate(texts):
        want = _naive(t)
        for k, v in want.items():
            assert int(got[k][i]) == v, (i, k, t)


def test_kernel_empty_batch():
    pdf = pd.DataFrame({"doc_id": [], "tc": [], "text": []})
    (got,) = list(_gopher_rep_batches(iter([pdf])))
    assert len(got) == 0
