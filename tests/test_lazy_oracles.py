"""materialize_oracles() contract (round-8 ADVICE fixes): a failing
lazy builder is retried on the next call with a warning naming the
oracle — never silently dropped — and successfully built oracles land
in their PRIORITY_50-pinned dict positions, not at the end."""

from __future__ import annotations

import warnings

from neural_search_spark import registry


def test_failed_builder_warns_and_retries():
    calls = {"n": 0}

    def flaky() -> str:
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("testdata momentarily unreadable")
        return "SELECT 1 AS x"

    registry._LAZY_ORACLES["_test_flaky_oracle"] = flaky
    try:
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            registry.materialize_oracles()
        assert any("_test_flaky_oracle" in str(x.message) for x in w)
        # still registered for retry, not silently demoted
        assert "_test_flaky_oracle" in registry._LAZY_ORACLES
        assert "_test_flaky_oracle" not in registry.ORACLES
        registry.materialize_oracles()  # retry succeeds
        assert registry.ORACLES["_test_flaky_oracle"] == "SELECT 1 AS x"
        assert "_test_flaky_oracle" not in registry._LAZY_ORACLES
    finally:
        registry._LAZY_ORACLES.pop("_test_flaky_oracle", None)
        registry.ORACLES.pop("_test_flaky_oracle", None)


def test_materialized_oracles_keep_pinned_order():
    registry.materialize_oracles()
    pinned = [n for n in registry.PRIORITY_50 if n in registry.ORACLES]
    head = [n for n in registry.ORACLES if n in set(pinned)][: len(pinned)]
    assert head == pinned
    # the two lazily-built transformer-int oracles sit at their pins
    keys = list(registry.ORACLES)
    for name in ("transformer_model_dense_topk_int",
                 "transformer_bpe_model_dense_topk_int"):
        if name in registry.ORACLES:
            assert keys.index(name) == pinned.index(name)
