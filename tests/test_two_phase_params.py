"""two_phase_parameter pass-through: the DSL dict form carries the
NeuralSparseTwoPhaseProcessor knobs (prune_ratio, expansion_rate,
max_window_size — NeuralSparseTwoPhaseProcessor.java:52-107) into
operators/retrieval.py::two_phase_sparse, and `two_phase: true` keeps
the processor defaults."""

from __future__ import annotations

from neural_search_spark.plans.compiler import Engine


def _hits(eng, two_phase):
    out = eng.search(
        {"neural_sparse": {"query_text": "spark join stream", "two_phase": two_phase}},
        size=10,
    )
    return [(r["doc_id"], round(r["score"], 4)) for r in out.collect()]


def test_dict_form_defaults_equal_true_form(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    assert _hits(eng, True) == _hits(
        eng,
        {"prune_ratio": 0.4, "expansion_rate": 5.0, "max_window_size": 10000},
    )


def test_prune_ratio_zero_is_exact(spark, sf_dir):
    # prune_ratio 0 keeps every query token in phase 1, and a window
    # far above the corpus size makes phase 2 rescore everything —
    # the result must equal the exact single-phase scorer
    eng = Engine(spark, sf_dir)
    exact = eng.search(
        {"neural_sparse": {"query_text": "spark join stream"}}, size=10
    )
    ex = [(r["doc_id"], round(r["score"], 4)) for r in exact.collect()]
    tp = _hits(eng, {"prune_ratio": 0.0, "expansion_rate": 1000.0})
    assert tp == ex


def test_tiny_window_caps_candidates(spark, sf_dir):
    # expansion_rate 0.1 -> window = max 1 candidate from phase 1; the
    # result is that single candidate rescored
    eng = Engine(spark, sf_dir)
    out = _hits(eng, {"expansion_rate": 0.1, "max_window_size": 1})
    assert len(out) == 1
