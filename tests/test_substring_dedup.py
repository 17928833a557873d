"""exact_substring_dedup (Lee et al. suffix-array dedup as join
algebra): planted-duplicate golden tests — first occurrence keeps its
tokens, later occurrences lose exactly the covered spans."""

from __future__ import annotations

import pytest

from neural_search_spark.operators.dedup import exact_substring_dedup


@pytest.fixture(scope="module")
def corpus(spark):
    dup = "alpha beta gamma delta epsilon"  # the planted 5-token span
    rows = [
        (0, f"intro words {dup} tail zero"),
        (1, f"other opening {dup} closing one"),
        (2, "completely unique sentence with no repeats at all"),
        (3, f"{dup}"),  # the span IS the doc
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_first_occurrence_survives(spark, corpus):
    out = {r["doc_id"]: r for r in exact_substring_dedup(corpus, 5).collect()}
    # doc 0 holds the global first occurrence — nothing removed
    assert out[0]["n_removed"] == 0
    assert out[0]["kept_text"] == corpus.where("doc_id = 0").first()["text"]


def test_later_occurrences_lose_the_span(spark, corpus):
    out = {r["doc_id"]: r for r in exact_substring_dedup(corpus, 5).collect()}
    assert out[1]["n_removed"] == 5
    assert out[1]["kept_text"] == "other opening closing one"
    assert out[3]["n_removed"] == 5
    assert out[3]["kept_text"] == ""


def test_unique_doc_untouched(spark, corpus):
    out = {r["doc_id"]: r for r in exact_substring_dedup(corpus, 5).collect()}
    assert out[2]["n_removed"] == 0
    assert out[2]["kept_text"].startswith("completely unique")


def test_overlapping_windows_merge(spark):
    # a 7-token duplicated run = three overlapping 5-windows; covered
    # tokens must merge to the full run, not triple-count
    run = "one two three four five six seven"
    rows = [(0, f"{run} x"), (1, f"y {run}")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in exact_substring_dedup(df, 5).collect()}
    assert out[0]["n_removed"] == 0
    assert out[1]["n_removed"] == 7  # merged coverage, not 15
    assert out[1]["kept_text"] == "y"


def test_packed_key_preconditions_guarded(spark):
    """The doc_id*1e6+pos occurrence key is load-bearing — violating
    its preconditions must fail loudly, never mis-trim."""
    import pytest

    from neural_search_spark.operators.dedup import exact_substring_dedup

    neg = spark.createDataFrame(
        [(-1, "a b c d e f g"), (2, "a b c d e f g")],
        "doc_id long, text string",
    )
    with pytest.raises(Exception, match="negative id"):
        exact_substring_dedup(neg).collect()
