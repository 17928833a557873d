"""_bulk lifecycle merge (sources/bulk.py): op semantics, last-wins
precedence, malformed-op rejection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neural_search_spark.sources.bulk import bulk_apply


def _snap(spark):
    return spark.createDataFrame(
        [(i, f"text {i}", "en") for i in range(6)],
        "doc_id long, text string, lang string",
    )


def _ops(spark, rows):
    return spark.createDataFrame(
        rows, "op string, seq long, doc_id long, text string, lang string"
    )


def test_bulk_semantics(spark):
    out = bulk_apply(
        _snap(spark),
        _ops(spark, [
            ("delete", 1, 0, None, None),
            ("index", 2, 1, "replaced", "de"),
            ("create", 3, 2, "no-op existing", "fr"),   # id exists → no-op
            ("create", 4, 99, "fresh", "fr"),
            ("update", 5, 3, None, "zh"),               # partial: text kept
        ]),
    )
    rows = {r["doc_id"]: (r["text"], r["lang"]) for r in out.collect()}
    assert 0 not in rows
    assert rows[1] == ("replaced", "de")
    assert rows[2] == ("text 2", "en")
    assert rows[99] == ("fresh", "fr")
    assert rows[3] == ("text 3", "zh")
    assert rows[4] == ("text 4", "en") and rows[5] == ("text 5", "en")


def test_bulk_last_wins(spark):
    out = bulk_apply(
        _snap(spark),
        _ops(spark, [
            ("delete", 1, 2, None, None),
            ("index", 2, 2, "revived", "de"),   # later seq wins over delete
            ("index", 1, 3, "early", "de"),
            ("delete", 2, 3, None, None),       # later delete wins
        ]),
    )
    rows = {r["doc_id"]: r["text"] for r in out.collect()}
    assert rows[2] == "revived"
    assert 3 not in rows


def test_bulk_rejects_unknown_op(spark):
    with pytest.raises(ValueError, match="unknown bulk op"):
        bulk_apply(_snap(spark), _ops(spark, [("upsert", 1, 0, "x", "en")]))


def test_delete_update_reindex_by_query(spark):
    from neural_search_spark.sources.bulk import (
        delete_by_query, reindex, update_by_query,
    )

    snap = _snap(spark)
    assert delete_by_query(snap, "doc_id % 2 = 0").count() == 3
    upd = {r["doc_id"]: r["lang"] for r in update_by_query(
        snap, "doc_id >= 4", {"lang": "'zh'"}).collect()}
    assert upd[4] == "zh" and upd[5] == "zh" and upd[0] == "en"
    re = reindex(snap, "doc_id < 2", {"text": "upper(text)"}).collect()
    assert {r["text"] for r in re} == {"TEXT 0", "TEXT 1"}
