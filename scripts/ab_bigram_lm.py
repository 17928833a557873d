"""Interleaved A/B: text_bigram_nll LM-from-artifact (r11) vs the prior
in-plan LM rollup (localCheckpoint doc_bg + corpus vocab scan).

Both variants run in ONE process, alternating reps (the round's
measurement discipline — box drift hits both arms equally). The OLD arm
is reconstructed inline below, byte-for-byte the pre-r11 body.

Usage: python scripts/ab_bigram_lm.py [--reps N]   (default 6)
SF dir from $SPARK_GRAFT_SF_DIR (default sf0.1).
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from neural_search_spark import catalog, registry  # noqa: E402
from neural_search_spark.functions import sparse as S  # noqa: E402
from neural_search_spark.session import get_spark  # noqa: E402


def old_text_bigram_nll(spark, sf_dir):
    d = catalog.table(spark, sf_dir, "documents")
    toks = S.tokens(F.col("text"))
    n = F.size(toks)
    bg = (
        d.where(n >= 2)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice(toks, 1, n - 1).alias("w1"),
                    F.slice(toks, 2, n - 1).alias("w2"),
                )
            ).alias("bg"),
        )
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    doc_bg = (
        bg.groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint()
    )
    c_xy = doc_bg.groupBy("w1", "w2").agg(F.sum("tf").alias("c_xy"))
    c_x = c_xy.groupBy("w1").agg(F.sum("c_xy").alias("c_x"))
    vocab = d.select(F.explode(toks).alias("tok")).agg(
        F.countDistinct("tok").cast("double").alias("v")
    )
    k = F.lit(registry.BIGRAM_NLL_K)
    p = (F.col("c_xy").cast("double") + k) / (
        F.col("c_x").cast("double") + k * F.col("v")
    )
    return (
        doc_bg.join(c_xy, ["w1", "w2"])
        .join(F.broadcast(c_x), "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(F.col("tf") * -F.log(p)) / F.sum("tf"), 4).alias(
                "bigram_nll"
            )
        )
        .orderBy("doc_id")
    )


def main() -> None:
    reps = 6
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-bigram-lm")
    spark.sparkContext.setLogLevel("ERROR")
    new_fn = registry.SPARK_QUERIES["text_bigram_nll"]
    # warm both arms (artifacts built once, JIT warm)
    a = old_text_bigram_nll(spark, sf).collect()
    b = new_fn(spark, sf).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b], "value mismatch"
    ts = {"old": [], "new": []}
    for i in range(reps):
        for tag, fn in (("old", old_text_bigram_nll), ("new", new_fn)):
            spark.sparkContext.setJobDescription(f"bigram-lm {tag} rep{i}")
            t0 = time.perf_counter()
            fn(spark, sf).collect()
            ts[tag].append(time.perf_counter() - t0)
    for tag in ("old", "new"):
        print(
            f"RESULT {tag} min={min(ts[tag]):.3f}"
            f" med={statistics.median(ts[tag]):.3f}"
            f" all={[round(t, 3) for t in ts[tag]]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
