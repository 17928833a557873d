"""Interleaved A/B for the one-exchange simhash64 (r10 batch 3):
variant A = occurrence-level ±1 long sums (one exchange), variant B =
the previous (doc, token) tf pre-aggregation + double sums (two
exchanges), alternated rep by rep in one warmed process. Also EQ-checks
the fingerprints once.

Usage: python scripts/ab_simhash.py [--reps N]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import neural_search_spark.operators.dedup as DD  # noqa: E402
from neural_search_spark import catalog, registry  # noqa: E402
from neural_search_spark.functions.sparse import tokens  # noqa: E402
from neural_search_spark.session import get_spark  # noqa: E402

NEW = DD.simhash64


def old_simhash64(docs, id_col="doc_id", text_col="text"):
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("token")
    )
    tf = toks.groupBy(id_col, "token").agg(F.count("*").cast("double").alias("w"))
    h = F.md5(F.col("token"))
    tf = tf.withColumn(
        "hi", F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    ).withColumn("lo", F.conv(F.substring(h, 9, 8), 16, 10).cast("long"))
    bit_sums = []
    for j in range(64):
        pos = j // 4 + 1
        shift = 3 - j % 4
        src, off = ("hi", 8) if pos <= 8 else ("lo", 16)
        bit = F.shiftright(F.col(src), (off - pos) * 4 + shift).bitwiseAND(F.lit(1))
        contrib = F.col("w") * (bit.cast("double") * 2.0 - 1.0)
        bit_sums.append(F.sum(contrib).alias(f"s{j}"))
    agg = tf.groupBy(id_col).agg(*bit_sums)
    fp = F.concat(
        *[F.when(F.col(f"s{j}") > 0.0, F.lit("1")).otherwise(F.lit("0")) for j in range(64)]
    )
    return agg.select(F.col(id_col), fp.alias("simhash"))


def main() -> None:
    reps = 6
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-simhash")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "262144")
    spark.conf.set("spark.sql.files.openCostInBytes", "65536")
    docs = catalog.table(spark, sf, "documents")

    # EQ gate: fingerprints bit-identical
    a = NEW(docs).withColumnRenamed("simhash", "n")
    b = old_simhash64(docs).withColumnRenamed("simhash", "o")
    diff = a.join(b, "doc_id").where(F.col("n") != F.col("o")).count()
    print(f"EQ fingerprint mismatches: {diff}", flush=True)
    assert diff == 0

    # fingerprint pass alone, then the full blocked query
    for label, fn in (
        ("fp-pass", lambda v: v(docs)),
    ):
        for variant in (NEW, old_simhash64):
            fn(variant).write.format("noop").mode("overwrite").save()  # warm
        ts = {"new": [], "old": []}
        for i in range(reps):
            for tag, variant in (("new", NEW), ("old", old_simhash64)):
                spark.sparkContext.setJobDescription(f"{label} {tag} rep{i}")
                t0 = time.perf_counter()
                fn(variant).write.format("noop").mode("overwrite").save()
                ts[tag].append(time.perf_counter() - t0)
        print(
            f"AB {label} new med={statistics.median(ts['new']):.3f}"
            f" min={min(ts['new']):.3f} | old"
            f" med={statistics.median(ts['old']):.3f} min={min(ts['old']):.3f}",
            flush=True,
        )

    # full queries through the module function (monkeypatch the variant)
    for qname in ("dedup_simhash_blocked", "dedup_simhash_neardup"):
        qfn = registry.SPARK_QUERIES[qname]
        for variant in (NEW, old_simhash64):
            DD.simhash64 = variant
            qfn(spark, sf).collect()
        ts = {"new": [], "old": []}
        for i in range(reps):
            for tag, variant in (("new", NEW), ("old", old_simhash64)):
                DD.simhash64 = variant
                spark.sparkContext.setJobDescription(f"{qname} {tag} rep{i}")
                t0 = time.perf_counter()
                qfn(spark, sf).write.format("noop").mode("overwrite").save()
                ts[tag].append(time.perf_counter() - t0)
        DD.simhash64 = NEW
        print(
            f"AB {qname} new med={statistics.median(ts['new']):.3f}"
            f" min={min(ts['new']):.3f} | old"
            f" med={statistics.median(ts['old']):.3f} min={min(ts['old']):.3f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
