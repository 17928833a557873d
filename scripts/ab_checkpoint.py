"""Interleaved A/B: localCheckpoint ON (shipped code) vs OFF
(checkpoint patched to identity) for the §8 materialize-once decisions
— judge r10 next-round #6 asks for the sf0.1-decided crossovers to be
re-measured at a bigger SF (run with SPARK_GRAFT_SF_DIR=/tmp/sf1x).

Variant B monkeypatches DataFrame.localCheckpoint to return self, so
the SAME query function builds the no-materialization plan. The plan
memo is bypassed (fn.__wrapped__) so every rep constructs fresh.

Usage: SPARK_GRAFT_SF_DIR=/tmp/sf1x python scripts/ab_checkpoint.py \
           text_bigram_nll ccnet_ppl_buckets dedup_simhash_blocked [--reps N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.dataframe as _D  # noqa: E402

from neural_search_spark import registry  # noqa: E402
from neural_search_spark.session import get_spark  # noqa: E402


def main() -> None:
    argv = sys.argv[1:]
    reps = 6
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        del argv[i:i + 2]
    names = argv
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-checkpoint")
    spark.sparkContext.setLogLevel("ERROR")

    orig_ckpt = _D.DataFrame.localCheckpoint

    def no_ckpt(self, eager=True):  # noqa: ANN001
        return self

    for name in names:
        fn = registry.SPARK_QUERIES[name]
        fn = getattr(fn, "__wrapped__", fn)
        # untimed warmups, one per variant (JIT + artifact builds)
        fn(spark, sf).collect()
        _D.DataFrame.localCheckpoint = no_ckpt
        try:
            fn(spark, sf).collect()
        finally:
            _D.DataFrame.localCheckpoint = orig_ckpt
        a, b = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf).collect()
            a.append(time.perf_counter() - t0)
            _D.DataFrame.localCheckpoint = no_ckpt
            try:
                t0 = time.perf_counter()
                fn(spark, sf).collect()
                b.append(time.perf_counter() - t0)
            finally:
                _D.DataFrame.localCheckpoint = orig_ckpt
        fmt = lambda xs: " ".join(f"{x:.2f}" for x in sorted(xs))  # noqa: E731
        print(
            f"{name}: ckpt_ON  min={min(a):.3f} med={sorted(a)[len(a)//2]:.3f} [{fmt(a)}]\n"
            f"{' ' * len(name)}  ckpt_OFF min={min(b):.3f} med={sorted(b)[len(b)//2]:.3f} [{fmt(b)}]",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
