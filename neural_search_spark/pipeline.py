"""Composable dataset-curation pipeline.

The reference models ingest as an ORDERED LIST of processors applied to
every document (`plugin/NeuralSearch.java:309-340`); this module applies
the same architecture to training-data curation: each stage is a
DataFrame→DataFrame closure, the pipeline composes them into ONE lazy
plan (no materialization between stages), and every stage reuses an
already-oracle-tested primitive from functions/ and operators/.

Plan-shape guarantees (the reason this composes safely at 100 TB):
- quality / lang / length / normalize / split / sample are pure
  scan-side projections+filters — they FUSE into one codegen stage and
  push partition-prunable predicates to the source;
- dedup adds exactly one shuffle (groupBy content key);
- repetition adds one explode+agg subplan joined back on doc_id;
- decontaminate adds one shingle equi-join against the held-out side.

Example::

    pipe = (CurationPipeline()
            .quality(0.5)
            .lang(["en"])
            .length(min_tokens=10)
            .repetition(max_ratio=0.2)
            .dedup("exact")
            .decontaminate(test_docs)
            .split(keep_below_hex="cd", salt="")
            .sample(rates_hex={"src0": "33"}, default_hex="cd", salt="mix1:"))
    curated = pipe.apply(docs)          # one lazy DataFrame plan
    report  = pipe.survival_report(docs)  # eager per-stage row counts
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions import text as T
from .functions.sparse import tokens

Stage = tuple[str, Callable[[DataFrame], DataFrame]]


class CurationPipeline:
    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col
        self._stages: list[Stage] = []

    # -- stage definitions (each returns self for chaining) ----------------
    def quality(self, min_score: float, out_col: str = "quality") -> "CurationPipeline":
        """Quality gate (length/stopword/punctuation heuristics,
        `functions/text.py::quality_score`); keeps the score column."""

        def _s(df: DataFrame) -> DataFrame:
            return df.withColumn(
                out_col, F.round(T.quality_score(F.col(self.text_col)), 4)
            ).where(F.col(out_col) >= min_score)

        self._stages.append(("quality", _s))
        return self

    def lang(self, langs: list[str], lang_col: str = "lang") -> "CurationPipeline":
        def _s(df: DataFrame) -> DataFrame:
            return df.where(F.col(lang_col).isin(list(langs)))

        self._stages.append(("lang", _s))
        return self

    def length(
        self, min_tokens: int = 0, max_tokens: int | None = None
    ) -> "CurationPipeline":
        def _s(df: DataFrame) -> DataFrame:
            n = F.size(tokens(F.col(self.text_col)))
            cond = n >= min_tokens
            if max_tokens is not None:
                cond = cond & (n <= max_tokens)
            return df.where(cond)

        self._stages.append(("length", _s))
        return self

    def normalize(self, out_col: str | None = None) -> "CurationPipeline":
        """Lowercase → strip non-alphanumerics → collapse whitespace
        (in place on text_col unless out_col given)."""

        def _s(df: DataFrame) -> DataFrame:
            cleaned = F.trim(
                F.regexp_replace(
                    F.regexp_replace(F.lower(F.col(self.text_col)), "[^a-z0-9 ]", " "),
                    " +",
                    " ",
                )
            )
            return df.withColumn(out_col or self.text_col, cleaned)

        self._stages.append(("normalize", _s))
        return self

    def repetition(self, max_ratio: float, n: int = 3) -> "CurationPipeline":
        """Drop docs whose most-repeated n-gram occupies more than
        `max_ratio` of their n-gram windows (C4/Gopher boilerplate
        rule). Docs with < n tokens have no windows and pass."""

        def _s(df: DataFrame) -> DataFrame:
            grams = df.select(
                F.col(self.id_col),
                F.explode(T.word_shingles(F.col(self.text_col), n)).alias("_g"),
            )
            ratio = (
                grams.groupBy(self.id_col, "_g")
                .agg(F.count("*").alias("_c"))
                .groupBy(self.id_col)
                .agg(
                    (F.max("_c").cast("double") / F.sum("_c").cast("double")).alias(
                        "_rep"
                    )
                )
            )
            flagged = ratio.where(F.col("_rep") > max_ratio).select(self.id_col)
            return df.join(flagged, self.id_col, "left_anti")

        self._stages.append(("repetition", _s))
        return self

    def dedup(self, method: str = "exact") -> "CurationPipeline":
        """`exact`: one survivor (min id) per md5(text). `simhash`: one
        survivor per 64-bit SimHash fingerprint (near-dup collapse of
        boilerplate variants). Both are a single window over a content
        key — one shuffle."""
        from pyspark.sql import Window

        def _s(df: DataFrame) -> DataFrame:
            if method == "exact":
                w = Window.partitionBy(F.md5(F.col(self.text_col)))
                return (
                    df.withColumn("_keep", F.min(self.id_col).over(w))
                    .where(F.col(self.id_col) == F.col("_keep"))
                    .drop("_keep")
                )
            if method == "simhash":
                from .operators.dedup import simhash64

                fps = simhash64(df, self.id_col, self.text_col)
                w = Window.partitionBy("simhash")
                return (
                    df.join(fps, self.id_col)
                    .withColumn("_keep", F.min(self.id_col).over(w))
                    .where(F.col(self.id_col) == F.col("_keep"))
                    .drop("_keep", "simhash")
                )
            raise ValueError(f"unsupported dedup method: {method}")

        self._stages.append((f"dedup:{method}", _s))
        return self

    def decontaminate(
        self, test_docs: DataFrame, n: int = 3, min_shared: int = 1
    ) -> "CurationPipeline":
        """Remove docs sharing ≥ min_shared distinct n-gram shingles
        with the held-out frame (same id/text columns)."""

        def _s(df: DataFrame) -> DataFrame:
            def sh(frame: DataFrame) -> DataFrame:
                return frame.select(
                    F.col(self.id_col),
                    F.explode(
                        F.array_distinct(T.word_shingles(F.col(self.text_col), n))
                    ).alias("_sh"),
                )

            test_sh = sh(test_docs).select("_sh").distinct()
            contaminated = (
                sh(df)
                .join(test_sh, "_sh")
                .groupBy(self.id_col)
                .agg(F.count("*").alias("_shared"))
                .where(F.col("_shared") >= min_shared)
                .select(self.id_col)
            )
            return df.join(contaminated, self.id_col, "left_anti")

        self._stages.append(("decontaminate", _s))
        return self

    def split(self, keep_below_hex: str, salt: str = "") -> "CurationPipeline":
        """Deterministic split membership: keep rows whose
        md5(salt||id) 2-hex-digit bucket is < keep_below_hex
        ('cd' ≈ 80%). Reproducible across engines and runs."""

        def _s(df: DataFrame) -> DataFrame:
            bucket = F.substring(
                F.md5(F.concat(F.lit(salt), F.col(self.id_col).cast("string"))), 1, 2
            )
            return df.where(bucket < F.lit(keep_below_hex))

        self._stages.append(("split", _s))
        return self

    def sample(
        self,
        rates_hex: dict[str, str] | None = None,
        default_hex: str = "ff",
        salt: str = "",
        by: str = "source",
    ) -> "CurationPipeline":
        """Per-group hash sampling (pure filter, no shuffle): group
        values in rates_hex get their own 2-hex-digit threshold."""

        def _s(df: DataFrame) -> DataFrame:
            h = F.substring(
                F.md5(F.concat(F.lit(salt), F.col(self.id_col).cast("string"))), 1, 2
            )
            thr = F.lit(default_hex)
            for group, hexthr in (rates_hex or {}).items():
                thr = F.when(F.col(by) == group, F.lit(hexthr)).otherwise(thr)
            return df.where(h < thr)

        self._stages.append(("sample", _s))
        return self

    def model_filter(
        self, weights: list[float], min_p: float = 0.5
    ) -> "CurationPipeline":
        """Classifier-gated filtering: keep docs whose logistic-
        regression probability (operators/classify.py feature recipe +
        trained weights) is ≥ min_p — the fastText-style quality-
        classifier stage of production curation stacks, here driven by
        the engine's own distributed-GD model. Pure narrow filter:
        the σ expression rides the scan, nothing shuffles."""

        def _s(df: DataFrame) -> DataFrame:
            from .functions.sparse import tokens as _toks
            from .operators.classify import SIGMOID_DP

            z = (
                F.lit(float(weights[0]))
                + F.lit(float(weights[1]))
                * (F.col("n_chars").cast("double") / F.lit(1000.0))
                + F.lit(float(weights[2]))
                * (F.size(_toks(F.col(self.text_col))).cast("double") / F.lit(100.0))
            )
            p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), SIGMOID_DP)
            return df.where(p >= F.lit(float(min_p)))

        self._stages.append(("model_filter", _s))
        return self

    # -- execution ---------------------------------------------------------
    def apply(self, docs: DataFrame) -> DataFrame:
        out = docs
        for _name, fn in self._stages:
            out = fn(out)
        return out

    def survival_report(self, docs: DataFrame) -> list[tuple[str, int]]:
        """Eager diagnostic: rows surviving after each stage, in ONE
        Spark action — every stage prefix is projected to a literal
        stage tag, unioned, and counted with a single groupBy, so the
        whole N-stage report is one job (safe to call casually; the
        prefixes still each execute once inside that job)."""
        tagged = docs.select(F.lit("s000:input").alias("_stage"))
        out = docs
        labels = ["s000:input"]
        for i, (name, fn) in enumerate(self._stages, 1):
            out = fn(out)
            label = f"s{i:03d}:{name}"
            labels.append(label)
            tagged = tagged.unionByName(out.select(F.lit(label).alias("_stage")))
        counts = {
            r["_stage"]: r["n"]
            for r in tagged.groupBy("_stage").agg(F.count("*").alias("n")).collect()
        }
        return [(lb.split(":", 1)[1], int(counts.get(lb, 0))) for lb in labels]


def streaming_curate(
    stream: DataFrame,
    pipe: CurationPipeline,
    sink: Callable[[DataFrame, int], None],
    checkpoint: str,
    cross_batch_dedup: bool = True,
):
    """Run a CurationPipeline continuously: exact dedup is hoisted OUT
    of the per-batch stages into Spark's stateful `dropDuplicates` on
    the content hash, so duplicates are dropped ACROSS micro-batches
    (state = seen hashes, exactly the streaming face of the dedup
    stage); every other stage is batch/stream-agnostic and runs inside
    foreachBatch on the surviving rows. Returns the StreamingQuery.
    """
    s = stream
    if cross_batch_dedup:
        s = s.withColumn("_content_hash", F.md5(F.col(pipe.text_col))).dropDuplicates(
            ["_content_hash"]
        )
    # per-batch stages: everything EXCEPT dedup (handled by state above)
    batch_pipe = CurationPipeline(pipe.id_col, pipe.text_col)
    batch_pipe._stages = [
        (n, fn) for n, fn in pipe._stages if not n.startswith("dedup")
    ]

    def _process(batch: DataFrame, batch_id: int) -> None:
        out = batch_pipe.apply(batch.drop("_content_hash"))
        sink(out, batch_id)

    return (
        s.writeStream.foreachBatch(_process)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .start()
    )
