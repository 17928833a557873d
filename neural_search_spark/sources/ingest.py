"""Ingest planner: mapping + pipeline config → one DataFrame transform.

The reference's ingest pipeline is an ordered processor chain applied
per document (`plugin/NeuralSearch.java:309-340`; chunk
`processor/TextChunkingProcessor.java`, embed
`processor/InferenceProcessor.java:140-246`, semantic-field system
processor `processor/semantic/SemanticFieldProcessor.java:81-373`).
Here the whole chain compiles to a single `select/withColumn` plan —
chunk (pure expressions) → embed (pandas UDF over exploded chunks) →
prune — that Catalyst fuses into one pass over the batch; the model UDF
sees Arrow batches, which subsumes the reference's hand-built batching
and length-sorting (`InferenceProcessor.java:190-264`).

Semantic-field config (SemanticFieldMapper.java:118-222) maps to the
`SemanticFieldConfig` dataclass; the "mapping transformer"
(`mappingtransformer/SemanticMappingTransformer.java`) is
`semantic_info_schema()` — config → materialized column StructType.

skip_existing reuse (P6, `processor/optimization/InferenceFilter.java`,
`TextEmbeddingInferenceFilter.java`): a left join against the previous
snapshot on doc id; rows whose text is unchanged copy the stored
embedding and never reach the model UDF — at 100 TB this is the
difference between embedding the delta and embedding the corpus.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, MapType, StringType, StructField, StructType

from .. import models
from ..functions import chunking as CH
from ..functions import prune as PR


@dataclass
class SemanticFieldConfig:
    """Per-field semantic config (mirrors SemanticFieldMapper params)."""

    raw_field: str
    mode: str = "dense"  # dense | sparse
    chunking: str | None = None  # None | fixed_token | fixed_char | delimiter
    chunk_param: float | int | str = 384
    overlap_rate: float = 0.0
    max_chunks: int = CH.DEFAULT_MAX_CHUNK_LIMIT
    prune: str | None = None  # None | top_k | alpha_mass | max_ratio | abs_value
    prune_param: float = 0.0
    skip_existing: bool = False
    content_type: str = "PASSAGE"
    # SemanticFieldMapper's model_id param
    # (`mapper/SemanticFieldMapper.java:118-222`): a registry model id
    # (models.MODEL_REGISTRY — real checkpoint loaders included); None
    # keeps the deterministic stub encoder
    model_id: str | None = None

    @property
    def info_col(self) -> str:
        # reference materializes `<field>_semantic_info`
        return f"{self.raw_field}_semantic_info"


def semantic_info_schema(cfg: SemanticFieldConfig) -> StructType:
    """S3 mapping transformer: config → materialized column schema."""
    emb_type = (
        ArrayType(FloatType()) if cfg.mode == "dense" else MapType(StringType(), FloatType())
    )
    return StructType(
        [
            StructField(
                "chunks",
                ArrayType(
                    StructType(
                        [
                            StructField("text", StringType()),
                            StructField("embedding", emb_type),
                        ]
                    )
                ),
            )
        ]
    )


def _chunks_expr(cfg: SemanticFieldConfig, col: Column) -> Column:
    if cfg.chunking is None:
        return F.array(col)
    if cfg.chunking == "fixed_token":
        chunks = CH.chunk_fixed_token(col, int(cfg.chunk_param), cfg.overlap_rate)
    elif cfg.chunking == "fixed_char":
        chunks = CH.chunk_fixed_char(col, int(cfg.chunk_param), cfg.overlap_rate)
    elif cfg.chunking == "delimiter":
        chunks = CH.chunk_delimiter(col, str(cfg.chunk_param))
    else:
        raise ValueError(f"unknown chunker: {cfg.chunking}")
    return CH.enforce_max_chunk_limit(chunks, cfg.max_chunks)


def _prune_expr(cfg: SemanticFieldConfig, m: Column) -> Column:
    if cfg.prune is None:
        return m
    if cfg.prune == "top_k":
        return PR.prune_top_k(m, int(cfg.prune_param))
    if cfg.prune == "alpha_mass":
        return PR.prune_alpha_mass(m, cfg.prune_param)
    if cfg.prune == "max_ratio":
        return PR.prune_max_ratio(m, cfg.prune_param)
    if cfg.prune == "abs_value":
        return PR.prune_abs_value(m, cfg.prune_param)
    raise ValueError(f"unknown prune: {cfg.prune}")


def ingest_transform(
    docs: DataFrame,
    cfg: SemanticFieldConfig,
    id_col: str = "doc_id",
    previous: DataFrame | None = None,
    event_stats=None,
) -> DataFrame:
    """Compile the chunk → embed → prune chain for one semantic field.

    Returns the input plus `<field>_semantic_info.chunks` =
    array<struct<text, embedding>>. With `previous` (and
    cfg.skip_existing), unchanged docs reuse their stored info and only
    changed/new docs run inference.

    `event_stats` (stats.EventStats) records the typed per-execution
    counters the reference's processors emit
    (`stats/events/EventStatName.java`): semantic-field + chunking +
    embedding/sparse-encoding executions, and skip_existing reuse.
    """
    if event_stats is not None:
        event_stats.incr("semantic_field_processor_executions")
        if cfg.chunking is not None:
            event_stats.incr("text_chunking_processor_executions")
            event_stats.incr("semantic_field_processor_chunking_executions")
            _chunk_evt = {
                "fixed_token": "text_chunking_fixed_token_length_executions",
                "delimiter": "text_chunking_delimiter_executions",
                "fixed_char": "text_chunking_fixed_char_length_executions",
            }.get(cfg.chunking)
            if _chunk_evt:
                event_stats.incr(_chunk_evt)
        if cfg.mode == "dense":
            event_stats.incr("text_embedding_processor_executions")
        else:
            event_stats.incr("sparse_encoding_processor_executions")
        if cfg.skip_existing and previous is not None:
            event_stats.incr("skip_existing_executions")
    if cfg.skip_existing and previous is not None:
        prev = previous.select(
            F.col(id_col).alias("_prev_id"),
            F.col(cfg.raw_field).alias("_prev_raw"),
            F.col(cfg.info_col).alias("_prev_info"),
        )
        joined = docs.join(prev, docs[id_col] == prev["_prev_id"], "left")
        unchanged = joined.where(
            F.col("_prev_raw").isNotNull() & (F.col(cfg.raw_field) == F.col("_prev_raw"))
        ).select(*docs.columns, F.col("_prev_info").alias(cfg.info_col))
        changed = joined.where(
            F.col("_prev_raw").isNull() | (F.col(cfg.raw_field) != F.col("_prev_raw"))
        ).select(*docs.columns)
        return unchanged.unionByName(ingest_transform(changed, _no_skip(cfg), id_col))

    # Shuffle-free ingest: the chunk ARRAY goes to the encoder UDF in
    # one Arrow batch (array<string> → array of embeddings), chunk
    # order stays positional, and the info struct is a zip_with over
    # two sibling columns — a pure per-partition map. The previous
    # shape (posexplode → per-chunk UDF → groupBy collect_list → join
    # back) put two shuffles of embedding payloads on the ingest path;
    # at corpus scale ingest must be a narrow pipeline from source
    # scan to sink.
    chunked = docs.withColumn("_chunks", _chunks_expr(cfg, F.col(cfg.raw_field)))
    if cfg.mode == "dense":
        if cfg.model_id is not None:
            # registry model (real checkpoint or swap-in): iterator
            # pandas UDF, weights load once per worker
            udf = models.dense_embed_model_chunks_udf(cfg.model_id, cfg.content_type)
        else:
            udf = models.dense_embed_chunks_udf(cfg.content_type)
        embedded = chunked.withColumn("_embs", udf(F.col("_chunks")))
    else:
        # the encoded maps MUST be projected to an attribute before the
        # prune expression touches them: prune modes built on
        # map_filter (max_ratio / abs_value / alpha_mass) put the
        # input inside a higher-order-function lambda, and Catalyst
        # rejects a Python UDF referenced from a lambda body at
        # analysis (UNSUPPORTED_FEATURE.LAMBDA_FUNCTION_WITH_PYTHON_UDF)
        embedded = (
            chunked.withColumn(
                "_embs_raw", models.sparse_encode_chunks_udf()(F.col("_chunks"))
            )
            .withColumn(
                "_embs",
                F.transform(
                    F.col("_embs_raw"),
                    lambda m: _prune_expr(cfg, m.cast("map<string,double>")).cast(
                        "map<string,float>"
                    ),
                ),
            )
            .drop("_embs_raw")
        )
    return embedded.withColumn(
        cfg.info_col,
        F.struct(
            F.zip_with(
                F.col("_chunks"),
                F.col("_embs"),
                lambda t, e: F.struct(t.alias("text"), e.alias("embedding")),
            ).alias("chunks")
        ),
    ).drop("_chunks", "_embs")


def ingest_pipeline(
    docs: DataFrame,
    configs: list[SemanticFieldConfig],
    id_col: str = "doc_id",
    previous: DataFrame | None = None,
) -> DataFrame:
    """Full ingest pipeline: apply every semantic-field transform in
    order (the reference's ordered processor chain,
    `plugin/NeuralSearch.java:309-340`)."""
    out = docs
    for cfg in configs:
        out = ingest_transform(out, cfg, id_col=id_col, previous=previous)
    return out


def _no_skip(cfg: SemanticFieldConfig) -> SemanticFieldConfig:
    from dataclasses import replace

    return replace(cfg, skip_existing=False)
