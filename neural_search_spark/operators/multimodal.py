"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / frame-sample as Arrow-batched
pandas functions over `mapInPandas`.

The media libraries (PIL/ffmpeg/torchaudio) are NOT in this container;
the decode step is a clearly-marked deterministic fake
(`_fake_decode_meta`) so the Spark-side plumbing — schema, batch
iteration, partition shape — is real and tested, and a real decoder
drops in by replacing one function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, byte_len long, content_md5 string, width int, height int"
)


def _fake_decode_meta(payload: bytes) -> tuple[int, int]:
    """STUB decoder: derives a deterministic (width, height) from the
    content hash. Replace with PIL.Image.open(...).size for real use.
    """
    h = hashlib.md5(payload).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


def real_decode_meta(payload: bytes) -> tuple[int, int]:  # pragma: no cover
    raise NotImplementedError(
        "image decoding requires PIL/ffmpeg, not available in this container"
    )


def decode_media_batch(
    media: DataFrame, id_col: str = "doc_id", bin_col: str = "payload"
) -> DataFrame:
    """mapInPandas over Arrow batches: binary → (byte_len, md5, w, h).

    Partition-parallel, constant memory per batch — the shape a real
    100 TB media decode job needs (each task decodes its partition's
    blobs; no driver involvement, no collect)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[bin_col]
            dims = [_fake_decode_meta(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "byte_len": payloads.map(len),
                    "content_md5": payloads.map(lambda p: hashlib.md5(bytes(p)).hexdigest()),
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return media.mapInPandas(decode, MEDIA_SCHEMA)


def media_table_from_text(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a synthetic media table: utf-8 bytes of the text as the
    opaque payload (the test container has no real media files)."""
    return docs.select(F.col(id_col), F.encode(F.col(text_col), "utf-8").alias("payload"))


def frame_sample(
    media: DataFrame,
    n_frames: int = 4,
    id_col: str = "doc_id",
    bin_col: str = "payload",
) -> DataFrame:
    """Frame-sampling plumbing: emit n 'frames' per payload (byte-range
    slices as stand-ins for decoded video frames), exploded one row per
    frame — the partition/row shape of a real frame extractor."""
    idx = F.sequence(F.lit(0), F.lit(n_frames - 1))
    return media.select(
        F.col(id_col),
        F.explode(idx).alias("frame_idx"),
        F.expr(
            f"substring({bin_col}, cast(frame_idx * octet_length({bin_col}) / {n_frames} as int) + 1, 16)"
        ).alias("frame_bytes"),
    )
