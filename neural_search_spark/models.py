"""Model registry: deterministic stub models behind the same pandas-UDF
plumbing a real model would use.

The reference's model surface is `ml/MLCommonsClientAccessor.java`
(async RPC to ML-Commons: inferenceSentences :110 dense,
inferenceSentencesWithMapResult :127 sparse, inferenceSentencesMap :150
multimodal, inferenceSimilarity :175 cross-encoder). In Spark the model
executes INSIDE the job as an Arrow-batched pandas UDF — no RPC, no
retry machinery (`util/RetryUtil.java`), no async rewrite loop; the
executor is the model host.

Stub semantics are seeded-hash embeddings: deterministic, stable across
processes (md5-based), dimension 64 — so golden top-k lists are
reproducible (SURVEY.md §5 port strategy). A real sentence-transformer
slots in by replacing `_token_vec` with a broadcast model's encode —
the UDF signature, batching, and asymmetry handling stay identical.

QUERY/PASSAGE asymmetry (`ml/AsymmetricModelDetector.java`,
`processor/TextEmbeddingProcessor.java:108-120`): content type is a
parameter that perturbs the hash seed, standing in for the asymmetric
prompt wrapping.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, MapType, StringType

DIM = 64


def _token_vec(token: str, seed: str) -> np.ndarray:
    """Deterministic unit-ish vector for one token: 64 dims from md5."""
    out = np.empty(DIM, dtype=np.float64)
    for block in range(DIM // 8):
        h = hashlib.md5(f"{seed}:{token}:{block}".encode()).digest()
        for j in range(8):
            out[block * 8 + j] = (h[2 * j] * 256 + h[2 * j + 1]) / 32767.5 - 1.0
    return out


def embed_text_py(text: str, content_type: str = "PASSAGE") -> list[float]:
    """Driver-side single-text embedding (query inference hoisting).

    QUERY and PASSAGE share the token space (so relevance = token
    overlap survives, as in a real asymmetric bi-encoder) but get a
    small content-type marker added, so embed(q, QUERY) ≠
    embed(q, PASSAGE) — the asymmetry the reference wires through
    `ml/AsymmetricModelDetector.java`.
    """
    acc = np.zeros(DIM, dtype=np.float64)
    for t in (text or "").lower().split():
        acc += _token_vec(t, "dense")
    acc += 0.05 * _token_vec(f"__type:{content_type}", "dense")
    n = math.sqrt(float(acc @ acc))
    if n > 0:
        acc /= n
    return [float(x) for x in acc]


def embed_text_image_py(text: str | None, image: bytes | None) -> list[float]:
    """Driver-side multimodal (text+image) query embedding — the
    query-time twin of `text_image_embed_udf` (F3), for the `neural`
    query's `query_image` parameter
    (`query/NeuralQueryBuilder.java` QUERY_IMAGE field): one embedding
    per query, hoisted into the plan as a literal."""
    acc = np.zeros(DIM, dtype=np.float64)
    for tok in (text or "").lower().split():
        acc += _token_vec(tok, "mm:text")
    if image:
        digest = hashlib.md5(bytes(image)).hexdigest()
        acc += _token_vec(digest, "mm:image")
    n = math.sqrt(float(acc @ acc))
    return [float(x) for x in (acc / n if n > 0 else acc)]


def dense_embed_udf(content_type: str = "PASSAGE"):
    """F1 `text_embedding` (`processor/TextEmbeddingProcessor.java:38-120`):
    string → array<float>[64], Arrow-batched."""

    @F.pandas_udf(ArrayType(FloatType()))
    def _embed(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: embed_text_py(t, content_type))

    return _embed


def sparse_encode_udf(prune_ratio: float = 0.0):
    """F2 `sparse_encoding` (`processor/SparseEncodingProcessor.java:55-100`):
    string → map<string,float>; token weight = tf · (1 + md5-salience),
    non-positive weights dropped (`util/TokenWeightUtil.java`)."""

    @F.pandas_udf(MapType(StringType(), FloatType()))
    def _encode(texts: pd.Series) -> pd.Series:
        def enc(t: str) -> dict[str, float]:
            tf: dict[str, int] = {}
            for tok in (t or "").lower().split():
                tf[tok] = tf.get(tok, 0) + 1
            out = {}
            for tok, c in tf.items():
                salience = int(hashlib.md5(f"sal:{tok}".encode()).hexdigest()[:4], 16) / 65535.0
                w = c * (1.0 + salience)
                if w > 0:
                    out[tok] = float(w)
            if prune_ratio > 0 and out:
                mx = max(out.values())
                out = {k: v for k, v in out.items() if v >= prune_ratio * mx}
            return out

        return texts.map(enc)

    return _encode


def text_image_embed_udf():
    """F3 `text_image_embedding`
    (`processor/TextImageEmbeddingProcessor.java:45-54,174`): CLIP-style
    joint embedding of {text, image}; image bytes hash into the same
    space as text tokens."""

    @F.pandas_udf(ArrayType(FloatType()))
    def _embed(text: pd.Series, image: pd.Series) -> pd.Series:
        def enc(t, img) -> list[float]:
            acc = np.zeros(DIM, dtype=np.float64)
            for tok in (t or "").lower().split():
                acc += _token_vec(tok, "mm:text")
            if img is not None:
                digest = hashlib.md5(bytes(img)).hexdigest()
                acc += _token_vec(digest, "mm:image")
            n = math.sqrt(float(acc @ acc))
            return [float(x) for x in (acc / n if n > 0 else acc)]

        return pd.Series([enc(t, i) for t, i in zip(text, image)])

    return _embed


def cross_encoder_udf(query_text: str):
    """Q1 cross-encoder similarity (inferenceSimilarity :175): token
    Jaccard stub, same scores as rerank.token_jaccard."""
    q = {t for t in query_text.lower().split() if t}

    @F.pandas_udf(FloatType())
    def _score(texts: pd.Series) -> pd.Series:
        def s(t: str) -> float:
            d = {x for x in (t or "").lower().split() if x}
            u = len(d | q)
            return float(len(d & q)) / u if u else 0.0

        return texts.map(s)

    return _score
