"""Text-chunking functions — parity with `processor/chunker/*`.

All three algorithms are pure Catalyst expressions (substring / array
slice arithmetic over `sequence()`), so chunking runs inside codegen at
ingest scale — no Python per row.

Reference:
- fixed_token_length  `processor/chunker/FixedTokenLengthChunker.java:28-119`
  (token_limit default 384, overlap_rate 0..0.5 default 0)
- delimiter           `processor/chunker/DelimiterChunker.java:21-66`
  (default "\\n\\n", delimiter stays attached to the preceding chunk)
- fixed_char_length   `processor/chunker/FixedCharLengthChunker.java:23-84`
  (char_limit default 2048, overlap_rate ≤ 0.5)
- max_chunk_limit     `processor/chunker/Chunker.java` (default 100)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .common import let
from .sparse import tokens

DEFAULT_TOKEN_LIMIT = 384
DEFAULT_CHAR_LIMIT = 2048
DEFAULT_MAX_CHUNK_LIMIT = 100


def _starts(total_len: Column, window: int, stride: int) -> Column:
    """1-based start offsets: 1, 1+stride, … while start <= total_len."""
    return F.when(
        total_len >= 1,
        F.transform(
            F.sequence(F.lit(0), F.floor((total_len - 1) / F.lit(stride)).cast("int")),
            lambda i: i * stride + 1,
        ),
    ).otherwise(F.array().cast("array<int>"))


def chunk_fixed_char(
    text_col: Column, char_limit: int = DEFAULT_CHAR_LIMIT, overlap_rate: float = 0.0
) -> Column:
    """array<string> of character windows with overlap."""
    overlap = int(char_limit * overlap_rate)
    stride = max(char_limit - overlap, 1)
    return F.transform(
        _starts(F.length(text_col), char_limit, stride),
        lambda s: F.substring(text_col, s, char_limit),
    )


def chunk_fixed_token(
    text_col: Column, token_limit: int = DEFAULT_TOKEN_LIMIT, overlap_rate: float = 0.0
) -> Column:
    """array<string> of token windows re-joined with single spaces."""
    overlap = int(token_limit * overlap_rate)
    stride = max(token_limit - overlap, 1)
    return let(
        tokens(text_col),
        lambda toks: F.transform(
            _starts(F.size(toks), token_limit, stride),
            lambda s: F.array_join(F.slice(toks, s, token_limit), " "),
        ),
    )


def chunk_delimiter(text_col: Column, delimiter: str = "\n\n") -> Column:
    """Split on a literal delimiter, keeping the delimiter attached to
    the END of each preceding chunk (DelimiterChunker.java:21-66);
    a trailing empty piece is dropped."""
    import re

    with_delim = let(
        F.split(text_col, re.escape(delimiter)),
        lambda pieces: F.when(
            F.size(pieces) >= 1,
            F.transform(
                F.sequence(F.lit(1), F.size(pieces)),
                lambda i: F.when(
                    i < F.size(pieces),
                    F.concat(F.element_at(pieces, i), F.lit(delimiter)),
                ).otherwise(F.element_at(pieces, i)),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    return F.filter(with_delim, lambda c: c != "")


def enforce_max_chunk_limit(chunks: Column, limit: int = DEFAULT_MAX_CHUNK_LIMIT) -> Column:
    """Cap chunks per doc/field (TextChunkingProcessor.java:66,98-100);
    limit −1 disables."""
    if limit < 0:
        return chunks
    return F.slice(chunks, 1, limit)
