"""Real media decode: pure-stdlib PNG/GIF/BMP/JPEG/WAV codecs
(functions/media_codecs.py) + the mapInPandas operators over them
(operators/multimodal.py)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from neural_search_spark.functions import media_codecs as MC
from neural_search_spark.operators import multimodal as MM


# -- sniffing + dims --------------------------------------------------------

def test_sniff_all_formats():
    png = MC.encode_png(np.zeros((2, 3), dtype=np.uint8))
    assert MC.sniff_format(png) == "png"
    assert MC.sniff_format(MC.encode_gif_header(5, 7)) == "gif"
    assert MC.sniff_format(MC.encode_bmp(np.zeros((2, 3), dtype=np.uint8))) == "bmp"
    assert MC.sniff_format(MC.encode_jpeg_header(9, 4)) == "jpeg"
    assert MC.sniff_format(MC.encode_wav(np.zeros(4, dtype=np.int16))) == "wav"
    assert MC.sniff_format(b"plain text bytes") == "unknown"


@pytest.mark.parametrize(
    "payload,w,h",
    [
        (MC.encode_png(np.zeros((7, 11), dtype=np.uint8)), 11, 7),
        (MC.encode_gif_header(640, 480), 640, 480),
        (MC.encode_bmp(np.zeros((5, 9), dtype=np.uint8)), 9, 5),
        (MC.encode_jpeg_header(1920, 1080), 1920, 1080),
    ],
)
def test_parse_dims_each_format(payload, w, h):
    assert MC.parse_dims(payload) == (w, h)


def test_parse_dims_non_image_returns_none():
    assert MC.parse_dims(b"not an image at all") is None
    assert MC.parse_dims(MC.encode_wav(np.zeros(4, dtype=np.int16))) is None


def test_jpeg_dims_progressive_sof2():
    # SOF2 (progressive) instead of SOF0 — same frame-header layout
    sof2 = struct.pack(">BHHB", 8, 33, 44, 1) + b"\x01\x11\x00"
    b = b"\xff\xd8" + b"\xff\xc2" + struct.pack(">H", 2 + len(sof2)) + sof2 + b"\xff\xd9"
    assert MC.parse_dims(b) == (44, 33)


# -- PNG round trip (all color types) --------------------------------------

@pytest.mark.parametrize("shape", [(4, 5), (4, 5, 1), (3, 2, 2), (6, 4, 3), (2, 7, 4)])
def test_png_roundtrip(shape):
    rng = np.random.RandomState(42)
    arr = rng.randint(0, 256, size=shape, dtype=np.uint8)
    dec = MC.decode_png(MC.encode_png(arr))
    expect = arr if arr.ndim == 3 else arr[:, :, None]
    np.testing.assert_array_equal(dec, expect)


def _manual_png(w, h, ch, rows_with_filters):
    """Build a PNG whose rows use explicit filter types (exercises the
    Sub/Up/Average/Paeth unfilter paths the filter-0 encoder never
    emits). rows_with_filters: list of (ftype, filtered_bytes)."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(bytes([ft]) + bytes(r) for ft, r in rows_with_filters)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _filter_row(ftype, cur, prev, bpp):
    """Forward PNG filter (the inverse of what the decoder undoes)."""
    cur = cur.astype(np.int32)
    out = np.empty_like(cur)
    n = len(cur)
    for i in range(n):
        a = int(cur[i - bpp]) if i >= bpp else 0
        b = int(prev[i])
        c = int(prev[i - bpp]) if i >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) // 2
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out[i] = (cur[i] - pred) % 256
    return out.astype(np.uint8)


@pytest.mark.parametrize("ch", [1, 3, 4])
def test_png_all_filter_types_reverse_correctly(ch):
    rng = np.random.RandomState(7)
    w, h = 6, 5
    img = rng.randint(0, 256, size=(h, w * ch), dtype=np.uint8)
    rows, prev = [], np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        ft = y % 5  # one row per filter type
        rows.append((ft, _filter_row(ft, img[y], prev, ch)))
        prev = img[y]
    dec = MC.decode_png(_manual_png(w, h, ch, rows))
    np.testing.assert_array_equal(dec.reshape(h, w * ch), img)


def test_png_rejects_bad_payloads():
    with pytest.raises(ValueError):
        MC.decode_png(b"nope")
    # 16-bit depth unsupported
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + b"\x00\x00\x00\x00"
    )
    with pytest.raises(ValueError):
        MC.decode_png(bad)


# -- BMP round trip ---------------------------------------------------------

@pytest.mark.parametrize("shape", [(3, 4), (5, 7), (2, 8)])  # pad and no-pad widths
def test_bmp_roundtrip(shape):
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, size=shape, dtype=np.uint8)
    np.testing.assert_array_equal(MC.decode_bmp(MC.encode_bmp(arr)), arr)


# -- WAV round trip ---------------------------------------------------------

def test_wav_roundtrip():
    rng = np.random.RandomState(5)
    s = rng.randint(-32768, 32767, size=301, dtype=np.int16)
    rate, dec = MC.decode_wav(MC.encode_wav(s, sample_rate=16000))
    assert rate == 16000
    np.testing.assert_array_equal(dec, s)


def test_wav_tolerates_extra_riff_chunks():
    base = MC.encode_wav(np.array([1, -2, 3], dtype=np.int16))
    # splice a LIST chunk between fmt and data
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = base[:fmt_end] + extra + base[fmt_end:]
    rate, dec = MC.decode_wav(spliced)
    assert rate == 8000 and list(dec) == [1, -2, 3]


# -- kernels ----------------------------------------------------------------

def test_resize_nearest_exact_factor():
    arr = np.arange(16, dtype=np.uint8).reshape(4, 4)
    up = MC.resize_nearest(arr, 8, 8)
    assert up.shape == (8, 8)
    np.testing.assert_array_equal(up[::2, ::2], arr)  # 2x upsample replicates
    down = MC.resize_nearest(arr, 2, 2)
    np.testing.assert_array_equal(down, arr[[0, 2]][:, [0, 2]])


def test_image_and_audio_stats():
    arr = np.array([[0, 10], [250, 4]], dtype=np.uint8)
    assert MC.image_stats(arr) == (4, 264, 0, 250)
    s = np.array([3, -1, 0, 2, -5], dtype=np.int16)
    n, sa, zc = MC.audio_stats(s)
    assert (n, sa) == (5, 11)
    assert zc == 3  # 3→-1, -1→2, 2→-5 (zero skipped)


# -- Spark operators over real decode --------------------------------------

def _media_df(spark, n=12, kind="image"):
    docs = spark.range(n).withColumnRenamed("id", "doc_id")
    return MM.synthetic_media_table(docs, kind=kind)


def test_decode_media_batch_real(spark):
    rows = MM.decode_media_batch(_media_df(spark, kind="header"), decoder="real").collect()
    assert len(rows) == 12
    for r in rows:
        w, h = MM.synth_png_dims(r["doc_id"])
        assert (r["width"], r["height"]) == (w, h)


def test_image_stats_batch_matches_formula(spark):
    rows = MM.image_stats_batch(_media_df(spark)).collect()
    assert {r["fmt"] for r in rows} == {"png", "bmp"}
    for r in rows:
        did = r["doc_id"]
        w, h = MM.synth_png_dims(did)
        px = [(did * 7 + i * 3) % 256 for i in range(w * h)]
        assert (r["width"], r["height"]) == (w, h)
        assert r["n_px"] == w * h
        assert r["sum_px"] == sum(px)
        assert r["min_px"] == min(px) and r["max_px"] == max(px)


def test_resize_then_stats_composes(spark):
    small = MM.resize_images_batch(_media_df(spark, n=6), 4, 4)
    rows = MM.image_stats_batch(small).collect()
    assert len(rows) == 6
    assert all(r["width"] == 4 and r["height"] == 4 and r["n_px"] == 16 for r in rows)


def test_audio_stats_batch_matches_formula(spark):
    rows = MM.audio_stats_batch(_media_df(spark, kind="wav")).collect()
    for r in rows:
        s = MM.synth_wav_samples(r["doc_id"])
        n, sa, zc = MC.audio_stats(s)
        assert (r["sample_rate"], r["n_samples"]) == (8000, n)
        assert (r["sum_abs"], r["zero_crossings"]) == (sa, zc)


def test_real_decode_meta_raises_on_garbage():
    with pytest.raises(ValueError):
        MM.real_decode_meta(b"utf-8 text, not an image")


def test_image_embedding_visual_neardup(spark):
    """A resized copy of an image must embed close to the original
    (cosine ≫ unrelated images) — the visual near-dup contract."""
    import pandas as pd

    base = np.add.outer(
        np.arange(16, dtype=np.float64) * 8, np.arange(16, dtype=np.float64) * 4
    ).astype(np.uint8)
    variant = MC.resize_nearest(base, 32, 32)          # upscaled copy
    rng = np.random.RandomState(0)
    noise = rng.randint(0, 256, size=(16, 16), dtype=np.uint8)
    media = spark.createDataFrame(
        [(0, MC.encode_png(base)), (1, MC.encode_png(variant)),
         (2, MC.encode_png(noise))],
        "doc_id long, payload binary",
    )
    embs = {r["doc_id"]: np.array(r["embedding"])
            for r in MM.image_embedding_batch(media).collect()}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    assert cos(embs[0], embs[1]) > 0.98     # copy ≈ original
    assert cos(embs[0], embs[1]) > cos(embs[0], embs[2]) + 0.2


def test_phash_neardup_finds_brightness_shifted_replicas(spark):
    """The grouped fixture's guarantee: replicas of one template with
    the SAME brightness shift decode to identical pixels (different
    container bytes for odd/even ids) → aHash Hamming 0; they MUST be
    reported as near-dup pairs. Also: the hash is shift-invariant away
    from the mod-256 wraparound, so all same-template pairs stay
    within the graded Hamming budget."""
    from neural_search_spark import registry as R

    pairs = {
        (r["a"], r["b"]): r["hamming"]
        for r in R.SPARK_QUERIES["mm_phash_neardup"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    bm = R.MM_PHASH_BASE_MOD
    for base in range(bm):
        # replicas 0 and 3 share shift (0%3 == 3%3): guaranteed identical
        a, b = base, base + 3 * bm
        if b < R.MM_PHASH_DOCS:
            assert pairs.get((a, b)) == 0, (a, b, pairs.get((a, b)))
    assert len(pairs) >= bm  # every template yields at least one pair


def test_audio_neardup_finds_dc_shifted_replicas(spark):
    """WAV analogue of the pHash test: same-template same-offset
    replicas decode to identical PCM → Hamming 0 and must pair."""
    from neural_search_spark import registry as R

    pairs = {
        (r["a"], r["b"]): r["hamming"]
        for r in R.SPARK_QUERIES["mm_audio_neardup"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    bm = R.MM_PHASH_BASE_MOD
    for base in range(bm):
        a, b = base, base + 3 * bm
        if b < R.MM_PHASH_DOCS:
            assert pairs.get((a, b)) == 0, (a, b, pairs.get((a, b)))
    assert len(pairs) >= bm
