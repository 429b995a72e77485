"""Adversarial-input safety for every media codec: at 100 TB the binary
column WILL contain truncated, corrupted, and actively hostile blobs, and
the decode contract is "None (fallback) or a valid result — never a crash,
hang, or executor-destabilizing allocation". Pinned here: decompression
bombs are inflate-capped, absurd declared dimensions reject before any
allocation, and random/mutated bytes across every magic-number prefix
take the fallback path."""

from __future__ import annotations

import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pincspark.operators.flac import flac_encode
from pincspark.operators.jpeg import jpeg_encode
from pincspark.operators.tiff import tiff_encode
from pincspark.operators.webp import webp_encode
from pincspark.operators.multimodal import (
    _MAX_PIXELS,
    _PNG_SIG,
    _decode_audio_bytes,
    _decode_image_bytes,
    _png_chunk,
    au_encode,
    bmp_encode,
    gif_encode,
    png_encode,
    wav_ima_encode,
)

RNG = np.random.default_rng(4242)


def _ihdr(w: int, h: int, interlace: int = 0) -> bytes:
    return w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, interlace])


def test_png_decompression_bomb_is_inflate_capped():
    """A 5x5 PNG whose IDAT inflates to 100 MB must decode using only the
    raster-sized prefix — the bomb's tail is never materialized."""
    r = RNG.integers(0, 256, size=(5, 5, 3), dtype=np.int64)
    rows = b"".join(b"\x00" + r[y].astype(np.uint8).tobytes() for y in range(5))
    bomb = rows + b"\x00" * (100 * 1024 * 1024)  # 100 MB of zeros post-raster
    blob = (
        _PNG_SIG
        + _png_chunk(b"IHDR", _ihdr(5, 5))
        + _png_chunk(b"IDAT", zlib.compress(bomb, 9))  # ~100 KB on the wire
    )
    assert len(blob) < 1 << 20
    got = _decode_image_bytes(blob + _png_chunk(b"IEND", b""), 4)
    assert got is not None  # decodes fine from the capped prefix
    # and matches the uncompromised encode of the same raster
    assert got == _decode_image_bytes(png_encode(r), 4)


def test_absurd_declared_dimensions_reject_before_allocation():
    """Headers declaring ~2^31 pixels must take the fallback without the
    allocation ever happening (a MemoryError inside a mapInPandas batch
    would destabilize the shared Python worker)."""
    # PNG: 46341^2 > 2^31
    png = (
        _PNG_SIG
        + _png_chunk(b"IHDR", _ihdr(46341, 46341))
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 64))
        + _png_chunk(b"IEND", b"")
    )
    assert _decode_image_bytes(png, 4) is None
    # GIF: 65535 x 65535 frame
    g = bytearray(gif_encode(np.zeros((2, 2), dtype=np.int64),
                             np.zeros((256, 3), dtype=np.uint8)))
    at = 13 + 768
    g[at + 5 : at + 9] = (65535).to_bytes(2, "little") * 2
    assert _decode_image_bytes(bytes(g), 4) is None
    # JPEG: patch SOF dims to 65535 x 65535
    j = bytearray(jpeg_encode(np.zeros((8, 8), dtype=np.int64)))
    sof = j.find(b"\xff\xc0")
    j[sof + 5 : sof + 9] = b"\xff\xff\xff\xff"
    assert _decode_image_bytes(bytes(j), 4) is None
    assert 46341 * 46341 > _MAX_PIXELS  # the cap actually gates these


def _good_blobs() -> list[bytes]:
    r = RNG.integers(0, 256, size=(8, 8, 3), dtype=np.int64)
    g = RNG.integers(0, 256, size=(8, 24)).astype(np.int64)
    pal = np.arange(256, dtype=np.uint8)[:, None].repeat(3, axis=1)
    mono = RNG.integers(-32768, 32768, size=600).astype(np.int64)
    return [
        b"P6\n8 8\n255\n" + r.astype(np.uint8).tobytes(),
        png_encode(r, 4),
        png_encode(r, 3, interlace=True),
        gif_encode(g, pal),
        gif_encode(g, pal, interlace=True),
        jpeg_encode(r),
        jpeg_encode(r, subsample="420"),
        jpeg_encode(r, progressive=True),
        jpeg_encode(r, subsample="420", progressive=True, prog_al=1),
        flac_encode(mono),
        wav_ima_encode(mono, 8000),
        webp_encode(r.astype(np.uint8)),
        tiff_encode(r.astype(np.uint8), "packbits"),
        tiff_encode(r.astype(np.uint8), "lzw", predictor=True),
        tiff_encode(r.astype(np.uint8), "deflate", byte_order="MM"),
        bmp_encode(r.astype(np.uint8)),
        bmp_encode(g.astype(np.uint8), rle=True),
        au_encode(mono.astype(np.int16), 8000, 1),
        au_encode(mono.astype(np.int16), 8000, 27),
    ]


GOOD = _good_blobs()


@settings(max_examples=120, deadline=None)
@given(
    blob_i=st.integers(0, len(GOOD) - 1),
    cut=st.floats(0.01, 0.99),
    flips=st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(1, 255)),
        min_size=0, max_size=4,
    ),
)
def test_mutated_blobs_never_crash(blob_i, cut, flips):
    """Truncate a valid blob anywhere and flip up to 4 bytes: every codec
    must return None or a well-formed result — never raise out of the
    decode stage, never hang."""
    blob = bytearray(GOOD[blob_i][: max(4, int(len(GOOD[blob_i]) * cut))])
    for pos, x in flips:
        blob[pos % len(blob)] ^= x
    data = bytes(blob)
    img = _decode_image_bytes(data, 4)
    assert img is None or (len(img) == 2 and len(img[1]) == 4)
    aud = _decode_audio_bytes(data, 4)
    assert aud is None or (len(aud) == 4 and len(aud[3]) == 4)


@settings(max_examples=60, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), n=st.integers(0, 4096))
def test_random_bytes_never_crash(seed, n):
    """Pure noise, optionally wearing each format's magic prefix."""
    noise = np.random.default_rng(seed).integers(0, 256, size=n, dtype=np.uint8).tobytes()
    for prefix in (
        b"", b"P6", _PNG_SIG, b"GIF89a", b"\xff\xd8", b"fLaC", b"RIFF",
        b"RIFF\x20\x00\x00\x00WEBPVP8L", b"II*\x00", b"MM\x00*",
        b"BM", b".snd",
    ):
        data = prefix + noise
        img = _decode_image_bytes(data, 4)
        assert img is None or len(img) == 2
        aud = _decode_audio_bytes(data, 4)
        assert aud is None or len(aud) == 4
