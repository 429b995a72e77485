"""Pure-stdlib PNG codec: lossless round-trip proofs per filter type and
color type, corrupt-blob degradation, and feature identity with the PPM
path (the shared integer-raster contract)."""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from pincspark.operators.multimodal import (
    _PNG_SIG,
    _decode_image_bytes,
    _decode_png_raw,
    _decode_ppm_raw,
    _png_chunk,
    _raster_features,
    png_encode,
)


def make_png(
    rows: bytes, w: int, h: int, depth: int, ctype: int, plte: bytes | None = None
) -> bytes:
    """Test-side generic PNG builder: raw sample rows, filter 0 scanlines."""
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    stride = w * nch * (depth // 8)
    assert len(rows) == h * stride
    body = b"".join(
        b"\x00" + rows[y * stride : (y + 1) * stride] for y in range(h)
    )
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([depth, ctype, 0, 0, 0])
    out = _PNG_SIG + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _png_chunk(b"PLTE", plte)
    return out + _png_chunk(b"IDAT", zlib.compress(body)) + _png_chunk(b"IEND", b"")


RNG = np.random.default_rng(42)


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_rgb_roundtrip_all_filters(ft):
    r = RNG.integers(0, 256, size=(13, 9, 3), dtype=np.int64)
    out, maxval = _decode_png_raw(png_encode(r, filter_type=ft))
    assert maxval == 255
    assert (out == r).all()


def test_grayscale():
    g = RNG.integers(0, 256, size=(5, 7), dtype=np.uint8)
    out, maxval = _decode_png_raw(make_png(g.tobytes(), 7, 5, 8, 0))
    assert maxval == 255
    assert (out == np.repeat(g[:, :, None], 3, axis=2)).all()


def test_gray_alpha_drops_alpha():
    ga = RNG.integers(0, 256, size=(4, 6, 2), dtype=np.uint8)
    out, _ = _decode_png_raw(make_png(ga.tobytes(), 6, 4, 8, 4))
    assert (out == np.repeat(ga[:, :, :1], 3, axis=2)).all()


def test_rgba_drops_alpha():
    rgba = RNG.integers(0, 256, size=(6, 4, 4), dtype=np.uint8)
    out, _ = _decode_png_raw(make_png(rgba.tobytes(), 4, 6, 8, 6))
    assert (out == rgba[:, :, :3].astype(np.int64)).all()


def test_palette():
    plte = RNG.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = RNG.integers(0, 16, size=(3, 5), dtype=np.uint8)
    out, maxval = _decode_png_raw(make_png(idx.tobytes(), 5, 3, 8, 3, plte.tobytes()))
    assert maxval == 255
    assert (out == plte.astype(np.int64)[idx]).all()


def test_16bit_gray():
    g = RNG.integers(0, 65536, size=(3, 4), dtype=np.uint16)
    out, maxval = _decode_png_raw(make_png(g.astype(">u2").tobytes(), 4, 3, 16, 0))
    assert maxval == 65535
    assert (out == np.repeat(g.astype(np.int64)[:, :, None], 3, axis=2)).all()


def test_png_features_equal_ppm_features():
    r = RNG.integers(0, 256, size=(8, 8, 3), dtype=np.int64)
    ppm = b"P6\n8 8\n255\n" + r.astype(np.uint8).tobytes()
    fa = _raster_features(*_decode_ppm_raw(ppm), 4)
    for ft in range(5):
        fb = _raster_features(*_decode_png_raw(png_encode(r, ft)), 4)
        assert fa == fb


def test_corrupt_png_degrades_not_raises():
    r = RNG.integers(0, 256, size=(5, 5, 3), dtype=np.int64)
    good = png_encode(r, 4)
    # truncated IDAT, garbage after signature, reserved interlace method
    assert _decode_image_bytes(good[: len(good) // 2], 4) is None
    assert _decode_image_bytes(_PNG_SIG + b"junkjunkjunk", 4) is None
    ihdr = (5).to_bytes(4, "big") * 2 + bytes([8, 2, 0, 0, 2])  # method 2
    bad = _PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 80)) + _png_chunk(b"IEND", b"")
    assert _decode_image_bytes(bad, 4) is None
    # the intact blob still decodes
    assert _decode_image_bytes(good, 4) is not None


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_adam7_interlaced_roundtrip(ft):
    """Adam7 decodes for real (round 6): seven per-pass unfilters
    scattered onto the output grid — lossless for every filter type."""
    r = RNG.integers(0, 256, size=(13, 22, 3), dtype=np.int64)
    out, maxval = _decode_png_raw(png_encode(r, filter_type=ft, interlace=True))
    assert maxval == 255 and (out == r).all()


def test_corrupt_jpeg_degrades():
    # JPEG decodes for real as of round 6 (operators/jpeg.py, full suite
    # in test_jpeg.py) — a truncated/garbage JPEG blob must still take the
    # undecodable fallback, not kill the task
    assert _decode_image_bytes(b"\xff\xd8\xff\xe0JFIF-ish", 4) is None


# ------------------------------------------------------------- properties
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    ft=st.integers(0, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_roundtrip_property(w, h, ft, seed):
    r = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.int64)
    out, maxval = _decode_png_raw(png_encode(r, filter_type=ft))
    assert maxval == 255 and (out == r).all()


@settings(max_examples=20, deadline=None)
@given(w=st.integers(1, 24), h=st.integers(1, 24), seed=st.integers(0, 2**31 - 1))
def test_adam7_roundtrip_property(w, h, seed):
    r = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.int64)
    out, _mv = _decode_png_raw(png_encode(r, filter_type=4, interlace=True))
    assert (out == r).all()
