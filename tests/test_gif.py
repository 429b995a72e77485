"""Pure-stdlib GIF codec: real LZW decompression proven by round-trip
through dictionary growth, CLEAR resets, and the KwKwK special case."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pincspark.operators.multimodal import (
    _decode_gif_raw,
    _decode_image_bytes,
    _lzw_decode,
    _lzw_encode,
    gif_encode,
)

GRAY_PAL = np.arange(256, dtype=np.uint8)[:, None].repeat(3, axis=1)


def test_lzw_kwkwk_special_case():
    # runs like [a, a, a, ...] force the decoder to resolve a code equal
    # to its current table size (the cScKcS case from the GIF spec)
    idx = [7] * 50 + [3] * 50
    assert _lzw_decode(_lzw_encode(idx, 8), 8, 100) == idx


def test_lzw_dictionary_overflow_clear():
    # enough distinct growth to pass 4096 entries -> encoder must emit
    # CLEAR and both sides must resynchronize
    rng = np.random.default_rng(11)
    idx = np.tile(rng.integers(0, 256, size=3000), 10).tolist()
    assert _lzw_decode(_lzw_encode(idx, 8), 8, len(idx)) == idx


def test_gif_roundtrip():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(17, 23), dtype=np.int64)
    raster, maxval = _decode_gif_raw(gif_encode(img, GRAY_PAL))
    assert maxval == 255
    assert (raster == GRAY_PAL.astype(np.int64)[img]).all()


def test_gif89a_extension_blocks_skipped():
    img = np.arange(16, dtype=np.int64).reshape(4, 4)
    data = gif_encode(img, GRAY_PAL)
    # splice a graphic-control extension between the screen+GCT and the
    # image descriptor, and flip to the 89a signature
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    at = 13 + 768  # header + screen descriptor + 256-entry GCT
    data89 = b"GIF89a" + data[6:at] + gce + data[at:]
    raster, _ = _decode_gif_raw(data89)
    assert (raster == GRAY_PAL.astype(np.int64)[img]).all()


def test_interlaced_roundtrip_and_corrupt_degrades():
    """4-pass interlaced GIFs decode for real (round 6): the encoder
    emits rows in pass order, the decoder un-permutes them."""
    img = np.random.default_rng(11).integers(0, 256, size=(13, 7), dtype=np.int64)
    raster, mv = _decode_gif_raw(gif_encode(img, GRAY_PAL, interlace=True))
    assert mv == 255 and (raster == GRAY_PAL.astype(np.int64)[img]).all()
    good = gif_encode(img, GRAY_PAL)
    assert _decode_image_bytes(good[: len(good) // 2], 4) is None
    assert _decode_image_bytes(good, 4) is not None


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    nsym=st.integers(1, 256),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_roundtrip_property(w, h, nsym, seed):
    img = np.random.default_rng(seed).integers(0, nsym, size=(h, w), dtype=np.int64)
    raster, maxval = _decode_gif_raw(gif_encode(img, GRAY_PAL))
    assert maxval == 255 and (raster == GRAY_PAL.astype(np.int64)[img]).all()


def test_local_color_table_overrides_global():
    """A frame-local palette (LCT) must be used instead of the global one."""
    import zlib as _  # noqa: F401  (parity with module deps)

    img = np.arange(16, dtype=np.int64).reshape(4, 4) % 8
    data = gif_encode(img, GRAY_PAL)
    at = 13 + 768  # start of the image descriptor
    desc = bytearray(data[at : at + 10])
    assert desc[0] == 0x2C
    lct = np.zeros((8, 3), dtype=np.uint8)
    lct[:, 0] = np.arange(8) * 30  # red-channel ramp, distinct from GCT
    desc[9] |= 0x80 | 0x02  # LCT present, 2^(2+1)=8 entries
    spliced = data[:at] + bytes(desc) + lct.tobytes() + data[at + 10 :]
    raster, _mv = _decode_gif_raw(spliced)
    assert (raster == lct.astype(np.int64)[img]).all()
