"""From-scratch baseline JPEG codec (operators/jpeg.py): exactness proof
on the block-constant gray contract q60's oracle relies on, tolerance
round-trips on arbitrary content, restart markers, scope rejections, and
corrupt-blob degradation — all without any codec library."""

from __future__ import annotations

import numpy as np
import pytest

from pincspark.operators.jpeg import (
    _fdct_blocks,
    _idct_blocks,
    jpeg_decode,
    jpeg_encode,
)
from pincspark.operators.multimodal import _decode_image_bytes, _raster_features

RNG = np.random.default_rng(1234)


def _block_constant_rgb(vals: np.ndarray) -> np.ndarray:
    """(by, bx) block values -> gray-valued RGB raster of 8x8-constant
    blocks — the construction on which the codec chain is EXACT."""
    img = np.repeat(np.repeat(vals, 8, 0), 8, 1)
    return np.repeat(img[:, :, None], 3, 2).astype(np.int64)


def test_dct_is_orthonormal_inverse_pair():
    b = RNG.standard_normal((5, 8, 8))
    assert np.abs(_idct_blocks(_fdct_blocks(b)) - b).max() < 1e-12


def test_block_constant_gray_color_is_bit_exact():
    """The q60 oracle contract: a gray-valued image constant within every
    8x8 block survives encode->decode EXACTLY (DC-only blocks carry the
    integer 8*(v-128); gray maps to Y=v, Cb=Cr=128 both ways)."""
    for _ in range(5):
        rgb = _block_constant_rgb(RNG.integers(0, 256, size=(3, 4)))
        assert np.array_equal(jpeg_decode(jpeg_encode(rgb)), rgb)


def test_block_constant_grayscale_1component_is_bit_exact():
    vals = RNG.integers(0, 256, size=(2, 3))
    g = np.repeat(np.repeat(vals, 8, 0), 8, 1).astype(np.int64)
    out = jpeg_decode(jpeg_encode(g))
    assert np.array_equal(out[:, :, 0], g)
    # gray replicated onto the shared (h, w, 3) raster contract
    assert np.array_equal(out[:, :, 0], out[:, :, 1])
    assert np.array_equal(out[:, :, 0], out[:, :, 2])


def test_random_grayscale_within_1():
    """quant=1 loses only DCT-coefficient rounding: |err| <= 1 observed,
    bound asserted at 2 to leave rounding-mode headroom."""
    g = RNG.integers(0, 256, size=(24, 17)).astype(np.int64)
    out = jpeg_decode(jpeg_encode(g))
    assert np.abs(out[:, :, 0] - g).max() <= 2


def test_random_rgb_within_3():
    """Color adds the YCbCr int round-trip on top of coefficient
    rounding; the 1.772/1.402 back-conversion amplifies chroma error."""
    c = RNG.integers(0, 256, size=(16, 16, 3)).astype(np.int64)
    assert np.abs(jpeg_decode(jpeg_encode(c)) - c).max() <= 3


def test_non_multiple_of_8_dimensions():
    g = RNG.integers(0, 256, size=(11, 13)).astype(np.int64)
    out = jpeg_decode(jpeg_encode(g))
    assert out.shape == (11, 13, 3)
    assert np.abs(out[:, :, 0] - g).max() <= 2


def test_restart_markers():
    """DRI + RSTn: per-interval DC predictor resets and marker skipping
    must reproduce the no-restart decode exactly."""
    g = RNG.integers(0, 256, size=(24, 32)).astype(np.int64)
    plain = jpeg_decode(jpeg_encode(g))
    for interval in (1, 2, 5):
        assert np.array_equal(
            jpeg_decode(jpeg_encode(g, restart_interval=interval)), plain
        )


def test_coarse_quant_still_decodes():
    g = RNG.integers(0, 256, size=(16, 16)).astype(np.int64)
    out = jpeg_decode(jpeg_encode(g, quant=16))
    # lossy but sane: bounded by quant-step worth of coefficient error
    assert np.abs(out[:, :, 0] - g).max() <= 64


def test_scope_rejections():
    with pytest.raises(ValueError):
        jpeg_decode(b"not a jpeg")
    with pytest.raises(ValueError):  # truncated SOF segment
        jpeg_decode(b"\xff\xd8\xff\xc2\x00\x05\x08\x00\x00")
    with pytest.raises(ValueError):  # arithmetic-coded sequential (SOF9)
        jpeg_decode(b"\xff\xd8\xff\xc9\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00")
    # sampling factors above 2 (the documented scope edge; 1x1..2x2 all
    # decode for real as of the 4:2:0/4:2:2 support)
    blob = bytearray(jpeg_encode(_block_constant_rgb(np.array([[7]]))))
    sof = blob.find(b"\xff\xc0")
    blob[sof + 11] = 0x41  # Y sampling 4x1
    with pytest.raises(ValueError):
        jpeg_decode(bytes(blob))


def test_corrupt_blob_degrades_not_raises():
    good = jpeg_encode(_block_constant_rgb(RNG.integers(0, 256, (2, 2))))
    assert _decode_image_bytes(good, 4) is not None
    assert _decode_image_bytes(good[: len(good) // 2], 4) is None
    assert _decode_image_bytes(b"\xff\xd8garbage", 4) is None


def test_features_match_analytic_formula():
    """The q60 arithmetic end-to-end in miniature: decode through
    _decode_image_bytes and compare with the analytic feature formula on
    the known block values (the same numbers the DuckDB oracle computes)."""
    vals = RNG.integers(0, 256, size=(2, 2))
    rgb = _block_constant_rgb(vals)
    got = _decode_image_bytes(jpeg_encode(rgb), 4)
    assert got is not None
    mean, feats = got
    exp_feats = [
        round(float(3 * 64 * v) / 3.0 / 64.0 / 255.0, 9) for v in vals.ravel()
    ]
    exp_mean = round(float(3 * 64 * int(vals.sum())) / 3.0 / 256.0 / 255.0, 9)
    assert feats == exp_feats
    assert mean == exp_mean


def test_raster_features_shared_contract_with_ppm_path():
    """The JPEG branch lands on the same (h, w, 3) integer-raster contract
    as PPM/PNG/GIF: identical rasters -> identical features."""
    rgb = _block_constant_rgb(RNG.integers(0, 256, (2, 2)))
    direct = _raster_features(rgb, 255, 4)
    via_jpeg = _decode_image_bytes(jpeg_encode(rgb), 4)
    assert via_jpeg == direct


# ------------------------------------------------------------- properties
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    by=st.integers(1, 3),
    bx=st.integers(1, 3),
    seed=st.integers(0, 2**31 - 1),
)
def test_block_constant_exactness_property(by, bx, seed):
    rgb = _block_constant_rgb(
        np.random.default_rng(seed).integers(0, 256, size=(by, bx))
    )
    assert np.array_equal(jpeg_decode(jpeg_encode(rgb)), rgb)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 20),
    seed=st.integers(0, 2**31 - 1),
)
def test_grayscale_tolerance_property(w, h, seed):
    g = np.random.default_rng(seed).integers(0, 256, size=(h, w)).astype(np.int64)
    out = jpeg_decode(jpeg_encode(g))
    assert out.shape == (h, w, 3)
    assert np.abs(out[:, :, 0] - g).max() <= 2


@pytest.mark.parametrize("ss", ["444", "422", "420"])
def test_block_constant_exact_under_subsampling(ss):
    """4:2:2/4:2:0 MCU interleave + chroma downsample/upsample: gray
    block-constant images stay BIT-EXACT (chroma is constant 128, so the
    box-mean downsample and nearest-neighbor reconstruction are both
    lossless) — the q60 contract survives every subsampling mode."""
    vals = RNG.integers(0, 256, size=(2, 4))
    rgb = _block_constant_rgb(vals)
    assert np.array_equal(jpeg_decode(jpeg_encode(rgb, subsample=ss)), rgb)


@pytest.mark.parametrize("ss", ["422", "420"])
def test_gray_valued_subsampled_within_1(ss):
    """Arbitrary gray-valued (not block-aligned) images: chroma stays 128
    so subsampling costs nothing; only DCT rounding remains."""
    g = RNG.integers(0, 256, size=(19, 21))
    rgb = np.repeat(g[:, :, None], 3, 2).astype(np.int64)
    out = jpeg_decode(jpeg_encode(rgb, subsample=ss))
    assert np.abs(out - rgb).max() <= 1


def test_subsampled_restart_markers():
    g = RNG.integers(0, 256, size=(24, 40, 3)).astype(np.int64)
    plain = jpeg_decode(jpeg_encode(g, subsample="420"))
    assert np.array_equal(
        jpeg_decode(jpeg_encode(g, subsample="420", restart_interval=2)), plain
    )


def test_chroma_subsampling_is_really_happening():
    """A 4:2:0 encode of a color image must be smaller than 4:4:4 (half
    the chroma blocks are actually gone)."""
    c = RNG.integers(0, 256, size=(32, 32, 3)).astype(np.int64)
    assert len(jpeg_encode(c, subsample="420")) < len(jpeg_encode(c, subsample="444"))


# ---------------------------------------------------------- progressive


def test_progressive_equals_baseline_decode():
    """SOF2 spectral selection is a lossless re-layout of the SAME
    coefficients: progressive decode must equal baseline decode exactly
    — gray, color, subsampled, odd dims, coarse quant."""
    cases = [
        dict(raster=RNG.integers(0, 256, size=(24, 17)).astype(np.int64)),
        dict(raster=RNG.integers(0, 256, size=(19, 21, 3)).astype(np.int64)),
        dict(
            raster=RNG.integers(0, 256, size=(24, 40, 3)).astype(np.int64),
            subsample="420",
        ),
        dict(raster=RNG.integers(0, 256, size=(32, 32)).astype(np.int64), quant=8),
    ]
    for kw in cases:
        r = kw.pop("raster")
        base = jpeg_decode(jpeg_encode(r, **kw))
        prog = jpeg_decode(jpeg_encode(r, progressive=True, **kw))
        assert np.array_equal(prog, base), kw


def test_progressive_successive_approximation_equals_baseline():
    """Two-level successive approximation (Al=1 first scans + Ah=1
    refinement scans, incl. the G.1.2.3 AC correction-bit procedure and
    EOBn bit buffering) reconstructs the exact coefficients."""
    cases = [
        RNG.integers(0, 256, size=(24, 17)).astype(np.int64),
        RNG.integers(0, 256, size=(19, 21, 3)).astype(np.int64),
        RNG.integers(0, 256, size=(64, 64)).astype(np.int64),
    ]
    for r in cases:
        base = jpeg_decode(jpeg_encode(r))
        sa = jpeg_decode(jpeg_encode(r, progressive=True, prog_al=1))
        assert np.array_equal(sa, base)
    # subsampled color through SA
    c = RNG.integers(0, 256, size=(24, 40, 3)).astype(np.int64)
    assert np.array_equal(
        jpeg_decode(jpeg_encode(c, subsample="420", progressive=True, prog_al=1)),
        jpeg_decode(jpeg_encode(c, subsample="420")),
    )


def test_progressive_block_constant_gray_is_bit_exact():
    for prog_al in (0, 1):
        rgb = _block_constant_rgb(RNG.integers(0, 256, size=(2, 4)))
        out = jpeg_decode(jpeg_encode(rgb, progressive=True, prog_al=prog_al))
        assert np.array_equal(out, rgb)


def test_progressive_eobn_runs_are_real():
    """A mostly-flat image makes long EOB runs: the EOBn path (r > 0 with
    extension bits) must round-trip, and sparse spikes exercise the
    ZRL-across-history interleave in refinement scans."""
    flat = np.full((64, 64), 128, dtype=np.int64)
    assert np.array_equal(
        jpeg_decode(jpeg_encode(flat, progressive=True))[:, :, 0], flat
    )
    sp = np.full((40, 40), 128, dtype=np.int64)
    sp[::7, ::11] = 255
    base = jpeg_decode(jpeg_encode(sp))
    for al in (0, 1):
        assert np.array_equal(
            jpeg_decode(jpeg_encode(sp, progressive=True, prog_al=al)), base
        )


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    al=st.integers(0, 1),
    seed=st.integers(0, 2**31 - 1),
)
def test_progressive_roundtrip_property(w, h, al, seed):
    g = np.random.default_rng(seed).integers(0, 256, size=(h, w)).astype(np.int64)
    base = jpeg_decode(jpeg_encode(g))
    prog = jpeg_decode(jpeg_encode(g, progressive=True, prog_al=al))
    assert np.array_equal(prog, base)
