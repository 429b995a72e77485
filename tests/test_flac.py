"""From-scratch FLAC codec (operators/flac.py): lossless round-trips
across every subframe type and stereo decorrelation mode, multi-frame
streams, CRC corruption detection, bit-level primitives, and the
audio-features adapter — all without libsndfile."""

from __future__ import annotations

import numpy as np
import pytest

from pincspark.operators.flac import (
    _BitReader,
    _BitWriter,
    _read_utf8_number,
    _unzigzag,
    _utf8_number,
    _zigzag,
    decode_flac_audio,
    flac_decode,
    flac_encode,
)
from pincspark.operators.multimodal import _decode_audio_bytes

RNG = np.random.default_rng(77)


def _rt(x, **kw):
    out, rate = flac_decode(flac_encode(x, **kw))
    ref = np.asarray(x, dtype=np.int64)
    if ref.ndim == 1:
        ref = ref[:, None]
    return np.array_equal(out, ref), rate


@pytest.mark.parametrize(
    "mode", ["verbatim", "fixed0", "fixed1", "fixed2", "fixed3", "fixed4"]
)
def test_mono_roundtrip_all_fixed_orders(mode):
    x = RNG.integers(-32768, 32768, size=1000).astype(np.int64)
    ok, rate = _rt(x, mode=mode)
    assert ok and rate == 8000


def test_constant_subframe():
    ok, _ = _rt(np.full(500, -1234, dtype=np.int64), mode="constant")
    assert ok


def test_lpc_subframe():
    x = RNG.integers(-32768, 32768, size=1000).astype(np.int64)
    ok, _ = _rt(x, mode="lpc", lpc_coefs=[16000, -8000], lpc_shift=14)
    assert ok
    with pytest.raises(ValueError):  # coef outside 15-bit signed precision
        flac_encode(x, mode="lpc", lpc_coefs=[20000], lpc_shift=14)


@pytest.mark.parametrize(
    "sm", ["independent", "left_side", "right_side", "mid_side"]
)
def test_stereo_decorrelation_modes(sm):
    """left/side, right/side, mid/side are the lossless stereo modes —
    including the mid (l+r)>>1 bit-smuggling reconstruction."""
    st = RNG.integers(-32768, 32768, size=(800, 2)).astype(np.int64)
    ok, _ = _rt(st, stereo_mode=sm)
    assert ok


def test_multi_frame_stream():
    x = RNG.integers(-32768, 32768, size=10_000).astype(np.int64)
    ok, _ = _rt(x, block_size=1024)
    assert ok


def test_smooth_signal_compresses():
    """fixed2 on a smooth signal should actually compress (the Rice path
    is doing real work, not just format plumbing)."""
    t = np.arange(4096)
    x = (3000 * np.sin(t / 40.0)).astype(np.int64)
    smooth = len(flac_encode(x, mode="fixed2"))
    verbatim = len(flac_encode(x, mode="verbatim"))
    assert smooth < verbatim * 0.6


def test_crc_corruption_detected():
    x = RNG.integers(-32768, 32768, size=600).astype(np.int64)
    blob = bytearray(flac_encode(x))
    blob[len(blob) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        flac_decode(bytes(blob))


def test_truncation_and_garbage_rejected():
    x = RNG.integers(-32768, 32768, size=600).astype(np.int64)
    blob = flac_encode(x)
    with pytest.raises(ValueError):
        flac_decode(blob[: len(blob) - 3])
    with pytest.raises(ValueError):
        flac_decode(b"fLaCgarbage")
    with pytest.raises(ValueError):
        flac_decode(b"not flac at all")


def test_zigzag_and_utf8_primitives():
    for v in range(-3000, 3000):
        assert _unzigzag(_zigzag(v)) == v
    for n in [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 1 << 20, (1 << 31) - 1]:
        bw = _BitWriter()
        _utf8_number(bw, n)
        bw.align()
        assert _read_utf8_number(_BitReader(bytes(bw.out))) == n


def test_audio_features_adapter():
    """FLAC routes through _decode_audio_bytes like WAV: rms/bands from
    the real decoded samples, corrupt blobs -> None fallback."""
    x = RNG.integers(-32768, 32768, size=1600).astype(np.int64)
    got = _decode_audio_bytes(flac_encode(x, rate=16_000), 8)
    assert got is not None
    rms, rate, dur, feats = got
    assert rate == 16_000 and dur == 100 and len(feats) == 8
    expect = round(float(np.sqrt(np.mean((x / 32768.0) ** 2))), 9)
    assert abs(rms - expect) < 1e-9
    assert _decode_audio_bytes(b"fLaCbroken", 8) is None


# ------------------------------------------------------------- properties
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 3000),
    mode=st.sampled_from(["verbatim", "fixed1", "fixed2", "fixed3"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_mono_roundtrip_property(n, mode, seed):
    x = np.random.default_rng(seed).integers(-32768, 32768, size=n).astype(np.int64)
    ok, _ = _rt(x, mode=mode, block_size=1024)
    assert ok


@settings(max_examples=15, deadline=None)
@given(
    n=st.integers(2, 2000),
    sm=st.sampled_from(["left_side", "right_side", "mid_side"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_stereo_roundtrip_property(n, sm, seed):
    x = np.random.default_rng(seed).integers(-32768, 32768, size=(n, 2)).astype(np.int64)
    ok, _ = _rt(x, stereo_mode=sm, block_size=512)
    assert ok
