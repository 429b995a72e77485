"""IMA-ADPCM audio codec: the 4-bit state machine is pinned bit-for-bit
against the stdlib ``audioop`` C implementation (an independent reference
for the same DVI/IMA algorithm), and the WAV block-format decoder is
proven by round-trip through the real encoder with an SNR bound (ADPCM is
lossy; the quantizer error is bounded by the step table)."""

from __future__ import annotations

import struct
import warnings

import numpy as np
import pytest

from pincspark.operators.multimodal import (
    _decode_audio_bytes,
    _decode_wav_ima,
    _ima_decode_core,
    _ima_encode_core,
    wav_ima_encode,
)

with warnings.catch_warnings():
    warnings.simplefilter("ignore", DeprecationWarning)
    audioop = pytest.importorskip("audioop")  # stdlib in 3.11, gone in 3.13;
    # only the TESTS use it (as the independent reference) — the decoder
    # itself is self-contained


def test_core_matches_audioop_decode():
    rng = np.random.default_rng(9)
    raw = bytes(rng.integers(0, 256, size=400, dtype=np.uint8))
    # audioop packs HIGH nibble first; our core takes a flat nibble list
    nibs = [n for b in raw for n in (b >> 4, b & 0x0F)]
    got, _, _ = _ima_decode_core(nibs, 0, 0)
    want = struct.unpack(f"<{len(nibs)}h", audioop.adpcm2lin(raw, 2, None)[0])
    assert got == list(want)


def test_core_matches_audioop_encode_decode_chain():
    rng = np.random.default_rng(10)
    pcm = (rng.standard_normal(512) * 8000).astype(np.int16)
    adp, _ = audioop.lin2adpcm(pcm.tobytes(), 2, None)
    nibs = [n for b in adp for n in (b >> 4, b & 0x0F)]
    got, _, _ = _ima_decode_core(nibs, 0, 0)
    want = struct.unpack(f"<{len(nibs)}h", audioop.adpcm2lin(adp, 2, None)[0])
    assert got == list(want)


def test_wav_ima_roundtrip_snr():
    rng = np.random.default_rng(11)
    t = np.arange(4000)
    clean = (
        10000 * np.sin(2 * np.pi * 440 * t / 8000)
        + 3000 * np.sin(2 * np.pi * 97 * t / 8000)
    ).astype(np.int16)
    data = wav_ima_encode(clean, 8000)
    x, rate = _decode_wav_ima(data)
    assert rate == 8000
    assert len(x) == 4000
    err = x * 32768.0 - clean.astype(np.float64)
    snr = 10 * np.log10(float((clean.astype(np.float64) ** 2).mean()) / float((err**2).mean()))
    assert snr > 12.0, f"SNR {snr:.1f} dB too low for IMA ADPCM"


def test_encoder_state_loop_is_self_consistent():
    rng = np.random.default_rng(12)
    pcm = (rng.standard_normal(300) * 5000).astype(np.int64).tolist()
    nibs, pred, idx = _ima_encode_core(pcm, 0, 0)
    dec, pred2, idx2 = _ima_decode_core(nibs, 0, 0)
    assert (pred, idx) == (pred2, idx2)  # encoder tracks the decoder state
    err = np.array(dec) - np.array(pcm)
    assert np.abs(err).mean() < 1500  # bounded quantization error (white noise
    # is ADPCM's worst case: the predictor assumes sample correlation)


def test_features_via_decode_audio_bytes():
    t = np.arange(2000)
    clean = (12000 * np.sin(2 * np.pi * 200 * t / 8000)).astype(np.int16)
    data = wav_ima_encode(clean, 8000)
    out = _decode_audio_bytes(data, 4)
    assert out is not None
    rms, rate, dur, feats = out
    assert rate == 8000 and dur == 250 and len(feats) == 4
    assert abs(rms - 12000 / 32768 / np.sqrt(2)) < 0.01


def test_corrupt_ima_degrades():
    t = np.arange(500)
    data = wav_ima_encode((1000 * np.sin(t / 5)).astype(np.int16), 8000)
    assert _decode_audio_bytes(data[:30], 4) is None
    bad = data.replace(b"fmt ", b"fmtX", 1)
    assert _decode_audio_bytes(bad, 4) is None


def test_stereo_blocks():
    # craft a 2-channel stream: constant-step content per channel
    rng = np.random.default_rng(13)
    l = (rng.standard_normal(1000) * 6000).astype(np.int16)
    r = (rng.standard_normal(1000) * 6000).astype(np.int16)
    # encode channels independently into the interleaved block layout
    block_samples = 505
    block_align = 2 * (4 + (block_samples - 1 + 7) // 8 * 4)
    blocks = bytearray()
    for start in range(0, 1000, block_samples):
        chans = [l[start : start + block_samples], r[start : start + block_samples]]
        states = []
        for c in range(2):
            pred = int(chans[c][0])
            blocks += int(pred & 0xFFFF).to_bytes(2, "little") + bytes([0, 0])
            states.append((pred, 0))
        nibs_all = []
        for c in range(2):
            nibs, _, _ = _ima_encode_core(
                [int(v) for v in chans[c][1:]], states[c][0], states[c][1]
            )
            nibs += [0] * ((block_align // 2 - 4) * 2 - len(nibs))
            nibs_all.append(nibs)
        for g in range(0, len(nibs_all[0]), 8):
            for c in range(2):
                for j in range(g, g + 8, 2):
                    blocks.append(
                        (nibs_all[c][j] & 0x0F) | ((nibs_all[c][j + 1] & 0x0F) << 4)
                    )
    fmt = (
        (17).to_bytes(2, "little") + (2).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
        + block_align.to_bytes(2, "little") + (4).to_bytes(2, "little")
        + (2).to_bytes(2, "little") + block_samples.to_bytes(2, "little")
    )
    body = (
        b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(blocks).to_bytes(4, "little") + bytes(blocks)
    )
    data = b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body
    x, rate = _decode_wav_ima(data)
    assert rate == 8000 and len(x) >= 1000
    want = (l.astype(np.float64) + r.astype(np.float64)) / 2 / 32768.0
    # lossy: mono mix tracks the source within quantization error
    assert np.abs(x[:1000] - want).mean() < 0.05


def test_core_matches_audioop_from_random_states():
    """The state machine agrees with audioop from ARBITRARY (pred, index)
    starting points, not just (0, 0) — the per-block header path."""
    rng = np.random.default_rng(14)
    for _ in range(25):
        pred = int(rng.integers(-32768, 32768))
        index = int(rng.integers(0, 89))
        raw = bytes(rng.integers(0, 256, size=64, dtype=np.uint8))
        nibs = [n for b in raw for n in (b >> 4, b & 0x0F)]
        got, gp, gi = _ima_decode_core(nibs, pred, index)
        want_bytes, (wp, wi) = audioop.adpcm2lin(raw, 2, (pred, index))
        want = struct.unpack(f"<{len(nibs)}h", want_bytes)
        assert got == list(want)
        assert (gp, gi) == (wp, wi)
