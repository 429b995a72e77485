"""G.711 (u-law / A-law) and Sun AU container tests.

The decode tables are gated against the stdlib ``audioop`` C
implementation byte-for-byte over the full 256-value domain — a true
independent reference (same policy as the IMA-ADPCM state machine)."""

from __future__ import annotations

import struct
import warnings

import numpy as np
import pytest

from pincspark.operators.multimodal import (
    _ALAW,
    _ULAW,
    _decode_au,
    _decode_audio_bytes,
    _decode_wav_g711,
    au_encode,
)


def _audioop():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop
    return audioop


def _wav_g711(payload: bytes, tag: int, rate: int = 8000, nch: int = 1) -> bytes:
    fmt = struct.pack("<HHIIHH", tag, nch, rate, rate * nch, nch, 8)
    chunks = (
        b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(payload).to_bytes(4, "little") + payload
    )
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def test_tables_match_audioop_exactly():
    audioop = _audioop()
    ua = np.frombuffer(audioop.ulaw2lin(bytes(range(256)), 2), "<i2")
    aa = np.frombuffer(audioop.alaw2lin(bytes(range(256)), 2), "<i2")
    assert (ua == _ULAW).all()
    assert (aa == _ALAW).all()


@pytest.mark.parametrize("tag,enc", [(7, "lin2ulaw"), (6, "lin2alaw")])
def test_wav_g711_decodes_audioop_encoded_stream(tag, enc):
    audioop = _audioop()
    s = np.random.default_rng(11).integers(-32768, 32768, 700).astype("<i2")
    comp = getattr(audioop, enc)(s.tobytes(), 2)
    dec = "ulaw2lin" if tag == 7 else "alaw2lin"
    ref = np.frombuffer(getattr(audioop, dec)(comp, 2), "<i2")
    x, rate = _decode_wav_g711(_wav_g711(comp, tag))
    assert rate == 8000
    assert np.array_equal((x * 32768.0).astype(np.int16), ref)


def test_wav_g711_stereo_mixes_down():
    audioop = _audioop()
    left = np.full(100, 1000, "<i2")
    right = np.full(100, -1000, "<i2")
    inter = np.empty(200, "<i2")
    inter[0::2], inter[1::2] = left, right
    comp = audioop.lin2ulaw(inter.tobytes(), 2)
    x, _ = _decode_wav_g711(_wav_g711(comp, 7, nch=2))
    assert len(x) == 100
    assert np.abs(x).max() < 0.01  # near-cancellation after mixdown


def test_au_roundtrips_all_encodings():
    s = np.random.default_rng(12).integers(-32768, 32768, 600).astype(np.int16)
    # linear 16: exact
    x, rate = _decode_au(au_encode(s, 16000, 3))
    assert rate == 16000 and np.array_equal((x * 32768.0).astype(np.int16), s)
    # G.711: bounded companding error, decreasing with amplitude class
    for enc in (1, 27):
        x, _ = _decode_au(au_encode(s, 8000, enc))
        err = np.abs(x * 32768.0 - s)
        assert err.max() < 1024  # top-chord step bound
        quiet = np.abs(s) < 256
        assert err[quiet].max() <= 16


def test_au_encode_decode_is_nearest_codeword():
    """The minting encoder picks the nearest table codeword, so encoding
    a decoded codeword is a fixed point (exact round-trip on table
    values)."""
    for table, enc in ((_ULAW, 1), (_ALAW, 27)):
        vals = np.asarray(table, dtype=np.int16)
        x, _ = _decode_au(au_encode(vals, 8000, enc))
        assert np.array_equal((x * 32768.0).astype(np.int16), vals)


def test_au_dispatch_and_features():
    s = (np.sin(np.linspace(0, 40 * np.pi, 4000)) * 20000).astype(np.int16)
    got = _decode_audio_bytes(au_encode(s, 8000, 1), 4)
    assert got is not None
    rms, rate, dur, feats = got
    assert rate == 8000 and dur == 500 and len(feats) == 4
    assert abs(rms - 20000 / 32768 / np.sqrt(2)) < 0.01


def test_au_hostile_inputs():
    with pytest.raises(ValueError):
        _decode_au(b".snd" + b"\x00" * 8)  # truncated header
    with pytest.raises(ValueError):
        _decode_au(b"nots" + b"\x00" * 24)
    bad = bytearray(au_encode(np.zeros(10, np.int16), 8000, 3))
    bad[4:8] = (0).to_bytes(4, "big")  # offset < 24
    with pytest.raises(ValueError):
        _decode_au(bytes(bad))
    bad = bytearray(au_encode(np.zeros(10, np.int16), 8000, 3))
    bad[15] = 99  # unsupported encoding
    with pytest.raises(ValueError):
        _decode_au(bytes(bad))
    # dispatch must swallow, not raise
    assert _decode_audio_bytes(b".snd" + b"\xff" * 40, 4) is None
