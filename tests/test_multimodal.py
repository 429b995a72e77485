"""Multimodal column tests: binary media table -> mapInPandas feature
stage (deterministic fake codec), frame/chunk grids, JVM-side fingerprint.
The codec is stubbed (no image/audio libs in this container) but the
Spark plumbing — schemas, batch shapes, explode logic — is real."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pincspark.operators.multimodal import (
    MEDIA_SCHEMA,
    chunk_audio,
    decode_image_features,
    media_fingerprint,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNG-fake-bytes-1", ("png", 64, 48, 3, None, None)),
        (2, "image", b"\x89PNG-fake-bytes-2", ("png", 32, 32, 1, None, None)),
        (3, "video", b"fake-mp4", ("mp4", 1280, 720, 3, None, 3500)),
        (4, "audio", b"fake-wav", ("wav", None, None, 2, 16000, 12500)),
        (5, "image", b"\x89PNG-fake-bytes-1", ("png", 64, 48, 3, None, None)),  # dup of 1
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_image_features_deterministic(spark, media):
    out = decode_image_features(media, dim=16)
    rows = {r["media_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 5}
    assert len(rows[1]["feature"]) == 16
    assert all(0.0 <= v <= 1.0 for v in rows[1]["feature"])
    # deterministic: identical bytes -> identical features (1 and 5 are dups)
    assert rows[1]["feature"] == rows[5]["feature"]
    assert rows[1]["feature"] != rows[2]["feature"]
    # rerun yields identical output (no RNG)
    again = {r["media_id"]: r for r in decode_image_features(media, dim=16).collect()}
    assert again[1]["feature"] == rows[1]["feature"]


def test_strict_mode_raises(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|image codec"):
        decode_image_features(media, strict=True).collect()


def test_video_frame_grid(spark, media):
    frames = sample_video_frames(media, every_ms=1000).collect()
    assert [(r["frame_idx"], r["frame_ts_ms"]) for r in sorted(frames, key=lambda r: r["frame_idx"])] == [
        (0, 0), (1, 1000), (2, 2000), (3, 3000),
    ]


def test_audio_chunk_grid(spark, media):
    chunks = sorted(chunk_audio(media, chunk_ms=5000).collect(), key=lambda r: r["chunk_idx"])
    assert [(r["start_ms"], r["end_ms"]) for r in chunks] == [
        (0, 5000), (5000, 10000), (10000, 12500),
    ]


def test_media_fingerprint_dedup(spark, media):
    fp = media_fingerprint(media)
    dups = (
        fp.groupBy("content_md5")
        .agg(F.count(F.lit(1)).alias("n"), F.collect_set("media_id").alias("ids"))
        .filter(F.col("n") > 1)
        .collect()
    )
    assert len(dups) == 1 and sorted(dups[0]["ids"]) == [1, 5]


def _ppm(w: int, h: int, px_fn) -> bytes:
    """Minimal P6 writer for fixtures (comment line included on purpose)."""
    body = bytearray()
    for y in range(h):
        for x in range(w):
            body.extend(bytes(px_fn(x, y)))
    return b"P6\n# fixture\n%d %d\n255\n" % (w, h) + bytes(body)


def _wav(samples: list[int], rate: int = 8000) -> bytes:
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(b"".join(struct.pack("<h", s) for s in samples))
    return buf.getvalue()


def test_ppm_decodes_for_real(spark):
    """P6 images decode with the pure-numpy codec: a uniform gray image
    yields exactly gray/255 everywhere, and a half-black/half-white image
    block-averages onto the grid with the halves intact — hand-computable
    expectations, not fake-codec hashes."""
    gray = _ppm(4, 2, lambda x, y: (128, 128, 128))
    split = _ppm(4, 4, lambda x, y: (0, 0, 0) if x < 2 else (255, 255, 255))
    media = spark.createDataFrame(
        [(1, "image", gray, None), (2, "image", split, None)],
        MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in decode_image_features(media, dim=4).collect()}
    g = 128.0 / 255.0
    assert rows[1]["mean_intensity"] == pytest.approx(g, abs=1e-9)
    assert [pytest.approx(g, abs=1e-6)] * 4 == list(rows[1]["feature"])
    # 2x2 grid of the split image: left cells 0, right cells 1 (row-major)
    assert [round(v, 6) for v in rows[2]["feature"]] == [0.0, 1.0, 0.0, 1.0]
    assert rows[2]["mean_intensity"] == pytest.approx(0.5, abs=1e-9)
    # real decode also satisfies strict mode (no codec library involved)
    strict_rows = decode_image_features(media, dim=4, strict=True).collect()
    assert len(strict_rows) == 2


def test_wav_decodes_for_real(spark):
    """PCM WAV decodes via the stdlib: a constant half-scale signal has
    RMS exactly 0.5 in every band, and the duration derives from the
    frame count and rate."""
    from pincspark.operators.multimodal import decode_audio_features

    const = _wav([16384] * 8000, rate=8000)  # 1 s at amplitude 0.5
    media = spark.createDataFrame(
        [(7, "audio", const, None), (8, "audio", b"fLaC-not-pcm", None)],
        MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in decode_audio_features(media, dim=4).collect()}
    assert rows[7]["rms"] == pytest.approx(0.5, abs=1e-9)
    assert rows[7]["sample_rate"] == 8000
    assert rows[7]["duration_ms"] == 1000
    assert [pytest.approx(0.5, abs=1e-6)] * 4 == list(rows[7]["feature"])
    # non-PCM bytes fall back to the deterministic fake (non-strict)
    assert rows[8]["sample_rate"] == 0 and len(rows[8]["feature"]) == 4
    with pytest.raises(Exception, match="NotImplementedError|audio format"):
        decode_audio_features(
            media.filter(F.col("media_id") == 8), strict=True
        ).collect()


def test_codec_edge_branches():
    """Pure-function codec branches that the Spark-stage tests don't hit:
    2-byte-maxval PPM (big-endian samples), 8-bit unsigned and stereo
    WAV, and the grid's mean-preservation property on block-aligned
    planes (no SparkSession needed — these run in the executor kernel)."""
    import struct
    import numpy as np
    from pincspark.operators.multimodal import (
        _decode_ppm,
        _decode_wav,
        _grid_means,
        _grid_shape,
    )

    # 16-bit PPM: maxval 65535, samples big-endian per netpbm
    raster = struct.pack(">6H", *([32768, 32768, 32768] * 2))
    px = _decode_ppm(b"P6 2 1 65535\n" + raster)
    assert px.shape == (1, 2, 3)
    assert np.allclose(px, 32768 / 65535.0)

    # 8-bit WAV is unsigned around 128; stereo mixes to mono
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(1)
        wf.setframerate(4000)
        # L=192 (+0.5), R=64 (-0.5) -> mono mix exactly 0.0
        wf.writeframes(bytes([192, 64] * 100))
    x, rate = _decode_wav(buf.getvalue())
    assert rate == 4000 and len(x) == 100
    assert np.allclose(x, 0.0)

    # grid block-averaging preserves the overall mean on aligned planes
    rng = np.arange(48, dtype=np.float64).reshape(6, 8) / 48.0
    gh, gw = _grid_shape(8)
    cells = _grid_means(rng, gh, gw)
    assert cells.shape == (gh, gw)
    assert abs(cells.mean() - rng.mean()) < 1e-12


def test_corrupt_media_does_not_kill_the_job(spark):
    """A truncated raster or WAV container must degrade to the
    deterministic fallback (non-strict), never fail the task — at corpus
    scale some blobs are always corrupt."""
    from pincspark.operators.multimodal import decode_audio_features

    bad_ppm = b"P6\n100 100\n255\n\x01\x02\x03"  # claims 30k bytes, has 3
    bad_wav = b"RIFF\x10\x00\x00\x00WAVEjunk"
    media = spark.createDataFrame(
        [(11, "image", bad_ppm, None), (12, "audio", bad_wav, None)],
        MEDIA_SCHEMA,
    )
    img = decode_image_features(media, dim=4).collect()
    aud = decode_audio_features(media, dim=4).collect()
    assert len(img) == 1 and len(img[0]["feature"]) == 4
    assert len(aud) == 1 and aud[0]["sample_rate"] == 0
