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
