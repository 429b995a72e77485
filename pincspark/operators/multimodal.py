"""Multimodal columns for the training-data pipeline: image/audio/video as
opaque ``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` stages.

Design for 100 TB of media:
- media rows never leave the executor: decode/feature stages are
  mapInPandas (narrow, no shuffle); only compact features/metadata flow on.
- batches are capped via ``spark.sql.execution.arrow.maxRecordsPerBatch``
  so a batch of large blobs fits executor memory;
- partitioning: media tables should be written bucketed/partitioned by
  content-hash prefix so downstream dedup joins co-locate.

Codec stubs: this container ships no image/audio libraries, so the actual
pixel/sample decode is STUBBED — ``decode_image_batch`` raises
NotImplementedError when ``strict=True``, and by default produces a
DETERMINISTIC FAKE decode (content-hash-seeded stats) so the Spark-side
plumbing (schemas, UDF signatures, batch shapes, explode logic) is fully
real and testable. Swap ``_fake_pixels``/``_fake_samples`` for
PIL/libsndfile calls in production.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),  # image | audio | video
    T.StructField("content", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]), True),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.IntegerType(), True),
    T.StructField("mean_intensity", T.DoubleType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])


def _hash_floats(data: bytes, n: int, salt: bytes = b"") -> list[float]:
    """Deterministic pseudo-features from content bytes (the fake codec)."""
    out: list[float] = []
    counter = 0
    while len(out) < n:
        h = hashlib.md5(salt + data + counter.to_bytes(4, "big")).digest()
        out.extend(b / 255.0 for b in h)
        counter += 1
    return out[:n]


def decode_image_features(
    df: DataFrame,
    dim: int = 32,
    strict: bool = False,
) -> DataFrame:
    """Image decode + feature extraction as a mapInPandas stage.

    strict=True raises NotImplementedError (no image codec in this
    container); default produces deterministic fake features so the
    pipeline shape is real.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if strict:
                raise NotImplementedError(
                    "image codec not available in this environment; "
                    "plug PIL/torchvision here"
                )
            rows = []
            for row in pdf.itertuples(index=False):
                data = bytes(row.content) if row.content is not None else b""
                feats = _hash_floats(data, dim)
                rows.append((
                    int(row.media_id),
                    len(data),
                    round(sum(feats) / len(feats), 9),
                    feats,
                ))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_bytes", "mean_intensity", "feature"]
            )

    imgs = df.filter(F.col("kind") == "image").select("media_id", "content")
    return imgs.mapInPandas(_batches, IMAGE_FEATURES_SCHEMA)


def sample_video_frames(
    df: DataFrame,
    every_ms: int = 1000,
) -> DataFrame:
    """Frame sampling for video rows WITHOUT touching the bytes: pure
    column expressions explode a (media_id, frame_idx, frame_ts_ms) grid
    from the metadata duration — the expensive per-frame decode then runs
    only on the sampled grid (late materialization for media)."""
    vids = df.filter(F.col("kind") == "video").select(
        "media_id", F.col("meta.duration_ms").alias("duration_ms")
    )
    idx = F.sequence(
        F.lit(0),
        F.greatest((F.col("duration_ms") - 1) / F.lit(every_ms), F.lit(0)).cast("int"),
    )
    return vids.select(
        "media_id",
        F.posexplode(idx).alias("frame_idx", "_i"),
    ).select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") * every_ms).alias("frame_ts_ms"),
    )


def chunk_audio(
    df: DataFrame,
    chunk_ms: int = 5000,
) -> DataFrame:
    """Audio chunking grid (media_id, chunk_idx, start_ms, end_ms) — same
    late-materialization pattern as frame sampling."""
    auds = df.filter(F.col("kind") == "audio").select(
        "media_id", F.col("meta.duration_ms").alias("duration_ms")
    )
    idx = F.sequence(
        F.lit(0),
        F.greatest((F.col("duration_ms") - 1) / F.lit(chunk_ms), F.lit(0)).cast("int"),
    )
    return auds.select("media_id", F.explode(idx).alias("chunk_idx"), "duration_ms").select(
        "media_id",
        "chunk_idx",
        (F.col("chunk_idx") * chunk_ms).alias("start_ms"),
        F.least(F.col("chunk_idx") * chunk_ms + chunk_ms, F.col("duration_ms")).alias("end_ms"),
    )


def media_fingerprint(df: DataFrame) -> DataFrame:
    """Exact media dedup key: md5 over the raw bytes (JVM-side — binary
    columns never reach Python)."""
    return df.select(
        "media_id", "kind", F.md5(F.col("content")).alias("content_md5"),
        F.length(F.col("content")).alias("n_bytes"),
    )
