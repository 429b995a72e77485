"""Perceptual audio hashing + audio near-duplicate pairs — the audio
twin of `operators/image_hash.py` (r14): a crawl corpus carries the
same clip re-encoded (FLAC vs WAV vs AU), gain-adjusted, or resampled
by replication — exact byte dedup misses all of it.

The fingerprint is an ENERGY-CONTOUR hash: the clip's |sample| sums
over BLOCKS + 1 equal-share blocks (integer linspace edges, the same
deterministic 1-D reduction as the audio feature bands), one bit per
adjacent-block comparison — "does the energy rise here?" — packed into
a signed 64-bit BIGINT (the image dhash packing). Exact integer
arithmetic end to end (cross-multiplied block sums, no division), so an
ANSI-SQL oracle rebuilds every bit from the same samples (q113), and
the hash is invariant under:

- **container** (any lossless codec: FLAC / PCM WAV / AU decode to the
  same integers);
- **positive gain** (scaling all samples by c > 0 scales every block
  sum by c — comparisons unchanged; the standard loudness-normalization
  confound);
- **exact k-times sample replication** when the length is divisible by
  BLOCKS + 1 (edges scale exactly — the resample-by-replication twin).

Pair generation reuses `dedup.banded_hamming_pairs` — the same
Hamming-ball LSH banding gated by q43 (text simhash) and q111 (image
dhash); this module is its third consumer, so one shared machinery
carries all three modalities' near-dup tiers.

Reference parity: the reference has no audio tier; this extends the
engine the way a multimodal curation deployment needs.

100 TB: decode+hash is one narrow Arrow stage; only 64-bit fingerprints
shuffle, once, on (band, slice).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOCKS = 64  # bits; the contour uses BLOCKS + 1 blocks

AUDIO_HASHES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.IntegerType(), True),
    T.StructField("ahash", T.LongType(), True),
])


def audio_contour_hash(x: np.ndarray) -> int | None:
    """Energy-contour hash of a decoded sample array, exact arithmetic.

    |x| sums over BLOCKS+1 equal-share blocks (integer linspace edges);
    bit k = 1 iff block k's mean |amplitude| < block k+1's, compared by
    cross-multiplied sums (s_k * c_{k+1} < s_{k+1} * c_k) so no division
    ever happens.

    Exactness with NORMALIZED floats: the shared decoders emit
    sample/2^B (B = 15 for 16-bit paths) — exact binary rationals with a
    COMMON denominator, so every |x| is exact, every block sum is
    integer-sum/2^B and exact in float64 while the integer numerator
    stays < 2^53 (a 16-bit clip would need > 2^37 samples ~ 38 hours at
    8 kHz to break that), and the cross-multiplied comparison equals the
    raw-integer comparison — which is also WHY the SQL oracle can
    rebuild the bits from the un-normalized mint values: the hash is
    invariant under any positive gain, 1/2^B included. None for empty
    clips (nothing to fingerprint; `decode_audio_hashes` records them
    with ahash NULL so they stay visible to accounting)."""
    from pincspark.operators.image_hash import _pack_bits

    n = len(x)
    if n == 0:
        return None
    edges = np.linspace(0, n, BLOCKS + 2).astype(int)
    a = np.abs(np.asarray(x, dtype=np.float64))
    widths = np.diff(edges)
    # reduceat sums segment [edges[i], edges[i+1]); a REPEATED edge
    # (empty segment, n < BLOCKS + 1) makes reduceat return a[edges[i]]
    # instead of the loop's 0.0 — mask those back to zero so the
    # vectorized form is bit-identical to the original slice loop.
    sums = np.add.reduceat(a, edges[:-1])
    sums[widths == 0] = 0.0
    counts = np.maximum(widths, 1).astype(np.float64)
    bits = (sums[:-1] * counts[1:] < sums[1:] * counts[:-1]).astype(int)
    return _pack_bits(bits)


def _fake_ahash(data: bytes) -> int:
    d = hashlib.md5(b"ahash:" + data).digest()[:8]
    return int.from_bytes(d, "big", signed=True)


def decode_audio_hashes(df: DataFrame, strict: bool = False) -> DataFrame:
    """Decode + contour-hash as ONE mapInPandas stage over media rows
    (``media_id``, ``content`` binary, ``kind``): returns
    (media_id, n_bytes, ahash BIGINT). Decoding reuses the shared
    raw-sample dispatch (`multimodal._decode_audio_samples` — PCM/
    IMA-ADPCM/G.711 WAV, Sun AU, FLAC, all stdlib/from-scratch); formats
    needing codec libraries raise under ``strict`` and hash the raw
    bytes deterministically otherwise (the `decode_audio_features`
    policy). Narrow: no shuffle, samples never leave the task."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pincspark.operators.multimodal import _decode_audio_samples

        for pdf in it:
            rows = []
            for row in pdf.itertuples(index=False):
                data = bytes(row.content) if row.content is not None else b""
                decoded = _decode_audio_samples(data)
                if decoded is not None:
                    # Empty-but-valid clips keep their row with ahash NULL
                    # (ADVICE r14 #1): a zero-sample WAV must stay visible
                    # to downstream accounting like every other decodable
                    # blob — NULL fingerprints generate no band slices, so
                    # the pair stage ignores them for free.
                    ah = audio_contour_hash(decoded[0])
                elif strict:
                    raise NotImplementedError(
                        "no codec for this audio format in this environment; "
                        "plug soundfile/librosa into _decode_audio_samples"
                    )
                else:
                    ah = _fake_ahash(data)
                rows.append((int(row.media_id), len(data), ah))
            yield pd.DataFrame(rows, columns=["media_id", "n_bytes", "ahash"])

    clips = df.filter(F.col("kind") == "audio").select("media_id", "content")
    return clips.mapInPandas(_batches, AUDIO_HASHES_SCHEMA)


def audio_neardup_pairs(
    df: DataFrame,
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket_size: int = 1000,
    strict: bool = False,
) -> DataFrame:
    """Audio near-duplicate PAIRS (id_a < id_b, hamming <= max_hamming):
    decode -> contour hash -> the shared Hamming-ball LSH banding
    (`dedup.banded_hamming_pairs`), exact for max_hamming <= bands-1."""
    hashed = decode_audio_hashes(df, strict=strict).select("media_id", "ahash")
    from pincspark.operators.dedup import banded_hamming_pairs

    return banded_hamming_pairs(
        hashed,
        "media_id",
        "ahash",
        bits=64,
        bands=bands,
        max_hamming=max_hamming,
        max_bucket_size=max_bucket_size,
        stage_label="audio:ahash:banded",
    )
