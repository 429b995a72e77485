"""Perceptual image hashing + image near-duplicate pairs.

The multimodal tier decodes images (eight from-scratch codecs,
`operators/multimodal.py` / `jpeg.py` / `webp.py` / `tiff.py`) and the
text tier near-dups documents (`operators/dedup.py`); this module closes
the gap a real multimodal training-data pipeline hits next: NEAR-DUPED
IMAGES. A crawl corpus carries the same photo re-encoded (PNG vs JPEG vs
BMP), rescaled, or slightly retouched — exact byte/pixel dedup misses all
of it, and embedding near-dup needs a model. Perceptual hashes are the
standard middle tier: a 64-bit fingerprint of the image's coarse
luminance structure, invariant to container and (for the grid hashes)
to uniform rescaling, compared by Hamming distance.

Two hashes, the classic pair:

* **dhash** (difference hash): luminance block-reduced onto an
  (GRID_H, GRID_W+1) = (8, 9) grid, one bit per horizontal neighbour
  pair — ``bit(y,x) = mean(y,x) < mean(y,x+1)``. Implemented in EXACT
  integer arithmetic (cross-multiplied block sums, no division), so an
  ANSI-SQL oracle rebuilds every bit from the same pixels (q111).
* **phash** (DCT hash): luminance block-averaged onto 32x32, 2-D
  orthonormal DCT-II, the low-frequency 8x8 block thresholded at its
  median. Float arithmetic (cosines) — deterministic inside the Arrow
  kernel and pinned by planted-duplicate tests, but not SQL-expressible
  bit-for-bit, so dhash is the oracle-gated one (same disposition as
  the streaming transports in SURVEY §2).

Pair generation reuses `dedup.banded_hamming_pairs` — the SAME
Hamming-ball LSH banding that q43 gates for text simhash (exact for
``max_hamming <= bands - 1`` by pigeonhole, one shuffle on
(band, slice), never all-pairs).

Reference parity: the reference has no image tier at all (it renders
matplotlib density plots, ais_analysis.py); this extends the engine the
way its 100-TB deployment would need.

100 TB: decode+hash is a NARROW mapInPandas stage (Arrow-batched, one
pass over the media blobs, no shuffle); the pair stage shuffles
fingerprints once on (band, slice) with the broadcast size-table cap.
Nothing in this module moves pixel data through a shuffle — only 64-bit
fingerprints.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

GRID_H = 8  # dhash rows
GRID_W = 8  # dhash bits per row (grid has GRID_W + 1 columns)
PHASH_GRID = 32  # phash pre-DCT resize
PHASH_BLOCK = 8  # low-frequency block kept

IMAGE_HASHES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.IntegerType(), True),
    T.StructField("dhash", T.LongType(), True),
    T.StructField("phash", T.LongType(), True),
])


def _pack_bits(bits: list[int] | np.ndarray) -> int:
    """64 bits (index 0 = LSB) -> SIGNED int64, bit 63 via the
    two's-complement subtraction — the exact arithmetic the SQL oracle
    replays (BIGINT has no unsigned form in either engine)."""
    v = 0
    for k, b in enumerate(bits):
        if not b:
            continue
        v += -(1 << 63) if k == 63 else (1 << k)
    return v


def image_dhash(raster: np.ndarray) -> int:
    """Difference hash of an (h, w, 3) INTEGER raster, exact arithmetic.

    Luminance = r+g+b per pixel (integer, no luma weights — weights buy
    nothing for structure hashing and would force a rounding contract).
    The plane is block-reduced onto (GRID_H, GRID_W + 1) cells with the
    same integer linspace edges as `_grid_sums` (the deterministic
    resize used by every feature oracle since q56); the neighbour
    comparison cross-multiplies block sums by the opposite cell's pixel
    count, so no division ever happens and the bit is exact whatever the
    cell shapes:

        bit(y, x) = s(y,x) * c(y,x+1) < s(y,x+1) * c(y,x)

    Bit k = y * GRID_W + x (k=0 is LSB). Invariant under exact k-times
    pixel replication (every cell's sum and count scale by the same
    factor), which is what makes the q111 rescaled-twin plant a real
    invariance check, not a tautology.

    Sub-grid rasters (h < GRID_H or w < GRID_W + 1 = 9; ADVICE r14 #4):
    the integer linspace edges then repeat, and ``np.add.reduceat``'s
    repeated-edge behavior means boundary cells DUPLICATE a row/column
    while counts clamp to 1 — a deterministic nearest-neighbor UPSAMPLE,
    so the hash is still well-defined and replication-stable, but the
    exact-mean-comparison contract above only holds at h >= 8, w >= 9.
    Real-world thumbnails below 8x9 hash consistently with each other,
    just not as block MEANS of the original plane.
    """
    from pincspark.operators.multimodal import _grid_sums

    plane = raster.sum(axis=2)  # exact per-pixel r+g+b
    sums, counts = _grid_sums(plane, GRID_H, GRID_W + 1)
    s = sums.astype(object)  # python ints: s*c can exceed int64 at 8k x 8k
    c = counts.astype(object)
    bits = []
    for y in range(GRID_H):
        for x in range(GRID_W):
            bits.append(int(s[y][x] * c[y][x + 1] < s[y][x + 1] * c[y][x]))
    return _pack_bits(bits)


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (type-II, norm='ortho'): D @ v transforms
    a length-n signal; D @ P @ D.T transforms a 2-D plane."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    d = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2.0 * n))
    d[0, :] = np.sqrt(1.0 / n)
    return d


_DCT32 = _dct_matrix(PHASH_GRID)


def image_phash(raster: np.ndarray) -> int:
    """DCT perceptual hash: luminance block-averaged to 32x32 (float
    grid means), 2-D orthonormal DCT-II, the low-frequency 8x8 corner
    thresholded at its MEDIAN (DC included in the block, excluded from
    the median by the classic convention — its magnitude dwarfs the AC
    terms and would zero half the hash). Bit k = u * PHASH_BLOCK + v.
    Deterministic float arithmetic inside the kernel; pinned by planted
    re-encode/rescale twins in tests, not by a SQL oracle."""
    from pincspark.operators.multimodal import _grid_means

    plane = raster.sum(axis=2).astype(np.float64)
    small = _grid_means(plane, PHASH_GRID, PHASH_GRID)
    coeffs = _DCT32 @ small @ _DCT32.T
    block = coeffs[:PHASH_BLOCK, :PHASH_BLOCK].ravel()
    med = float(np.median(block[1:]))  # AC median, DC excluded
    bits = [int(v > med) for v in block]
    return _pack_bits(bits)


def _fake_hashes(data: bytes) -> tuple[int, int]:
    """Deterministic stand-in for undecodable blobs (non-strict mode):
    two independent 64-bit digests of the bytes — the pipeline shape
    stays real, and byte-identical blobs still near-dup (hamming 0)."""
    def h64(salt: bytes) -> int:
        d = hashlib.md5(salt + data).digest()[:8]
        return int.from_bytes(d, "big", signed=True)

    return h64(b"dhash:"), h64(b"phash:")


def decode_image_hashes(df: DataFrame, strict: bool = False) -> DataFrame:
    """Decode + perceptual-hash as ONE mapInPandas stage over media rows
    (``media_id``, ``content`` binary, ``kind``): returns
    (media_id, n_bytes, dhash BIGINT, phash BIGINT). Decoding reuses the
    shared raw-raster dispatch (`multimodal._decode_image_raster` — PPM/
    PNG/GIF/JPEG/VP8L-WebP/TIFF/BMP, all from-scratch); formats needing
    external codec libraries raise under ``strict`` and hash the raw
    bytes deterministically otherwise (same policy as
    `decode_image_features`). Narrow: no shuffle, pixels never leave the
    task."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pincspark.operators.multimodal import _decode_image_raster

        for pdf in it:
            rows = []
            for row in pdf.itertuples(index=False):
                data = bytes(row.content) if row.content is not None else b""
                decoded = _decode_image_raster(data)
                if decoded is not None:
                    raster, _maxval = decoded
                    dh, ph = image_dhash(raster), image_phash(raster)
                elif strict:
                    raise NotImplementedError(
                        "no codec for this image format in this environment; "
                        "plug PIL/torchvision into _decode_image_raster"
                    )
                else:
                    dh, ph = _fake_hashes(data)
                rows.append((int(row.media_id), len(data), dh, ph))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_bytes", "dhash", "phash"]
            )

    imgs = df.filter(F.col("kind") == "image").select("media_id", "content")
    return imgs.mapInPandas(_batches, IMAGE_HASHES_SCHEMA)


def image_neardup_pairs(
    df: DataFrame,
    hash_col: str = "dhash",
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket_size: int = 1000,
    strict: bool = False,
) -> DataFrame:
    """Image near-duplicate PAIRS (id_a < id_b, hamming <= max_hamming)
    over a media table: decode -> perceptual hash -> the q43
    Hamming-ball LSH banding (`dedup.banded_hamming_pairs`), exact for
    ``max_hamming <= bands - 1``. The pipeline a multimodal curation run
    puts in front of training: drop/cluster re-encoded and rescaled
    twins the exact and embedding tiers miss."""
    hashed = decode_image_hashes(df, strict=strict).select("media_id", hash_col)
    from pincspark.operators.dedup import banded_hamming_pairs

    return banded_hamming_pairs(
        hashed,
        "media_id",
        hash_col,
        bits=64,
        bands=bands,
        max_hamming=max_hamming,
        max_bucket_size=max_bucket_size,
        stage_label=f"image:{hash_col}:banded",
    )


def dhash_sql(ras: str = "ras", width: int = 18, height: int = 8) -> str:
    """The ANSI-SQL twin of `image_dhash` for a (height, width, 3) raster
    whose raw bytes sit in a string column ``ras`` (pixel (y, x) channel
    c at 1-based position 3*(y*width + x) + c + 1) — the q111 oracle
    builds the ENTIRE 64-bit hash from the same pixels the engine
    decodes. Requires width % (GRID_W + 1) == 0 and height % GRID_H == 0
    (equal-count cells: the cross-multiplication cancels and the
    comparison is a plain block-sum compare, keeping the generated
    expression readable); the engine-side hash has no such restriction.
    """
    if width % (GRID_W + 1) or height % GRID_H:
        raise ValueError("dhash_sql needs grid-divisible dimensions")
    cw, ch = width // (GRID_W + 1), height // GRID_H
    bv = f"list_transform(generate_series(1, {width * height * 3}), i -> " \
         f"CAST(ascii(substring({ras}, i, 1)) AS BIGINT))"

    def cell(y: int, x: int) -> str:
        terms = []
        for dy in range(ch):
            for dx in range(cw):
                p = 3 * ((y * ch + dy) * width + (x * cw + dx))
                terms.append(f"bv[{p + 1}] + bv[{p + 2}] + bv[{p + 3}]")
        return "(" + " + ".join(terms) + ")"

    terms = []
    for y in range(GRID_H):
        for x in range(GRID_W):
            k = y * GRID_W + x
            coeff = -(1 << 63) if k == 63 else (1 << k)
            terms.append(
                f"(CASE WHEN {cell(y, x)} < {cell(y, x + 1)} "
                f"THEN CAST({coeff} AS BIGINT) ELSE 0 END)"
            )
    return f"SELECT media_id, {' + '.join(terms)} AS dh FROM " \
           f"(SELECT media_id, {bv} AS bv FROM __ras__)"
