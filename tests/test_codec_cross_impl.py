"""Cross-implementation known-answer vectors for the from-scratch codecs
(VERDICT r6 #7): every blob here is MINTED BY JAVA IMAGEIO — the JDK's
independent PNG/GIF/JPEG codecs living in the Spark JVM — and decoded by
our pure-Python decoders. That breaks the "our encoder <-> our decoder"
closure that round-trip tests cannot: a shared spec misreading on both of
our sides cancels out in a round-trip but shows up immediately against a
foreign encoder.

Ground truth policy: for LOSSLESS formats (PNG, GIF) our decode must equal
the source raster bit-exactly — and where Java's color-model plumbing
already rewrites pixels on the way IN (TYPE_BYTE_GRAY setRGB applies a
colorspace conversion before encoding), the reference is ImageIO's own
raw RASTER SAMPLES of the written blob (getRaster().getSample — no color
conversion), i.e. exactly what the file contains. For JPEG (lossy) both
implementations decode the SAME blob and must agree within IDCT/chroma-
upsampling tolerance; the quantization loss is common-mode and cancels.

FLAC has no external encoder in this container (no flac/ffmpeg/sox
binaries, no soundfile — re-probed r7); its cross-checks remain the
golden hand-computed frames + CRC verification in test_flac.py.
"""

from __future__ import annotations

import numpy as np
import pytest

from pincspark.operators.jpeg import jpeg_decode
from pincspark.operators.multimodal import _decode_gif_raw, _decode_png_raw


def _encode(jvm, px: np.ndarray, fmt: str, *, image_type: str = "rgb",
             quality: float | None = None) -> bytes:
    """Encode a raster via javax.imageio. px is (h, w, 3) uint8 for rgb /
    indexed types, (h, w) uint8 for gray."""
    BI = jvm.java.awt.image.BufferedImage
    types = {
        "rgb": BI.TYPE_INT_RGB,
        "gray": BI.TYPE_BYTE_GRAY,
        "indexed": BI.TYPE_BYTE_INDEXED,
    }
    gray = image_type == "gray"
    h, w = px.shape[:2]
    img = BI(w, h, types[image_type])
    for y in range(h):
        for x in range(w):
            if gray:
                v = int(px[y, x])
                argb = (255 << 24) | (v << 16) | (v << 8) | v
            else:
                r, g, b = (int(v) for v in px[y, x])
                argb = (255 << 24) | (r << 16) | (g << 8) | b
            img.setRGB(x, y, argb - (1 << 32) if argb >= (1 << 31) else argb)
    baos = jvm.java.io.ByteArrayOutputStream()
    if quality is None:
        assert jvm.javax.imageio.ImageIO.write(img, fmt, baos)
    else:
        wr = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(fmt).next()
        p = wr.getDefaultWriteParam()
        p.setCompressionMode(2)  # ImageWriteParam.MODE_EXPLICIT
        p.setCompressionQuality(float(quality))
        ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
        wr.setOutput(ios)
        wr.write(None, jvm.javax.imageio.IIOImage(img, None, None), p)
        ios.flush()
        wr.dispose()
    return bytes(baos.toByteArray())


def _imageio_rgb(jvm, blob: bytes) -> np.ndarray:
    """ImageIO's decode of blob as (h, w, 3) via getRGB (sRGB view)."""
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(blob))
    h, w = img.getHeight(), img.getWidth()
    out = np.zeros((h, w, 3), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            v = img.getRGB(x, y) & 0xFFFFFF
            out[y, x] = [(v >> 16) & 255, (v >> 8) & 255, v & 255]
    return out


def _imageio_samples(jvm, blob: bytes, band: int = 0) -> np.ndarray:
    """ImageIO's RAW raster samples of blob's band (no color conversion) —
    the literal stored sample values, the right reference for gray blobs."""
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(blob))
    ras = img.getRaster()
    h, w = img.getHeight(), img.getWidth()
    out = np.zeros((h, w), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            out[y, x] = ras.getSample(x, y, band)
    return out


@pytest.fixture(scope="module")
def jvm(spark):
    return spark.sparkContext._jvm


# ----------------------------------------------------------- PNG (lossless)

def test_png_rgb_random_vector(jvm):
    rng = np.random.default_rng(7)
    src = rng.integers(0, 256, (11, 16, 3)).astype(np.uint8)
    raster, maxval = _decode_png_raw(_encode(jvm, src, "png"))
    assert maxval == 255
    assert (raster == src).all()


def test_png_rgb_gradient_vector(jvm):
    yy, xx = np.mgrid[0:9, 0:7]
    src = np.stack([(yy * 29) % 256, (xx * 37) % 256, ((yy + xx) * 13) % 256],
                   axis=-1).astype(np.uint8)
    raster, _ = _decode_png_raw(_encode(jvm, src, "png"))
    assert (raster == src).all()


def test_png_grayscale_vector(jvm):
    # TYPE_BYTE_GRAY setRGB color-converts on the way in, so the reference
    # is what ImageIO itself says the file contains (raw raster samples).
    src = (np.arange(40).reshape(5, 8) * 6).astype(np.uint8)
    blob = _encode(jvm, src, "png", image_type="gray")
    raster, maxval = _decode_png_raw(blob)
    ref = _imageio_samples(jvm, blob)
    assert maxval == 255
    assert (raster[..., 0] == ref).all()
    assert (raster[..., 0] == raster[..., 1]).all()
    assert (raster[..., 1] == raster[..., 2]).all()


def test_png_palette_vector(jvm):
    # TYPE_BYTE_INDEXED encodes color type 3 (PLTE) — the palette decode
    # path, against ImageIO's own sRGB view of its quantized image.
    rng = np.random.default_rng(3)
    src = rng.integers(0, 256, (8, 12, 3)).astype(np.uint8)
    blob = _encode(jvm, src, "png", image_type="indexed")
    raster, _ = _decode_png_raw(blob)
    assert (raster == _imageio_rgb(jvm, blob)).all()


# ----------------------------------------------------------- GIF (lossless)

def test_gif_four_color_random_vector(jvm):
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 128], [32, 64, 255]],
                   dtype=np.uint8)
    rng = np.random.default_rng(11)
    src = pal[rng.integers(0, 4, (10, 13))]
    raster, _ = _decode_gif_raw(_encode(jvm, src, "gif"))
    assert (raster == src).all()


def test_gif_checkerboard_vector(jvm):
    yy, xx = np.mgrid[0:16, 0:16]
    src = np.where(((yy + xx) % 2 == 0)[..., None],
                   np.uint8(255), np.uint8(0)).astype(np.uint8)
    src = np.repeat(src[..., None] if src.ndim == 2 else src, 3, axis=-1)
    raster, _ = _decode_gif_raw(_encode(jvm, src, "gif"))
    assert (raster == src).all()


def test_gif_stripes_vector(jvm):
    pal = np.array(
        [[i * 32, 255 - i * 32, (i * 77) % 256] for i in range(8)],
        dtype=np.uint8,
    )
    src = pal[np.tile(np.arange(8), (7, 2))[:, :13]]
    raster, _ = _decode_gif_raw(_encode(jvm, src, "gif"))
    assert (raster == src).all()


# -------------------------------------------------------------- JPEG (lossy)
# Both implementations decode the SAME ImageIO-minted blob: quantization
# loss is common-mode; the residual delta is IDCT precision + chroma
# upsampling choice (libjpeg fancy vs our replication). Measured deltas at
# these vectors: flat max 1, gray max <=2, smooth color max 4 / mean 1.15 —
# pinned with margin below.

def test_jpeg_flat_color_vector(jvm):
    src = np.full((16, 16, 3), (90, 160, 210), dtype=np.uint8)
    blob = _encode(jvm, src, "jpeg", quality=0.85)
    delta = np.abs(jpeg_decode(blob) - _imageio_rgb(jvm, blob))
    assert delta.max() <= 2


def test_jpeg_grayscale_gradient_vector(jvm):
    yy, xx = np.mgrid[0:24, 0:32]
    src = ((yy * 3 + xx * 2) % 200 + 20).astype(np.uint8)
    blob = _encode(jvm, src, "jpeg", image_type="gray", quality=0.92)
    ours = jpeg_decode(blob)
    ref = _imageio_samples(jvm, blob)  # single-component: raw samples
    assert ours.shape == (24, 32, 3)
    assert np.abs(ours[..., 0] - ref).max() <= 2
    assert (ours[..., 0] == ours[..., 1]).all()


def test_jpeg_smooth_color_vector(jvm):
    yy, xx = np.mgrid[0:24, 0:32]
    src = np.stack([(yy * 4) % 256, (xx * 5) % 256, ((yy + xx) * 3) % 256],
                   axis=-1).astype(np.uint8)
    blob = _encode(jvm, src, "jpeg", quality=0.9)
    ours = jpeg_decode(blob)
    theirs = _imageio_rgb(jvm, blob)
    delta = np.abs(ours - theirs)
    assert delta.max() <= 8
    assert delta.mean() <= 3.0
