"""Baseline BMP codec tests: round-trips, JDK ImageIO cross-implementation
gates both ways (same policy as TIFF/PNG/GIF/JPEG), hand-built goldens for
decoder paths our encoder never emits (4-bit, 1-bit, top-down, 32-bit),
and hostile-input behavior."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pincspark.operators.multimodal import (
    _decode_bmp_raw,
    _decode_image_bytes,
    bmp_encode,
)


def _rng():
    return np.random.default_rng(99)


# --------------------------------------------------------------------------
# round-trips
# --------------------------------------------------------------------------


@pytest.mark.parametrize("shape", [(1, 1), (5, 3), (13, 7), (32, 32)])
def test_roundtrip_rgb24(shape):
    px = _rng().integers(0, 256, (*shape, 3), dtype=np.uint8)
    ras, mv = _decode_bmp_raw(bmp_encode(px))
    assert mv == 255 and (ras == px).all()


def test_roundtrip_gray8_and_rle8():
    g = _rng().integers(0, 256, (9, 11), dtype=np.uint8)
    ras, _ = _decode_bmp_raw(bmp_encode(g))
    assert (ras == np.repeat(g[:, :, None], 3, 2)).all()
    # runs + odd absolute tail exercise the RLE encoder paths
    g2 = np.zeros((6, 10), np.uint8)
    g2[2:4, 3:8] = 77
    g2[:, -1] = 255
    ras, _ = _decode_bmp_raw(bmp_encode(g2, rle=True))
    assert (ras == np.repeat(g2[:, :, None], 3, 2)).all()


# --------------------------------------------------------------------------
# cross-implementation (JDK ImageIO BMP plugin)
# --------------------------------------------------------------------------


def _jdk_write_bmp(jvm, px: np.ndarray, image_type: str = "rgb",
                   ctype: str | None = None) -> bytes:
    BI = jvm.java.awt.image.BufferedImage
    types = {"rgb": BI.TYPE_INT_RGB, "indexed": BI.TYPE_BYTE_INDEXED}
    h, w = px.shape[:2]
    img = BI(w, h, types[image_type])
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in px[y, x])
            argb = (255 << 24) | (r << 16) | (g << 8) | b
            img.setRGB(x, y, argb - (1 << 32) if argb >= (1 << 31) else argb)
    wr = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("bmp").next()
    p = wr.getDefaultWriteParam()
    if ctype is not None:
        p.setCompressionMode(2)
        p.setCompressionType(ctype)
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    wr.setOutput(ios)
    wr.write(None, jvm.javax.imageio.IIOImage(img, None, None), p)
    ios.flush()
    wr.dispose()
    return bytes(baos.toByteArray())


def test_jdk_minted_rgb_decodes_exact(spark):
    px = _rng().integers(0, 256, (17, 23, 3), dtype=np.uint8)
    ras, _ = _decode_bmp_raw(_jdk_write_bmp(spark._jvm, px))
    assert (ras == px).all()


def test_jdk_minted_indexed_rle8_decodes_exact(spark):
    """TYPE_BYTE_INDEXED + BI_RLE8: the JDK's RLE8 writer (EOL/absolute/
    run escapes) against our RLE8 state machine. Ground truth is the
    JDK's own read-back of its blob (indexed color quantizes the source
    through the default 6x6x6 palette on the way in)."""
    import sys

    sys.path.insert(0, "tests")
    from test_codec_cross_impl import _imageio_rgb

    jvm = spark._jvm
    px = np.zeros((14, 21, 3), np.uint8)
    px[3:9, 2:12] = (204, 102, 0)
    px[:, 15:] = (0, 153, 255)
    blob = _jdk_write_bmp(jvm, px, image_type="indexed", ctype="BI_RLE8")
    truth = _imageio_rgb(jvm, blob)
    ras, _ = _decode_bmp_raw(blob)
    assert (ras == truth).all()


def test_jdk_reads_our_blobs_exact(spark):
    import sys

    sys.path.insert(0, "tests")
    from test_codec_cross_impl import _imageio_rgb
    from test_tiff import _jdk_raster_gray

    jvm = spark._jvm
    px = _rng().integers(0, 256, (11, 19, 3), dtype=np.uint8)
    assert (_imageio_rgb(jvm, bmp_encode(px)) == px).all()
    # our gray-ramp palette makes the JDK build a GRAY color model whose
    # getRGB path applies linear->sRGB — compare the file's raw raster
    # samples instead (test_codec_cross_impl ground-truth policy)
    g = _rng().integers(0, 256, (8, 13), dtype=np.uint8)
    assert (_jdk_raster_gray(jvm, bmp_encode(g)) == g).all()
    g2 = np.zeros((7, 9), np.uint8)
    g2[2:5, 1:6] = 200
    assert (_jdk_raster_gray(jvm, bmp_encode(g2, rle=True)) == g2).all()


# --------------------------------------------------------------------------
# hand-built goldens
# --------------------------------------------------------------------------


def _bmp(w, h, bits, comp, pal, payload):
    data_off = 14 + 40 + len(pal)
    return (
        b"BM" + struct.pack("<IHHI", data_off + len(payload), 0, 0, data_off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, bits, comp,
                      len(payload), 0, 0, len(pal) // 4, 0)
        + pal + payload
    )


def test_golden_4bit_palette():
    """3x1 4-bit: nibbles high-first, stride padded to 4 bytes."""
    pal = bytes([10, 20, 30, 0,  40, 50, 60, 0,  70, 80, 90, 0])
    payload = bytes([0x01, 0x20, 0, 0])  # idx 0,1 then 2 + pad nibble
    ras, _ = _decode_bmp_raw(_bmp(3, 1, 4, 0, pal, payload))
    assert ras.tolist() == [[[30, 20, 10], [60, 50, 40], [90, 80, 70]]]


def test_golden_1bit_and_bottom_up():
    """8x2 1-bit: MSB-first bits; rows stored bottom-up."""
    pal = bytes([0, 0, 0, 0, 255, 255, 255, 0])
    payload = bytes([0b10110000, 0, 0, 0,  0b00000001, 0, 0, 0])
    ras, _ = _decode_bmp_raw(_bmp(8, 2, 1, 0, pal, payload))
    assert ras[1, :, 0].tolist() == [255, 0, 255, 255, 0, 0, 0, 0]  # first stored row = bottom
    assert ras[0, :, 0].tolist() == [0, 0, 0, 0, 0, 0, 0, 255]


def test_golden_top_down_negative_height():
    payload = bytes([1, 2, 3, 0,  4, 5, 6, 0])  # BGR rows, stride 4... w=1
    blob = (
        b"BM" + struct.pack("<IHHI", 54 + 8, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 1, -2, 1, 24, 0, 8, 0, 0, 0, 0)
        + payload
    )
    ras, _ = _decode_bmp_raw(blob)
    assert ras.tolist() == [[[3, 2, 1]], [[6, 5, 4]]]  # row 0 first (top-down)


def test_golden_32bit_bgrx():
    payload = bytes([9, 8, 7, 0xAA,  3, 2, 1, 0xBB])
    blob = (
        b"BM" + struct.pack("<IHHI", 54 + 8, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, -1, 1, 32, 0, 8, 0, 0, 0, 0)
        + payload
    )
    ras, _ = _decode_bmp_raw(blob)
    assert ras.tolist() == [[[7, 8, 9], [1, 2, 3]]]  # X byte ignored


# --------------------------------------------------------------------------
# hostile input
# --------------------------------------------------------------------------


def test_rejects_bad_magic_and_bomb():
    with pytest.raises(ValueError, match="magic"):
        _decode_bmp_raw(b"XX" + b"\x00" * 60)
    with pytest.raises(ValueError, match="implausible"):
        _decode_bmp_raw(_bmp(1 << 16, 1 << 16, 24, 0, b"", b""))


def test_rejects_truncated_pixels():
    px = _rng().integers(0, 256, (8, 8, 3), dtype=np.uint8)
    blob = bmp_encode(px)
    with pytest.raises(ValueError):
        _decode_bmp_raw(blob[:-30])


def test_rle8_truncation_never_hangs():
    g = _rng().integers(0, 256, (12, 12), dtype=np.uint8)
    blob = bmp_encode(g, rle=True)
    for cut in range(14, len(blob), 5):
        try:
            _decode_bmp_raw(blob[:cut])
        except ValueError:
            pass


def test_multimodal_dispatch_decodes_bmp(spark):
    from pincspark.operators.multimodal import decode_image_features

    px = _rng().integers(0, 256, (8, 8, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytes(bmp_encode(px)), "image")],
        "media_id long, content binary, kind string",
    )
    r = decode_image_features(df, dim=2, strict=True).collect()[0]
    exp_mean = round(float(px.astype(np.int64).sum()) / 3.0 / 64.0 / 255.0, 9)
    assert r["mean_intensity"] == exp_mean
    assert _decode_image_bytes(bytes(bmp_encode(px)), 4) is not None
