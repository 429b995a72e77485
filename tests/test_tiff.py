"""From-scratch baseline TIFF codec tests.

Unlike the VP8L/FLAC tiers (no external encoder in this container), the
JDK ships an independent TIFF plugin (javax.imageio, JDK 9+), so EVERY
compression/layout decision here is cross-implementation gated both ways:
JDK-minted blobs through our decoder, our blobs through the JDK reader —
the arrangement that caught the LZW early-change off-by-one during
development (our encoder/decoder pair round-tripped fine while both
disagreed with the JDK)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pincspark.operators.tiff import (
    _lzw_decode,
    _unpackbits,
    decode_tiff_raw,
    tiff_encode,
)

COMPS = ("none", "packbits", "lzw", "deflate")


def _rng():
    return np.random.default_rng(1234)


# --------------------------------------------------------------------------
# round-trips
# --------------------------------------------------------------------------


@pytest.mark.parametrize("shape", [(1, 1), (3, 5), (16, 7), (64, 64)])
@pytest.mark.parametrize("comp", COMPS)
def test_roundtrip_rgb(shape, comp):
    px = _rng().integers(0, 256, (*shape, 3), dtype=np.uint8)
    for bo in ("II", "MM"):
        ras, mv = decode_tiff_raw(tiff_encode(px, comp, byte_order=bo))
        assert mv == 255 and (ras == px).all(), (comp, bo)


@pytest.mark.parametrize("comp", COMPS)
def test_roundtrip_gray(comp):
    g = _rng().integers(0, 256, (9, 13), dtype=np.uint8)
    ras, _ = decode_tiff_raw(tiff_encode(g, comp))
    assert (ras == np.repeat(g[:, :, None], 3, axis=2)).all()


@pytest.mark.parametrize("comp", ["lzw", "deflate"])
def test_roundtrip_predictor(comp):
    # a smooth gradient is where horizontal differencing actually bites
    x = np.linspace(0, 255, 64, dtype=np.uint8)
    px = np.repeat(np.repeat(x[None, :, None], 48, 0), 3, 2)
    plain = tiff_encode(px, comp)
    pred = tiff_encode(px, comp, predictor=True)
    ras, _ = decode_tiff_raw(pred)
    assert (ras == px).all()
    assert len(pred) < len(plain)  # the predictor must actually help here


def test_predictor_rejected_outside_lzw_deflate():
    px = np.zeros((4, 4, 3), np.uint8)
    with pytest.raises(ValueError, match="predictor"):
        tiff_encode(px, "packbits", predictor=True)


def test_lzw_table_reset_path():
    """256x256 random RGB forces >4093 LZW table entries -> in-stream
    Clear + re-widening from 9 bits."""
    px = _rng().integers(0, 256, (256, 256, 3), dtype=np.uint8)
    ras, _ = decode_tiff_raw(tiff_encode(px, "lzw"))
    assert (ras == px).all()


# --------------------------------------------------------------------------
# cross-implementation (JDK ImageIO TIFF plugin)
# --------------------------------------------------------------------------


def _jdk_write(jvm, px: np.ndarray, ctype: str | None, image_type: str = "rgb") -> bytes:
    BI = jvm.java.awt.image.BufferedImage
    types = {"rgb": BI.TYPE_INT_RGB, "gray": BI.TYPE_BYTE_GRAY,
             "indexed": BI.TYPE_BYTE_INDEXED}
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
    wr = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    p = wr.getDefaultWriteParam()
    if ctype is not None:
        p.setCompressionMode(2)  # MODE_EXPLICIT
        p.setCompressionType(ctype)
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    wr.setOutput(ios)
    wr.write(None, jvm.javax.imageio.IIOImage(img, None, None), p)
    ios.flush()
    wr.dispose()
    return bytes(baos.toByteArray())


def _jdk_raster_gray(jvm, blob: bytes) -> np.ndarray:
    """ImageIO's RAW raster samples of the blob (what the file contains,
    no color-model conversion) — ground truth for gray sources whose
    setRGB path already rewrote intensities."""
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(blob))
    ras = img.getRaster()
    h, w = img.getHeight(), img.getWidth()
    out = np.zeros((h, w), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            out[y, x] = ras.getSample(x, y, 0)
    return out


@pytest.mark.parametrize("ctype", [None, "LZW", "PackBits", "Deflate", "ZLib"])
def test_jdk_minted_rgb_decodes_exact(spark, ctype):
    jvm = spark._jvm
    px = _rng().integers(0, 256, (23, 17, 3), dtype=np.uint8)
    px[4:12, 3:9] = 77  # structured region so LZW/RLE build real runs
    ras, _ = decode_tiff_raw(_jdk_write(jvm, px, ctype))
    assert (ras == px).all()


def test_jdk_minted_lzw_past_width_change_decodes_exact(spark):
    """80x80 random RGB pushes the JDK's LZW writer through the 9->10->11
    bit width changes — the early-change timing gate."""
    jvm = spark._jvm
    px = _rng().integers(0, 256, (80, 80, 3), dtype=np.uint8)
    ras, _ = decode_tiff_raw(_jdk_write(jvm, px, "LZW"))
    assert (ras == px).all()


def test_jdk_minted_gray_decodes_exact(spark):
    jvm = spark._jvm
    g = _rng().integers(0, 256, (11, 9), dtype=np.uint8)
    blob = _jdk_write(jvm, g, "LZW", image_type="gray")
    # TYPE_BYTE_GRAY setRGB converts through linear colorspace — compare
    # against the file's own raster samples (test_codec_cross_impl policy)
    truth = _jdk_raster_gray(jvm, blob)
    ras, _ = decode_tiff_raw(blob)
    assert (ras == np.repeat(truth[:, :, None], 3, axis=2)).all()


@pytest.mark.parametrize("comp", COMPS)
@pytest.mark.parametrize("predictor", [False, True])
def test_jdk_reads_our_blobs_exact(spark, comp, predictor):
    if predictor and comp not in ("lzw", "deflate"):
        pytest.skip("predictor defined only for lzw/deflate")
    import sys

    sys.path.insert(0, "tests")
    from test_codec_cross_impl import _imageio_rgb

    jvm = spark._jvm
    px = _rng().integers(0, 256, (19, 21, 3), dtype=np.uint8)
    px[3:9, 4:16] = 190
    back = _imageio_rgb(jvm, tiff_encode(px, comp, predictor))
    assert (back == px).all()


# --------------------------------------------------------------------------
# hand-assembled goldens (decoder paths our encoder never emits)
# --------------------------------------------------------------------------


def _ifd(entries, e="<"):
    """Minimal single-IFD TIFF skeleton; entries = [(tag, typ, count,
    value-or-bytes)] with out-of-line data appended after the IFD."""
    header = (b"II*\x00" if e == "<" else b"MM\x00*") + struct.pack(e + "I", 8)
    n = len(entries)
    data_off = 8 + 2 + 12 * n + 4
    body = bytearray()
    tail = bytearray()
    for tag, typ, count, val in entries:
        if isinstance(val, (bytes, bytearray)):
            body += struct.pack(e + "HHII", tag, typ, count, data_off + len(tail))
            tail += val
        elif typ == 3:
            body += struct.pack(e + "HHIHH", tag, typ, count, val, 0)
        else:
            body += struct.pack(e + "HHII", tag, typ, count, val)
    return header + struct.pack(e + "H", n) + bytes(body) + struct.pack(e + "I", 0) + bytes(tail)


def test_golden_palette_image():
    """2x2 palette image: ColorMap SHORTs are 16-bit, decoder scales >>8."""
    pal = [(10, 20, 30), (200, 100, 0), (0, 0, 255), (255, 255, 255)]
    cmap = b"".join(struct.pack("<H", c << 8) for ch in range(3) for c in (
        [p[ch] for p in pal] + [0] * 252
    ))
    idx = bytes([0, 1, 2, 3])
    blob = _ifd([
        (256, 4, 1, 2), (257, 4, 1, 2), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 3), (273, 4, 1, idx), (277, 3, 1, 1), (278, 4, 1, 2),
        (279, 4, 1, len(idx)), (320, 3, 768, cmap),
    ])
    ras, _ = decode_tiff_raw(blob)
    assert ras.tolist() == [[list(pal[0]), list(pal[1])], [list(pal[2]), list(pal[3])]]


def test_golden_bilevel_whiteiszero():
    """8x1 1-bit WhiteIsZero: bits MSB-first; 0 -> white (255)."""
    blob = _ifd([
        (256, 4, 1, 8), (257, 4, 1, 1), (258, 3, 1, 1), (259, 3, 1, 1),
        (262, 3, 1, 0), (273, 4, 1, bytes([0b10110000])), (277, 3, 1, 1),
        (278, 4, 1, 1), (279, 4, 1, 1),
    ])
    ras, _ = decode_tiff_raw(blob)
    exp = [0, 255, 0, 0, 255, 255, 255, 255]
    assert ras[0, :, 0].tolist() == exp
    assert (ras[:, :, 0] == ras[:, :, 2]).all()


def test_golden_4bit_gray_multistrip():
    """4x2 4-bit gray over two 1-row strips: nibbles high-first, x17
    scaling to 8 bits."""
    s0, s1 = bytes([0x0F, 0x28]), bytes([0xA3, 0xC1])
    e = "<"
    header = b"II*\x00" + struct.pack(e + "I", 8)
    entries = [
        (256, 4, 1, 4), (257, 4, 1, 2), (258, 3, 1, 4), (259, 3, 1, 1),
        (262, 3, 1, 1), (273, 4, 2, None), (277, 3, 1, 1), (278, 4, 1, 1),
        (279, 4, 2, None),
    ]
    n = len(entries)
    data_off = 8 + 2 + 12 * n + 4
    # layout: offsets array (8B), counts array (8B), strip0, strip1
    offs = struct.pack(e + "II", data_off + 16, data_off + 18)
    cnts = struct.pack(e + "II", 2, 2)
    body = bytearray()
    for tag, typ, count, _ in entries:
        if tag == 273:
            body += struct.pack(e + "HHII", tag, typ, count, data_off)
        elif tag == 279:
            body += struct.pack(e + "HHII", tag, typ, count, data_off + 8)
        elif typ == 3:
            body += struct.pack(e + "HHIHH", tag, typ, count, entries[[t for t, *_ in entries].index(tag)][3], 0)
        else:
            body += struct.pack(e + "HHII", tag, typ, count, entries[[t for t, *_ in entries].index(tag)][3])
    blob = header + struct.pack(e + "H", n) + bytes(body) + struct.pack(e + "I", 0) + offs + cnts + s0 + s1
    ras, _ = decode_tiff_raw(blob)
    assert ras[:, :, 0].tolist() == [
        [0 * 17, 15 * 17, 2 * 17, 8 * 17],
        [10 * 17, 3 * 17, 12 * 17, 1 * 17],
    ]


# --------------------------------------------------------------------------
# hostile input
# --------------------------------------------------------------------------


def test_rejects_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        decode_tiff_raw(b"ABCD" + b"\x00" * 16)


def test_rejects_dimension_bomb_before_allocation():
    blob = _ifd([
        (256, 4, 1, 1 << 20), (257, 4, 1, 1 << 20), (259, 3, 1, 1),
        (262, 3, 1, 1), (273, 4, 1, 8), (279, 4, 1, 4),
    ])
    with pytest.raises(ValueError, match="implausible"):
        decode_tiff_raw(blob)


def test_rejects_strip_out_of_range():
    blob = _ifd([
        (256, 4, 1, 4), (257, 4, 1, 4), (259, 3, 1, 1), (262, 3, 1, 1),
        (273, 4, 1, 1 << 30), (279, 4, 1, 16),
    ])
    with pytest.raises(ValueError, match="out of range"):
        decode_tiff_raw(blob)


def test_rejects_tiled_layout():
    blob = _ifd([
        (256, 4, 1, 4), (257, 4, 1, 4), (262, 3, 1, 1),
        (273, 4, 1, 8), (279, 4, 1, 16), (322, 4, 1, 16),
    ])
    with pytest.raises(ValueError, match="tiled"):
        decode_tiff_raw(blob)


def test_rejects_short_strip_data():
    px = np.zeros((8, 8, 3), np.uint8)
    blob = bytearray(tiff_encode(px, "none"))
    with pytest.raises(ValueError):
        decode_tiff_raw(bytes(blob[:-40]))


def test_packbits_bounded_and_overruns_raise():
    assert _unpackbits(bytes([2, 1, 2, 3, 254, 9]), 6) == bytes([1, 2, 3, 9, 9, 9])
    with pytest.raises(ValueError):
        _unpackbits(bytes([5, 1]), 6)  # literal overruns input
    with pytest.raises(ValueError):
        _unpackbits(bytes([254, 9]), 6)  # run shorter than expected


def test_lzw_rejects_out_of_range_code():
    # 9-bit code 300 right after Clear(256): not in the initial table
    acc = (256 << 9) | 300
    blob = int.to_bytes(acc << 6, 4, "big")  # pad to byte boundary
    with pytest.raises(ValueError):
        _lzw_decode(blob, 100)


def test_truncated_everywhere_never_hangs():
    px = _rng().integers(0, 256, (12, 12, 3), dtype=np.uint8)
    for comp in COMPS:
        blob = tiff_encode(px, comp)
        for cut in range(0, len(blob), 7):
            try:
                decode_tiff_raw(blob[:cut])
            except ValueError:
                pass


# --------------------------------------------------------------------------
# multimodal dispatch
# --------------------------------------------------------------------------


def test_multimodal_dispatch_decodes_tiff(spark):
    from pincspark.operators.multimodal import decode_image_features

    px = _rng().integers(0, 256, (8, 8, 3), dtype=np.uint8)
    rows = [(1, bytes(tiff_encode(px, "lzw")), "image"),
            (2, bytes(tiff_encode(px, "packbits", byte_order="MM")), "image")]
    df = spark.createDataFrame(rows, "media_id long, content binary, kind string")
    out = {r["media_id"]: r for r in decode_image_features(df, dim=2, strict=True).collect()}
    # the exact-arithmetic contract of _raster_features: sum/3.0/count/255.0
    exp_mean = round(float(px.astype(np.int64).sum()) / 3.0 / 64.0 / 255.0, 9)
    assert out[1]["mean_intensity"] == exp_mean
    assert out[1]["feature"] == out[2]["feature"]  # same raster, two containers
