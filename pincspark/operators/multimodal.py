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

Codecs: seven formats decode FOR REAL with numpy + the stdlib — P6 PPM
(pure-numpy header/raster parse), PNG (stdlib zlib DEFLATE + full
five-filter scanline reconstruction, color types 0/2/3/4/6, 8- and
16-bit, Adam7 interlace), GIF (from-scratch LZW decompressor: dictionary
growth, width sync, CLEAR resets, global/local color tables, 4-pass
interlace), JPEG
(from-scratch: DHT canonical-Huffman entropy decode, dequant, float
IDCT, YCbCr->RGB, restart markers, baseline AND progressive SOF2 with
successive approximation — ``operators/jpeg.py``), PCM WAV (stdlib
``wave``), IMA-ADPCM WAV
(format tag 0x11 — real 4-bit decompression, state machine pinned
bit-for-bit against the stdlib ``audioop`` C implementation), and FLAC
(from-scratch bitstream decoder, ``operators/flac.py``: Rice residuals,
FIXED/LPC prediction, stereo decorrelation, CRC verification) — no
PIL/libsndfile needed.
Lossless WebP also decodes for real (from-scratch VP8L codec,
``operators/webp.py``: both Huffman code classes, color cache, LZ77
backrefs, meta-Huffman, all four transforms).
Formats whose codecs genuinely need external libraries this container
ships without (lossy-VP8 WebP/AVIF/mp3/ogg/video/...): ``strict=True`` raises
NotImplementedError, and the default produces a DETERMINISTIC FAKE decode
(content-hash-seeded stats) so the Spark-side plumbing (schemas, UDF
signatures, batch shapes, explode logic) stays fully real and testable
end-to-end. Plug PIL/torchvision/libsndfile into ``_decode_image_bytes``
/ ``_decode_audio_bytes`` in production.
"""

from __future__ import annotations

import hashlib
import io
import wave
from collections.abc import Iterator

import numpy as np
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
    # doubles, not float32: features are 9-dp-rounded decode outputs and
    # must compare exactly against the SQL oracle (q56)
    T.StructField("feature", T.ArrayType(T.DoubleType()), True),
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


def _decode_ppm_raw(data: bytes) -> tuple[np.ndarray, int]:
    """Pure-numpy P6 (binary PPM) decode -> ((h, w, 3) int64 raster,
    maxval). Handles comments and 1- or 2-byte-per-sample maxval per the
    netpbm spec. Integer samples are returned UNSCALED so downstream
    reductions can sum exactly (integer sums in float64 are exact in any
    fold order — the cross-engine parity contract of q56 rests on it)."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header = magic, width, height, maxval as whitespace-separated tokens
    # (comment lines start with '#'); raster starts after ONE whitespace
    # byte following maxval
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        tokens.append(int(data[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = tokens
    dt = np.dtype(">u2") if maxval > 255 else np.uint8
    n = w * h * 3
    raster = np.frombuffer(data, dtype=dt, count=n, offset=i)
    return raster.reshape(h, w, 3).astype(np.int64), maxval


def _decode_ppm(data: bytes) -> np.ndarray:
    """P6 decode -> (h, w, 3) float array in [0, 1] (scaled view of
    :func:`_decode_ppm_raw`, kept as the float API)."""
    raster, maxval = _decode_ppm_raw(data)
    return raster.astype(np.float64) / float(maxval)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    import zlib

    return (
        len(payload).to_bytes(4, "big")
        + ctype
        + payload
        + (zlib.crc32(ctype + payload) & 0xFFFFFFFF).to_bytes(4, "big")
    )


# Dimension sanity cap shared by the image codecs (64M pixels = a 8192^2
# frame): a crafted header declaring absurd dimensions must reject to the
# undecodable fallback BEFORE any allocation sized by it — a MemoryError
# inside a mapInPandas batch destabilizes the whole Python worker, not
# just the one blob.
_MAX_PIXELS = 1 << 26

# Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass.
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_filter_lines(px: np.ndarray, filter_type: int, bpp: int) -> bytearray:
    """Filter an (h, w, ch) sub-image into PNG scanlines (one filter byte
    + filtered samples per line). The prior row resets per sub-image, as
    Adam7 requires per pass."""
    h = px.shape[0]
    w_samples = px.shape[1] * bpp
    out = bytearray()
    prior = [0] * w_samples
    for y in range(h):
        raw = [int(v) for v in px[y].ravel()]
        out.append(filter_type)
        for x in range(w_samples):
            a = raw[x - bpp] if x >= bpp else 0
            b = prior[x]
            c = prior[x - bpp] if x >= bpp else 0
            if filter_type == 0:
                v = raw[x]
            elif filter_type == 1:
                v = raw[x] - a
            elif filter_type == 2:
                v = raw[x] - b
            elif filter_type == 3:
                v = raw[x] - (a + b) // 2
            elif filter_type == 4:
                v = raw[x] - _paeth(a, b, c)
            else:
                raise ValueError(f"bad filter {filter_type}")
            out.append(v & 0xFF)
        prior = raw
    return out


def png_encode(
    raster: np.ndarray, filter_type: int = 0, interlace: bool = False
) -> bytes:
    """Minimal 8-bit RGB PNG encoder (stdlib zlib): one filter type for all
    scanlines, optional Adam7 interlacing (seven sub-images in pass order,
    filtering restarted per pass). Exists so the decoder can be proven by
    lossless round-trip without PIL — and so q57 can mint real
    DEFLATE-compressed blobs."""
    import zlib

    h, w, _ = raster.shape
    px = raster.astype(np.int64)
    if interlace:
        body = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = px[y0::dy, x0::dx]
            if sub.size:
                body += _png_filter_lines(sub, filter_type, 3)
    else:
        body = _png_filter_lines(px, filter_type, 3)
    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 1 if interlace else 0])
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(body), 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, height: int, stride: int, bpp: int) -> bytearray:
    """Undo PNG scanline filtering for one (sub-)image: ``raw`` holds
    ``height`` lines of 1 filter byte + ``stride`` filtered bytes."""
    if len(raw) < height * (stride + 1):
        raise ValueError("truncated raster")
    recon = bytearray(height * stride)
    prior_off = -stride
    for y in range(height):
        off = y * (stride + 1)
        ft = raw[off]
        line = raw[off + 1 : off + 1 + stride]
        ro = y * stride
        if ft == 0:
            recon[ro : ro + stride] = line
        elif ft == 2 and y > 0:
            p = recon[ro + prior_off : ro]
            recon[ro : ro + stride] = bytes(
                (v + p[x]) & 0xFF for x, v in enumerate(line)
            )
        elif ft == 2:
            recon[ro : ro + stride] = line
        else:
            for x in range(stride):
                a = recon[ro + x - bpp] if x >= bpp else 0
                b = recon[ro + x + prior_off] if y > 0 else 0
                c = recon[ro + x - bpp + prior_off] if (x >= bpp and y > 0) else 0
                if ft == 1:
                    v = line[x] + a
                elif ft == 3:
                    v = line[x] + (a + b) // 2
                elif ft == 4:
                    v = line[x] + _paeth(a, b, c)
                else:
                    raise ValueError(f"bad filter {ft}")
                recon[ro + x] = v & 0xFF
    return recon


def _decode_png_raw(data: bytes) -> tuple[np.ndarray, int]:
    """Pure-stdlib PNG decode -> ((h, w, 3) int64 raster, maxval).

    Real DEFLATE decode (zlib) + full scanline unfiltering (all five PNG
    filter types), supporting color types 0 (gray), 2 (RGB), 3 (palette),
    4 (gray+alpha), 6 (RGBA) at bit depth 8, and 16-bit for the
    non-palette types — both non-interlaced and Adam7-interlaced (seven
    per-pass unfilters scattered onto the output grid by numpy strided
    assignment). Alpha is dropped and gray is replicated so every decode
    lands on the same (h, w, 3) integer-raster contract as the PPM codec
    — the exact-arithmetic feature path is shared verbatim."""
    import zlib

    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    i, n = len(_PNG_SIG), len(data)
    width = height = None
    depth = ctype = interlace = 0
    plte: np.ndarray | None = None
    idat = bytearray()
    while i + 8 <= n:
        clen = int.from_bytes(data[i : i + 4], "big")
        cname = data[i + 4 : i + 8]
        payload = data[i + 8 : i + 8 + clen]
        if len(payload) < clen:
            raise ValueError("truncated chunk")
        if cname == b"IHDR":
            width = int.from_bytes(payload[0:4], "big")
            height = int.from_bytes(payload[4:8], "big")
            depth, ctype, _, _, interlace = payload[8:13]
        elif cname == b"PLTE":
            plte = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif cname == b"IDAT":
            idat.extend(payload)
        elif cname == b"IEND":
            break
        i += 12 + clen
    if not width or not height or not idat:
        raise ValueError("missing IHDR/IDAT")
    if interlace not in (0, 1):
        raise ValueError(f"bad interlace method {interlace}")
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if nch is None or depth not in (8, 16) or (ctype == 3 and depth != 8):
        raise ValueError(f"unsupported color type {ctype}/depth {depth}")
    if width * height > _MAX_PIXELS:
        # dimension sanity: a crafted IHDR can declare 4G x 4G and the
        # raster allocation would take the executor down before any
        # pixel is read — reject (-> fallback) instead
        raise ValueError(f"image dimensions {width}x{height} exceed sanity cap")
    sample_bytes = depth // 8
    bpp = nch * sample_bytes
    stride = width * bpp
    # decompression-bomb guard: DEFLATE expands ~1000x, so inflate at
    # most the exact raster size the header promises (computed per pass
    # for Adam7) instead of whatever the stream holds
    if interlace:
        expected = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw > 0 and ph > 0:
                expected += ph * (pw * bpp + 1)
    else:
        expected = height * (stride + 1)
    raw = zlib.decompressobj().decompress(bytes(idat), expected)
    if interlace:
        # Adam7: seven sequential sub-images, each filtered independently;
        # unfilter each and scatter its pixels onto the (h, w) grid
        target = np.zeros((height, width, bpp), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            sub_stride = pw * bpp
            need = ph * (sub_stride + 1)
            sub = _png_unfilter(raw[off : off + need], ph, sub_stride, bpp)
            off += need
            target[y0::dy, x0::dx] = np.frombuffer(
                bytes(sub), dtype=np.uint8
            ).reshape(ph, pw, bpp)
        recon = target.tobytes()
    else:
        recon = _png_unfilter(raw, height, stride, bpp)
    if depth == 16:
        samples = np.frombuffer(bytes(recon), dtype=">u2").astype(np.int64)
        maxval = 65535
    else:
        samples = np.frombuffer(bytes(recon), dtype=np.uint8).astype(np.int64)
        maxval = 255
    px = samples.reshape(height, width, nch)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette image without PLTE")
        return plte.astype(np.int64)[px[:, :, 0]], 255
    if ctype == 0:
        rgb = np.repeat(px, 3, axis=2)
    elif ctype == 4:
        rgb = np.repeat(px[:, :, :1], 3, axis=2)
    elif ctype == 6:
        rgb = px[:, :, :3]
    else:
        rgb = px
    return rgb, maxval


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """GIF-variant LZW encoder (greedy longest-match, LSB-first packing,
    CLEAR emitted when the table reaches 4096). Exists so the decoder can
    be proven by lossless round-trip through real dictionary growth."""
    clear = 1 << min_code_size
    end = clear + 1
    out_bits: list[tuple[int, int]] = []  # (code, width)

    def reset() -> tuple[dict, int, int]:
        return (
            {(i,): i for i in range(clear)},
            end + 1,
            min_code_size + 1,
        )

    table, next_code, width = reset()
    out_bits.append((clear, width))
    buf: tuple[int, ...] = ()
    for px in indices:
        cand = buf + (px,)
        if cand in table:
            buf = cand
            continue
        out_bits.append((table[buf], width))
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1:
            if width < 12:
                width += 1
            else:
                out_bits.append((clear, 12))
                table, next_code, width = reset()
        buf = (px,)
    if buf:
        out_bits.append((table[buf], width))
    out_bits.append((end, width))
    # pack LSB-first
    acc = n = 0
    payload = bytearray()
    for code, w in out_bits:
        acc |= code << n
        n += w
        while n >= 8:
            payload.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        payload.append(acc & 0xFF)
    return bytes(payload)


def _lzw_decode(payload: bytes, min_code_size: int, n_px: int) -> list[int]:
    """GIF-variant LZW decode of a de-blocked payload -> pixel indices."""
    clear = 1 << min_code_size
    end = clear + 1
    table: list[list[int]] = []
    width = min_code_size + 1
    out: list[int] = []
    acc = n = pos = 0
    prev: list[int] | None = None

    def reset_table() -> None:
        nonlocal table, width, prev
        table = [[i] for i in range(clear)] + [[], []]
        width = min_code_size + 1
        prev = None

    reset_table()
    while len(out) < n_px:
        while n < width:
            if pos >= len(payload):
                raise ValueError("LZW stream truncated")
            acc |= payload[pos] << n
            pos += 1
            n += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        n -= width
        if code == clear:
            reset_table()
            continue
        if code == end:
            break
        if code < len(table) and (code < clear or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + [prev[0]]
        else:
            raise ValueError(f"bad LZW code {code}")
        out.extend(entry)
        if prev is not None:
            table.append(prev + [entry[0]])
        prev = entry
        # width sync: the encoder widens when ITS next_code reaches
        # 2^w + 1; the decoder's table is one entry behind at read time,
        # so the matching moment here is len(table) == 2^w
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < n_px:
        raise ValueError("LZW output short")
    return out[:n_px]


def _gif_interlace_order(h: int) -> list[int]:
    """GIF 4-pass interlace: the stream's row order (every 8th from 0,
    every 8th from 4, every 4th from 2, every 2nd from 1)."""
    return (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )


def gif_encode(
    indices: np.ndarray, palette: np.ndarray, interlace: bool = False
) -> bytes:
    """Minimal GIF87a encoder: one frame, global color table, real LZW,
    optional 4-pass interlacing (rows emitted in pass order)."""
    h, w = indices.shape
    pal = palette.astype(np.uint8)
    assert pal.shape == (256, 3)
    screen = (
        w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
        + bytes([0xF7, 0, 0])  # GCT present, 256 entries
    )
    img_desc = b"\x2c" + b"\x00\x00\x00\x00" + w.to_bytes(2, "little") + h.to_bytes(
        2, "little"
    ) + (b"\x40" if interlace else b"\x00")
    rows = indices[_gif_interlace_order(h)] if interlace else indices
    payload = _lzw_encode([int(v) for v in rows.ravel()], 8)
    blocks = bytearray([8])  # LZW min code size
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        blocks.append(len(chunk))
        blocks.extend(chunk)
    blocks.append(0)
    return b"GIF87a" + screen + pal.tobytes() + img_desc + bytes(blocks) + b"\x3b"


def _decode_gif_raw(data: bytes) -> tuple[np.ndarray, int]:
    """Pure-stdlib GIF decode (first frame) -> ((h, w, 3) int64 raster,
    255): real LZW decompression with dictionary growth and CLEAR-code
    resets, global/local color tables. Interlaced frames
    are un-permuted via the 4-pass row order (round 6: interlace decodes
    for real, like PNG Adam7)."""
    if not (data.startswith(b"GIF87a") or data.startswith(b"GIF89a")):
        raise ValueError("not a GIF")
    gct_flag = data[10] & 0x80
    gct_n = 2 << (data[10] & 0x07)
    i = 13
    gct = None
    if gct_flag:
        gct = np.frombuffer(data[i : i + 3 * gct_n], dtype=np.uint8).reshape(-1, 3)
        i += 3 * gct_n
    while i < len(data):
        b = data[i]
        if b == 0x21:  # extension: label + sub-blocks
            i += 2
            while data[i] != 0:
                i += 1 + data[i]
            i += 1
        elif b == 0x2C:  # image descriptor
            w = int.from_bytes(data[i + 5 : i + 7], "little")
            h = int.from_bytes(data[i + 7 : i + 9], "little")
            if w * h > _MAX_PIXELS:
                raise ValueError(f"frame dimensions {w}x{h} exceed sanity cap")
            packed = data[i + 9]
            i += 10
            pal = gct
            if packed & 0x80:
                lct_n = 2 << (packed & 0x07)
                pal = np.frombuffer(data[i : i + 3 * lct_n], dtype=np.uint8).reshape(
                    -1, 3
                )
                i += 3 * lct_n
            if pal is None:
                raise ValueError("no color table")
            min_code = data[i]
            i += 1
            payload = bytearray()
            while data[i] != 0:
                ln = data[i]
                payload.extend(data[i + 1 : i + 1 + ln])
                i += 1 + ln
            idx = np.array(
                _lzw_decode(bytes(payload), min_code, w * h), dtype=np.int64
            ).reshape(h, w)
            if packed & 0x40:  # 4-pass interlace: un-permute stream rows
                out = np.empty_like(idx)
                out[_gif_interlace_order(h)] = idx
                idx = out
            return pal.astype(np.int64)[idx], 255
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"bad GIF block 0x{b:02x}")
    raise ValueError("no image frame")


def bmp_encode(px: np.ndarray, rle: bool = False) -> bytes:
    """Mint a BMP: (h, w, 3) uint8 -> 24-bit BI_RGB; (h, w) uint8 ->
    8-bit gray-palette BI_RGB, or BI_RLE8 when ``rle``. Bottom-up rows,
    4-byte padded, BITMAPINFOHEADER."""
    import struct

    gray = px.ndim == 2
    h, w = px.shape[:2]
    if w * h > _MAX_PIXELS:
        raise ValueError("BMP encoder: exceeds the decoder pixel cap")
    if gray:
        pal = b"".join(bytes([v, v, v, 0]) for v in range(256))
        if rle:
            body = bytearray()
            for y in range(h - 1, -1, -1):
                row = px[y].astype(np.uint8)
                i = 0
                while i < w:
                    j = i
                    while j + 1 < w and row[j + 1] == row[i] and j - i < 253:
                        j += 1
                    body += bytes([j - i + 1, int(row[i])])
                    i = j + 1
                body += b"\x00\x00"  # end of line
            body[-2:] = b"\x00\x01"  # last EOL becomes end of bitmap
            payload, comp = bytes(body), 1
        else:
            pad = (-w) % 4
            payload = b"".join(
                px[y].astype(np.uint8).tobytes() + b"\x00" * pad
                for y in range(h - 1, -1, -1)
            )
            comp = 0
    else:
        pal = b""
        pad = (-(w * 3)) % 4
        payload = b"".join(
            px[y, :, ::-1].astype(np.uint8).tobytes() + b"\x00" * pad  # BGR
            for y in range(h - 1, -1, -1)
        )
        comp = 0
    bits = 8 if gray else 24
    data_off = 14 + 40 + len(pal)
    header = b"BM" + struct.pack(
        "<IHHI", data_off + len(payload), 0, 0, data_off
    )
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bits, comp, len(payload), 2835, 2835,
        256 if gray else 0, 0,
    )
    return header + dib + pal + payload


def _bmp_rle8(src: bytes, w: int, h: int) -> np.ndarray:
    """BI_RLE8 -> (h, w) index array (bottom-up rows, like the raw path).
    Escapes: 00 00 EOL, 00 01 EOF, 00 02 dx dy delta, 00 n absolute."""
    out = np.zeros((h, w), dtype=np.uint8)
    x = y = 0  # y counts from the BOTTOM row (row h-1-y in image space)
    i = 0
    n = len(src)
    while i + 1 < n:
        c, v = src[i], src[i + 1]
        i += 2
        if c:
            if y >= h:
                raise ValueError("BMP: RLE run past last row")
            run = min(c, w - x)
            out[h - 1 - y, x : x + run] = v
            x += run
        elif v == 0:
            x, y = 0, y + 1
        elif v == 1:
            return out
        elif v == 2:
            if i + 2 > n:
                raise ValueError("BMP: RLE delta truncated")
            x = min(x + src[i], w)
            y += src[i + 1]
            i += 2
        else:
            if i + v > n:
                raise ValueError("BMP: RLE absolute run truncated")
            if y >= h:
                raise ValueError("BMP: RLE run past last row")
            run = min(v, w - x)
            out[h - 1 - y, x : x + run] = np.frombuffer(src[i : i + run], np.uint8)
            x += run
            i += v + (v & 1)  # absolute runs pad to word
    return out


def _decode_bmp_raw(data: bytes) -> tuple[np.ndarray, int]:
    """Baseline BMP decode -> ((h, w, 3) int64, 255): BITMAPINFOHEADER-
    family DIBs, 1/4/8-bit palette and 24/32-bit BI_RGB, BI_RLE8,
    bottom-up and top-down (negative height) rows. Cross-implementation
    gated against the JDK BMP plugin (tests/test_bmp.py)."""
    import struct

    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("BMP: bad magic / truncated header")
    (data_off,) = struct.unpack("<I", data[10:14])
    (dib_size,) = struct.unpack("<I", data[14:18])
    if dib_size < 40 or 14 + dib_size > len(data):
        raise ValueError("BMP: unsupported/truncated DIB header")
    w, h_raw, _planes, bits, comp = struct.unpack("<iiHHI", data[18:34])
    (colors_used,) = struct.unpack("<I", data[46:50])
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        raise ValueError("BMP: implausible dimensions")
    if data_off > len(data):
        raise ValueError("BMP: data offset out of range")
    body = data[data_off:]

    if bits in (1, 4, 8):
        n_pal = colors_used or (1 << bits)
        pal_off = 14 + dib_size
        pal_raw = data[pal_off : pal_off + 4 * n_pal]
        if len(pal_raw) < 4 * n_pal:
            raise ValueError("BMP: truncated palette")
        pal = np.frombuffer(pal_raw, np.uint8).reshape(n_pal, 4)[:, [2, 1, 0]]
        pal = np.vstack([pal, np.zeros((256 - n_pal, 3), np.uint8)]) if n_pal < 256 else pal
        if comp == 1:
            if bits != 8 or top_down:
                raise ValueError("BMP: RLE8 requires 8-bit bottom-up")
            idx = _bmp_rle8(body, w, h)
        elif comp == 0:
            stride = ((w * bits + 31) // 32) * 4
            if len(body) < stride * h:
                raise ValueError("BMP: pixel data truncated")
            rows = np.frombuffer(body[: stride * h], np.uint8).reshape(h, stride)
            if bits == 8:
                idx = rows[:, :w]
            elif bits == 4:
                hi, lo = rows >> 4, rows & 0x0F
                both = np.empty((h, stride * 2), np.uint8)
                both[:, 0::2], both[:, 1::2] = hi, lo
                idx = both[:, :w]
            else:
                idx = np.unpackbits(rows, axis=1)[:, :w]
            if not top_down:
                idx = idx[::-1]
        else:
            raise ValueError(f"BMP: unsupported compression {comp}")
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("BMP: palette index out of range")
        return pal.astype(np.int64)[idx], 255

    if bits in (24, 32):
        if comp != 0:
            raise ValueError(f"BMP: unsupported compression {comp} at {bits}bpp")
        bypp = bits // 8
        stride = ((w * bits + 31) // 32) * 4
        if len(body) < stride * h:
            raise ValueError("BMP: pixel data truncated")
        rows = np.frombuffer(body[: stride * h], np.uint8).reshape(h, stride)
        px = rows[:, : w * bypp].reshape(h, w, bypp)[:, :, :3][:, :, ::-1]  # BGR(X)->RGB
        if not top_down:
            px = px[::-1]
        return px.astype(np.int64), 255
    raise ValueError(f"BMP: unsupported bit depth {bits}")


def _decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """stdlib PCM WAV decode -> (mono float samples in [-1, 1], rate)."""
    with wave.open(io.BytesIO(data), "rb") as wf:
        rate = wf.getframerate()
        nch = wf.getnchannels()
        width = wf.getsampwidth()
        raw = wf.readframes(wf.getnframes())
    if width == 1:  # 8-bit WAV is unsigned
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM width {width}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, rate


_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41,
    45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190,
    209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724,
    796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272,
    2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132,
    7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500,
    20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_decode_core(
    nibbles: list[int], pred: int, index: int
) -> tuple[list[int], int, int]:
    """The DVI/IMA ADPCM state machine: one int16 sample per 4-bit code.
    Bit-identical to the stdlib ``audioop.adpcm2lin`` C implementation
    (asserted in tests) — the independent reference for this decoder."""
    out: list[int] = []
    for nib in nibbles:
        step = _IMA_STEPS[index]
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        if nib & 8:
            pred -= diff
        else:
            pred += diff
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + _IMA_INDEX[nib & 7]))
        out.append(pred)
    return out, pred, index


def _ima_encode_core(
    samples: list[int], pred: int = 0, index: int = 0
) -> tuple[list[int], int, int]:
    """IMA ADPCM encoder (the standard quantize-against-decoder-state
    loop); exists so the WAV-IMA decoder has real compressed input to
    round-trip in tests."""
    nibbles: list[int] = []
    for s in samples:
        step = _IMA_STEPS[index]
        delta = s - pred
        nib = 0
        if delta < 0:
            nib = 8
            delta = -delta
        if delta >= step:
            nib |= 4
            delta -= step
        if delta >= step >> 1:
            nib |= 2
            delta -= step >> 1
        if delta >= step >> 2:
            nib |= 1
        # advance the shared decoder state
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        pred = pred - diff if nib & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + _IMA_INDEX[nib & 7]))
        nibbles.append(nib)
    return nibbles, pred, index


def _riff_chunks(data: bytes) -> dict[bytes, bytes]:
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE")
    out: dict[bytes, bytes] = {}
    i = 12
    while i + 8 <= len(data):
        cid = data[i : i + 4]
        ln = int.from_bytes(data[i + 4 : i + 8], "little")
        out.setdefault(cid, data[i + 8 : i + 8 + ln])
        i += 8 + ln + (ln & 1)
    return out


def wav_ima_encode(samples: np.ndarray, rate: int, block_samples: int = 505) -> bytes:
    """Mono WAV container with REAL IMA-ADPCM compression (format tag
    0x11): per-block 4-byte state header (the header predictor IS the
    block's first output sample) + low-nibble-first code bytes."""
    x = samples.astype(np.int64).tolist()
    block_align = 4 + (block_samples - 1 + 7) // 8 * 4
    blocks = bytearray()
    n_blocks = 0
    for start in range(0, len(x), block_samples):
        chunk = x[start : start + block_samples]
        pred, index = int(chunk[0]), 0
        blocks += int(pred & 0xFFFF).to_bytes(2, "little") + bytes([index, 0])
        nibs, _, _ = _ima_encode_core(chunk[1:], pred, index)
        nibs += [0] * ((block_align - 4) * 2 - len(nibs))
        for j in range(0, len(nibs), 2):
            blocks.append((nibs[j] & 0x0F) | ((nibs[j + 1] & 0x0F) << 4))
        n_blocks += 1
    fmt = (
        (17).to_bytes(2, "little")
        + (1).to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * block_align // block_samples).to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + (4).to_bytes(2, "little")
        + (2).to_bytes(2, "little")
        + block_samples.to_bytes(2, "little")
    )
    body = (
        b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"fact" + (4).to_bytes(4, "little") + len(x).to_bytes(4, "little")
        + b"data" + len(blocks).to_bytes(4, "little") + bytes(blocks)
    )
    return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body


def _decode_wav_ima(data: bytes) -> tuple[np.ndarray, int]:
    """WAV IMA-ADPCM (format tag 0x11) decode -> (mono float samples in
    [-1, 1], rate). Real 4-bit decompression via the audioop-verified
    state machine; mono and stereo (4-byte channel-interleaved groups)."""
    ch = _riff_chunks(data)
    fmt, raw = ch.get(b"fmt "), ch.get(b"data")
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    tag = int.from_bytes(fmt[0:2], "little")
    if tag != 17:
        raise ValueError(f"not IMA ADPCM (tag {tag})")
    nch = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    block_align = int.from_bytes(fmt[12:14], "little")
    if nch not in (1, 2) or block_align < 4 * nch:
        raise ValueError("bad IMA layout")
    # trailing nibbles in the last 4-byte group are PADDING: the true
    # per-block sample count comes from the fmt extension
    spb = (
        int.from_bytes(fmt[18:20], "little")
        if len(fmt) >= 20
        else 1 + (block_align - 4 * nch) * 2 // nch
    )
    chans: list[list[int]] = [[] for _ in range(nch)]
    for off in range(0, len(raw) - (len(raw) % block_align), block_align):
        block = raw[off : off + block_align]
        base = len(chans[0])
        preds, idxs = [], []
        for c in range(nch):
            pred = int.from_bytes(block[c * 4 : c * 4 + 2], "little", signed=True)
            index = min(88, block[c * 4 + 2])
            chans[c].append(pred)
            preds.append(pred)
            idxs.append(index)
        pos = 4 * nch
        while pos + 4 * nch <= len(block):
            for c in range(nch):
                grp = block[pos + c * 4 : pos + c * 4 + 4]
                nibs = []
                for b in grp:
                    nibs.append(b & 0x0F)
                    nibs.append(b >> 4)
                out, preds[c], idxs[c] = _ima_decode_core(nibs, preds[c], idxs[c])
                chans[c].extend(out)
            pos += 4 * nch
        for c in range(nch):
            del chans[c][base + spb :]
    x = np.array(chans, dtype=np.float64) / 32768.0
    mono = x.mean(axis=0)
    if b"fact" in ch and len(ch[b"fact"]) >= 4:
        total = int.from_bytes(ch[b"fact"][0:4], "little")
        mono = mono[:total]
    return mono, rate


def _g711_ulaw_table() -> np.ndarray:
    """u-law byte -> int16, built from the G.711 expansion formula
    (sign/exponent/mantissa with the 0x84 bias); bit-identical to the
    stdlib ``audioop.ulaw2lin`` C tables (asserted in tests — the
    independent reference)."""
    out = np.empty(256, dtype=np.int16)
    for u in range(256):
        c = ~u & 0xFF
        exp = (c >> 4) & 7
        mant = c & 0x0F
        mag = (((mant << 3) + 0x84) << exp) - 0x84
        out[u] = -mag if c & 0x80 else mag
    return out


def _g711_alaw_table() -> np.ndarray:
    """A-law byte -> int16 (G.711: XOR 0x55, chord/step expansion)."""
    out = np.empty(256, dtype=np.int16)
    for a in range(256):
        c = a ^ 0x55
        exp = (c >> 4) & 7
        mant = c & 0x0F
        if exp == 0:
            mag = (mant << 4) + 8
        else:
            mag = ((mant << 4) + 0x108) << (exp - 1)
        # A-law sign bit SET means positive (opposite of u-law)
        out[a] = mag if c & 0x80 else -mag
    return out


_ULAW = _g711_ulaw_table()
_ALAW = _g711_alaw_table()


def _decode_wav_g711(data: bytes) -> tuple[np.ndarray, int]:
    """WAV with G.711 payload (format tag 6 = A-law, 7 = u-law) -> mono
    float samples; the stdlib ``wave`` module only reads PCM, so this
    walks the RIFF chunks directly like the IMA path."""
    import struct

    ch = _riff_chunks(data)
    fmt, raw = ch.get(b"fmt "), ch.get(b"data")
    if fmt is None or raw is None or len(fmt) < 16:
        raise ValueError("WAV: missing fmt/data chunk")
    tag, nch, rate = struct.unpack("<HHI", fmt[:8])
    if tag == 6:
        x = _ALAW[np.frombuffer(raw, np.uint8)].astype(np.float64) / 32768.0
    elif tag == 7:
        x = _ULAW[np.frombuffer(raw, np.uint8)].astype(np.float64) / 32768.0
    else:
        raise ValueError(f"WAV: not a G.711 stream (tag {tag})")
    if nch > 1:
        x = x[: len(x) - len(x) % nch].reshape(-1, nch).mean(axis=1)
    return x, rate


def au_encode(samples: np.ndarray, rate: int, encoding: int = 3) -> bytes:
    """Mint a Sun AU file: encoding 1 (u-law), 3 (int16 BE), 27 (A-law).
    G.711 compression uses the inverse of the decode tables (nearest
    match by table lookup — exact for values that round-trip)."""
    import struct

    s = np.asarray(samples, dtype=np.int16)
    if encoding == 3:
        payload = s.astype(">i2").tobytes()
    elif encoding in (1, 27):
        table = _ULAW if encoding == 1 else _ALAW
        order = np.argsort(table)
        pos = np.searchsorted(table[order], s)
        pos = np.clip(pos, 0, 255)
        left = np.clip(pos - 1, 0, 255)
        pick = np.where(
            np.abs(table[order[left]].astype(np.int32) - s)
            <= np.abs(table[order[pos]].astype(np.int32) - s),
            left,
            pos,
        )
        payload = order[pick].astype(np.uint8).tobytes()
    else:
        raise ValueError(f"AU encoder: unsupported encoding {encoding}")
    hdr = struct.pack(">4sIIIII", b".snd", 24, len(payload), encoding, rate, 1)
    return hdr + payload


def _decode_au(data: bytes) -> tuple[np.ndarray, int]:
    """Sun AU ('.snd' magic, big-endian header): u-law (1), int8 (2),
    int16 BE (3), A-law (27) -> mono float samples."""
    import struct

    if len(data) < 24:
        raise ValueError("AU: truncated header")
    magic, off, size, enc, rate, nch = struct.unpack(">4sIIIII", data[:24])
    if magic != b".snd":
        raise ValueError("AU: bad magic")
    if off < 24 or off > len(data) or rate <= 0 or nch < 1:
        raise ValueError("AU: bad header fields")
    raw = data[off : off + size] if size != 0xFFFFFFFF else data[off:]
    if enc == 1:
        x = _ULAW[np.frombuffer(raw, np.uint8)].astype(np.float64) / 32768.0
    elif enc == 2:
        x = np.frombuffer(raw, np.int8).astype(np.float64) / 128.0
    elif enc == 3:
        x = np.frombuffer(raw[: len(raw) - len(raw) % 2], ">i2").astype(np.float64) / 32768.0
    elif enc == 27:
        x = _ALAW[np.frombuffer(raw, np.uint8)].astype(np.float64) / 32768.0
    else:
        raise ValueError(f"AU: unsupported encoding {enc}")
    if nch > 1:
        x = x[: len(x) - len(x) % nch].reshape(-1, nch).mean(axis=1)
    return x, rate


def _grid_means(plane: np.ndarray, gh: int, gw: int) -> np.ndarray:
    """Block-average a 2D plane onto a (gh, gw) grid (the resize step):
    rows/cols are binned by integer linspace edges, so any input size maps
    deterministically onto the fixed grid."""
    h, w = plane.shape
    re = np.linspace(0, h, gh + 1).astype(int)
    ce = np.linspace(0, w, gw + 1).astype(int)
    rows = np.add.reduceat(plane, re[:-1], axis=0) / np.maximum(np.diff(re), 1)[:, None]
    cells = np.add.reduceat(rows, ce[:-1], axis=1) / np.maximum(np.diff(ce), 1)[None, :]
    return cells


def _grid_sums(plane: np.ndarray, gh: int, gw: int) -> tuple[np.ndarray, np.ndarray]:
    """Integer block SUMS of a 2D int plane onto a (gh, gw) grid plus the
    per-cell pixel counts. Sums of integers are exact in float64 whatever
    the reduction order, so the caller can apply divisions in a fixed
    sequence that matches the SQL oracle bit-for-bit (ADVICE r4 #3 — the
    float `_grid_means` path folded in numpy's pairwise order, leaving
    ulp-level disagreement with DuckDB's sequential fold that only the
    9-dp round was absorbing)."""
    h, w = plane.shape
    re = np.linspace(0, h, gh + 1).astype(int)
    ce = np.linspace(0, w, gw + 1).astype(int)
    rows = np.add.reduceat(plane, re[:-1], axis=0)
    sums = np.add.reduceat(rows, ce[:-1], axis=1)
    counts = np.maximum(np.diff(re), 1)[:, None] * np.maximum(np.diff(ce), 1)[None, :]
    return sums, counts


def _grid_shape(dim: int) -> tuple[int, int]:
    """(gh, gw) with gh * gw == dim, gh the largest divisor <= sqrt(dim)."""
    gh = max(d for d in range(1, int(dim**0.5) + 1) if dim % d == 0)
    return gh, dim // gh


def _raster_features(
    raster: np.ndarray, maxval: int, dim: int
) -> tuple[float, list[float]]:
    """(mean_intensity, grid feature) from an (h, w, 3) INTEGER raster.

    Exact-arithmetic contract (q56/q57 oracle parity): sum raw integer
    samples (integer sums in float64 are exact in any fold order), then
    divide in the FIXED sequence / 3.0 / count / maxval — identical IEEE
    ops to the oracle's (b1+b2+...)/3.0/16.0/255.0, no fold-order ulps."""
    pix = raster.sum(axis=2)  # per-pixel r+g+b, exact ints
    gh, gw = _grid_shape(dim)
    sums, counts = _grid_sums(pix, gh, gw)
    feats = [
        round(float(s) / 3.0 / float(c) / float(maxval), 9)
        for s, c in zip(sums.ravel(), counts.ravel())
    ]
    mean = round(float(pix.sum()) / 3.0 / float(pix.size) / float(maxval), 9)
    return mean, feats


def _decode_image_raster(data: bytes) -> tuple[np.ndarray, int] | None:
    """Raw container dispatch: ((h, w, 3) int64 raster, maxval) for
    formats decodable WITHOUT codec libraries — P6 PPM (pure numpy), PNG
    (stdlib zlib + unfilter), GIF (from-scratch LZW), JPEG (from-scratch
    Huffman + IDCT, `operators/jpeg.py`), lossless WebP (from-scratch
    VP8L, `operators/webp.py`), baseline TIFF (from-scratch IFD +
    PackBits/TIFF-LZW/Deflate, `operators/tiff.py`), and BMP; None when a
    real codec library would be needed (lossy VP8/VP8X WebP, AVIF, ...)
    or the blob is corrupt (must-not-kill-the-job policy). Shared by the
    feature extractor below and the perceptual-hash kernel
    (`operators/image_hash.py`)."""
    if data.startswith(b"P6"):
        decode = _decode_ppm_raw
    elif data.startswith(_PNG_SIG):
        decode = _decode_png_raw
    elif data.startswith(b"GIF87a") or data.startswith(b"GIF89a"):
        decode = _decode_gif_raw
    elif data.startswith(b"\xff\xd8"):
        from pincspark.operators.jpeg import decode_jpeg_raw

        decode = decode_jpeg_raw
    elif data.startswith(b"RIFF") and data[8:12] == b"WEBP":
        from pincspark.operators.webp import decode_webp_raw

        decode = decode_webp_raw
    elif data.startswith(b"II*\x00") or data.startswith(b"MM\x00*"):
        from pincspark.operators.tiff import decode_tiff_raw

        decode = decode_tiff_raw
    elif data.startswith(b"BM"):
        decode = _decode_bmp_raw
    else:
        return None
    try:
        return decode(data)  # (h, w, 3) int64
    except Exception:
        # truncated raster / malformed chunk / bad filter: a corrupt blob
        # must not kill a 100-TB job — treat as undecodable (strict
        # raises, default falls back to the deterministic fake)
        return None


def _decode_image_bytes(data: bytes, dim: int) -> tuple[float, list[float]] | None:
    """(mean_intensity, grid feature) from `_decode_image_raster`:
    luminance block-averaged onto a fixed (gh, gw) grid — the
    deterministic resize step — flattened row-major."""
    decoded = _decode_image_raster(data)
    if decoded is None:
        return None
    raster, maxval = decoded
    return _raster_features(raster, maxval, dim)


def _decode_audio_samples(data: bytes) -> tuple[np.ndarray, int] | None:
    """Raw container dispatch: (integer sample array, rate) for PCM WAV
    ('RIFF' magic, stdlib wave), IMA-ADPCM WAV, G.711 u-law/A-law WAV
    (format tags 7/6, audioop-pinned tables), Sun AU ('.snd' magic:
    u-law/A-law/linear), and FLAC ('fLaC' magic, from-scratch decoder in
    `operators/flac.py`); None for formats needing codec libs
    (mp3/ogg/...) or corrupt blobs (must-not-kill-the-job policy).
    Shared by the feature extractor below and the audio contour-hash
    kernel (`operators/audio_hash.py`)."""
    if data.startswith(b"fLaC"):
        from pincspark.operators.flac import decode_flac_audio

        try:
            x, rate = decode_flac_audio(data)
        except Exception:
            return None  # corrupt stream: must-not-kill-the-job policy
    elif data.startswith(b".snd"):
        try:
            x, rate = _decode_au(data)  # Sun AU: u-law/A-law/linear PCM
        except Exception:
            return None
    elif not data.startswith(b"RIFF"):
        return None
    else:
        try:
            x, rate = _decode_wav(data)
        except Exception:
            try:
                x, rate = _decode_wav_ima(data)  # compressed: IMA ADPCM (0x11)
            except Exception:
                try:
                    x, rate = _decode_wav_g711(data)  # A-law (6) / u-law (7)
                except Exception:
                    return None  # corrupt container: same policy
    if rate <= 0:
        # a corrupt header can declare framerate 0 while carrying frames;
        # dividing by it below would kill the mapInPandas task (ADVICE r4)
        return None
    return x, rate


def _decode_audio_bytes(data: bytes, dim: int) -> tuple[float, int, int, list[float]] | None:
    """(rms, sample_rate, duration_ms, band-RMS feature) from
    `_decode_audio_samples`: banded RMS over integer linspace edges."""
    decoded = _decode_audio_samples(data)
    if decoded is None:
        return None
    x, rate = decoded
    if len(x) == 0:
        return 0.0, rate, 0, [0.0] * dim
    edges = np.linspace(0, len(x), dim + 1).astype(int)
    sq = x * x
    sums = np.add.reduceat(sq, edges[:-1])
    counts = np.maximum(np.diff(edges), 1)
    feats = [round(float(v), 9) for v in np.sqrt(sums / counts)]
    rms = round(float(np.sqrt(sq.mean())), 9)
    return rms, rate, int(round(len(x) * 1000.0 / rate)), feats


def decode_image_features(
    df: DataFrame,
    dim: int = 32,
    strict: bool = False,
) -> DataFrame:
    """Image decode + resize + feature extraction as a mapInPandas stage.

    PPM, PNG, GIF, JPEG (baseline + progressive), and lossless WebP
    (VP8L) decode FOR REAL (pure numpy/stdlib codecs — see the module
    docstring); luminance is block-average resized onto a fixed grid.
    Formats still needing external codec libraries (lossy-VP8 WebP,
    AVIF, ...): strict=True raises
    NotImplementedError; the default produces deterministic fake features
    so the pipeline shape stays real either way.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for row in pdf.itertuples(index=False):
                data = bytes(row.content) if row.content is not None else b""
                real = _decode_image_bytes(data, dim)
                if real is not None:
                    mean, feats = real
                elif strict:
                    raise NotImplementedError(
                        "no codec for this image format in this environment; "
                        "plug PIL/torchvision into _decode_image_bytes"
                    )
                else:
                    feats = _hash_floats(data, dim)
                    mean = round(sum(feats) / len(feats), 9)
                rows.append((int(row.media_id), len(data), mean, feats))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_bytes", "mean_intensity", "feature"]
            )

    imgs = df.filter(F.col("kind") == "image").select("media_id", "content")
    return imgs.mapInPandas(_batches, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.IntegerType(), True),
    T.StructField("rms", T.DoubleType(), True),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
    T.StructField("feature", T.ArrayType(T.DoubleType()), True),
])


def decode_audio_features(
    df: DataFrame,
    dim: int = 16,
    strict: bool = False,
) -> DataFrame:
    """Audio decode + feature extraction as a mapInPandas stage: PCM WAV,
    IMA-ADPCM WAV, G.711 u-law/A-law WAV, Sun AU, and FLAC decode FOR
    REAL (stdlib ``wave``, the audioop-pinned ADPCM state machine and
    G.711 tables, and the from-scratch FLAC bitstream decoder;
    mono-mixed float samples -> overall RMS + per-band RMS over ``dim``
    equal time slices). Other formats (mp3/ogg/...):
    NotImplementedError under strict, deterministic fake otherwise — same
    contract as decode_image_features."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for row in pdf.itertuples(index=False):
                data = bytes(row.content) if row.content is not None else b""
                real = _decode_audio_bytes(data, dim)
                if real is not None:
                    rms, rate, dur, feats = real
                elif strict:
                    raise NotImplementedError(
                        "no codec for this audio format in this environment; "
                        "plug libsndfile/ffmpeg into _decode_audio_bytes"
                    )
                else:
                    feats = _hash_floats(data, dim, salt=b"audio")
                    rms = round(sum(feats) / len(feats), 9)
                    rate, dur = 0, 0
                rows.append((int(row.media_id), len(data), rms, rate, dur, feats))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_bytes", "rms", "sample_rate", "duration_ms", "feature",
                ],
            )

    auds = df.filter(F.col("kind") == "audio").select("media_id", "content")
    return auds.mapInPandas(_batches, AUDIO_FEATURES_SCHEMA)


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
