"""From-scratch baseline TIFF codec (decode + minting encoder).

TIFF rounds out the document-corpus image tier (scans, faxes, and print
pipelines still emit it) next to PPM/PNG/GIF/JPEG/WebP. Unlike MP3/Vorbis
— whose spec-frozen Huffman/band tables are large memorized data with no
in-environment validation path — every TIFF compression here is purely
algorithmic (PackBits RLE, LZW with the TIFF early-change rule, zlib
Deflate, horizontal-differencing predictor), and the JDK's independent
TIFF plugin (javax.imageio, JDK 9+) lives in the Spark JVM, so
cross-implementation known-answer vectors gate every decision the spec
leaves easy to misread (tests/test_codec_cross_impl.py pattern).

Decode coverage (TIFF 6.0 baseline, first IFD):
- byte orders ``II``/``MM`` (classic TIFF, magic 42)
- Compression 1 (none), 5 (LZW), 8/32946 (Deflate), 32773 (PackBits)
- Photometric 0 (WhiteIsZero), 1 (BlackIsZero), 2 (RGB), 3 (Palette)
- BitsPerSample 1/4/8 for gray/palette, 8 per sample for RGB(+extra
  samples ignored, e.g. alpha)
- Predictor 1 (none), 2 (horizontal differencing, 8-bit samples)
- PlanarConfiguration 1 (chunky); strips via RowsPerStrip (tiles are
  out of baseline and rejected)

Hostile-input posture mirrors the sibling codecs: the shared 64M-pixel
dimension cap rejects bombs before allocation, every decompressor is
bounded by the strip's expected output size, and malformed structures
raise ValueError (the mapInPandas stage maps that to fake/strict
handling). Reference behavior cited for parity: the reference repo has
no media tier at all — this tier exists for the 100-TB training-data
pipeline story (multimodal columns), not reference parity.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# tag ids (TIFF 6.0)
_T_WIDTH = 256
_T_LENGTH = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SAMPLES = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_PLANAR = 284
_T_PREDICTOR = 317
_T_COLORMAP = 320
_T_TILE_WIDTH = 322

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}


def _read_ifd(data: bytes, e: str) -> dict[int, list[int]]:
    """First IFD as {tag: [values...]} (integer types only; others kept
    as raw offsets are not needed by baseline decode)."""
    if len(data) < 8:
        raise ValueError("TIFF: truncated header")
    (ifd_off,) = struct.unpack(e + "I", data[4:8])
    if ifd_off + 2 > len(data):
        raise ValueError("TIFF: IFD offset out of range")
    (n_entries,) = struct.unpack(e + "H", data[ifd_off : ifd_off + 2])
    tags: dict[int, list[int]] = {}
    base = ifd_off + 2
    if base + 12 * n_entries > len(data):
        raise ValueError("TIFF: truncated IFD")
    for i in range(n_entries):
        off = base + 12 * i
        tag, typ, count = struct.unpack(e + "HHI", data[off : off + 8])
        size = _TYPE_SIZES.get(typ)
        if size is None or typ not in (1, 3, 4):
            continue  # baseline decode needs only BYTE/SHORT/LONG tags
        total = size * count
        if total <= 4:
            raw = data[off + 8 : off + 8 + total]
        else:
            (voff,) = struct.unpack(e + "I", data[off + 8 : off + 12])
            if voff + total > len(data):
                raise ValueError("TIFF: tag value out of range")
            raw = data[voff : voff + total]
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        tags[tag] = list(struct.unpack(e + fmt * count, raw))
    return tags


def _unpackbits(src: bytes, expect: int) -> bytes:
    """PackBits RLE; output bounded by ``expect`` bytes."""
    out = bytearray()
    i = 0
    while i < len(src) and len(out) < expect:
        n = src[i]
        i += 1
        if n < 128:
            if i + n + 1 > len(src):
                raise ValueError("TIFF: PackBits literal overruns input")
            out += src[i : i + n + 1]
            i += n + 1
        elif n > 128:
            if i >= len(src):
                raise ValueError("TIFF: PackBits run overruns input")
            out += bytes([src[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expect:
        raise ValueError("TIFF: PackBits output short of strip size")
    return bytes(out[:expect])


def _lzw_decode(src: bytes, expect: int) -> bytes:
    """TIFF-flavor LZW: MSB-first bit packing, 9->12 bit codes with the
    TIFF EARLY code-width change (the width bumps one code earlier than
    GIF: when the next free slot reaches 2^bits - 1), Clear=256, EOI=257.
    Output bounded by ``expect``."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def _reset() -> None:
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    _reset()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in src:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == CLEAR:
                _reset()
                prev = None
                continue
            if code == EOI:
                if len(out) < expect:
                    raise ValueError("TIFF: LZW ended short of strip size")
                return bytes(out[:expect])
            if prev is None:
                if code >= len(table):
                    raise ValueError("TIFF: LZW first code out of range")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("TIFF: LZW code out of range")
            out += entry
            if len(out) >= expect:
                # strip complete — remaining bits are the writer's EOI and
                # byte padding, not necessarily aligned to our width (the
                # JDK emits them after a width boundary we'd misread)
                return bytes(out[:expect])
            prev = entry
            # TIFF early change, decoder side: widen when the next free
            # slot reaches 2^width - 1 (one code EARLIER than the value
            # range requires — the famous TIFF off-by-one; cross-checked
            # against the JDK TIFF plugin in
            # tests/test_codec_cross_impl.py)
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
    if len(out) < expect:
        raise ValueError("TIFF: LZW input exhausted short of strip size")
    return bytes(out[:expect])


def _decompress_strip(comp: int, src: bytes, expect: int) -> bytes:
    if comp == 1:
        if len(src) < expect:
            raise ValueError("TIFF: uncompressed strip short")
        return src[:expect]
    if comp == 32773:
        return _unpackbits(src, expect)
    if comp == 5:
        return _lzw_decode(src, expect)
    if comp in (8, 32946):
        d = zlib.decompressobj()
        out = d.decompress(src, expect)  # bounded: no bomb past expect
        if len(out) < expect:
            raise ValueError("TIFF: deflate strip short")
        return out
    raise ValueError(f"TIFF: unsupported compression {comp}")


def decode_tiff_raw(data: bytes) -> tuple[np.ndarray, int]:
    """Decode the first IFD to ((h, w, 3) int64 raster, maxval=255)."""
    from pincspark.operators.multimodal import _MAX_PIXELS

    if data[:4] == b"II*\x00":
        e = "<"
    elif data[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("TIFF: bad magic")
    tags = _read_ifd(data, e)
    if _T_TILE_WIDTH in tags:
        raise ValueError("TIFF: tiled layout is out of baseline")
    try:
        w = tags[_T_WIDTH][0]
        h = tags[_T_LENGTH][0]
        offsets = tags[_T_STRIP_OFFSETS]
        counts = tags[_T_STRIP_COUNTS]
    except KeyError as exc:
        raise ValueError(f"TIFF: missing required tag {exc}") from None
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        raise ValueError("TIFF: implausible dimensions")
    if len(offsets) != len(counts) or not offsets:
        raise ValueError("TIFF: strip table mismatch")
    comp = tags.get(_T_COMPRESSION, [1])[0]
    photo = tags.get(_T_PHOTOMETRIC, [1])[0]
    spp = tags.get(_T_SAMPLES, [1])[0]
    bits_l = tags.get(_T_BITS, [1] * spp)
    rps = tags.get(_T_ROWS_PER_STRIP, [h])[0] or h
    planar = tags.get(_T_PLANAR, [1])[0]
    predictor = tags.get(_T_PREDICTOR, [1])[0]
    if planar != 1:
        raise ValueError("TIFF: planar configuration 2 unsupported")
    if predictor not in (1, 2):
        raise ValueError(f"TIFF: unsupported predictor {predictor}")
    # Predictor 2 is defined for the LZW and Deflate codec layers only
    # (TIFF 6.0 §14, TTN2); both the JDK plugin and libtiff ignore the tag
    # for other compressions — match them.
    if comp not in (5, 8, 32946):
        predictor = 1
    if photo in (0, 1, 3):
        nch = 1
        bits = bits_l[0]
        if bits not in (1, 4, 8):
            raise ValueError(f"TIFF: unsupported gray/palette depth {bits}")
    elif photo == 2:
        nch = spp
        if spp < 3 or any(b != 8 for b in bits_l[:3]):
            raise ValueError("TIFF: RGB must be >=3 samples of 8 bits")
        bits = 8
    else:
        raise ValueError(f"TIFF: unsupported photometric {photo}")
    if predictor == 2 and bits != 8:
        raise ValueError("TIFF: predictor 2 requires 8-bit samples")

    row_bytes = (w * nch * bits + 7) // 8
    raw = bytearray()
    row0 = 0
    for off, cnt in zip(offsets, counts):
        if off + cnt > len(data):
            raise ValueError("TIFF: strip out of range")
        nrows = min(rps, h - row0)
        if nrows <= 0:
            break
        strip = _decompress_strip(comp, data[off : off + cnt], row_bytes * nrows)
        if predictor == 2:
            arr = np.frombuffer(strip, np.uint8).reshape(nrows, w, nch)
            strip = np.cumsum(arr, axis=1, dtype=np.uint8).tobytes()
        raw += strip
        row0 += nrows
    if row0 < h:
        raise ValueError("TIFF: strips cover fewer rows than ImageLength")

    if bits == 8:
        px = np.frombuffer(bytes(raw), np.uint8).reshape(h, row_bytes)[:, : w * nch].reshape(h, w, nch)
    else:
        rows = np.frombuffer(bytes(raw), np.uint8).reshape(h, row_bytes)
        if bits == 1:
            expanded = np.unpackbits(rows, axis=1)[:, :w]
        else:  # 4
            hi = rows >> 4
            lo = rows & 0x0F
            expanded = np.empty((h, row_bytes * 2), np.uint8)
            expanded[:, 0::2] = hi
            expanded[:, 1::2] = lo
            expanded = expanded[:, :w]
        px = expanded.reshape(h, w, 1)

    if photo == 2:
        out = px[:, :, :3].astype(np.int64)
    elif photo == 3:
        cmap = tags.get(_T_COLORMAP)
        n = 1 << bits
        if not cmap or len(cmap) < 3 * n:
            raise ValueError("TIFF: palette image missing ColorMap")
        pal = (np.array(cmap[: 3 * n], np.int64).reshape(3, n) >> 8).T  # 16->8 bit
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= n:
            raise ValueError("TIFF: palette index out of range")
        out = pal[idx]
    else:
        g = px[:, :, 0].astype(np.int64)
        scale = {1: 255, 4: 17, 8: 1}[bits]
        g = g * scale
        if photo == 0:
            g = 255 - g
        out = np.repeat(g[:, :, None], 3, axis=2)
    return out, 255


# ---------------------------------------------------------------------------
# minting encoder (round-trip + oracle-query vectors)
# ---------------------------------------------------------------------------


def _packbits(row: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        # find run length at i
        j = i
        while j + 1 < n and row[j + 1] == row[i] and j - i < 126:
            j += 1
        run = j - i + 1
        if run >= 2:
            out += bytes([257 - run, row[i]])
            i = j + 1
        else:
            # literal run until next 2-byte repeat (or 128 cap)
            j = i
            while (
                j + 1 < n
                and not (j + 2 < n and row[j + 1] == row[j + 2])
                and j - i < 127
            ):
                j += 1
            out += bytes([j - i]) + row[i : j + 1]
            i = j + 1
    return bytes(out)


def _lzw_encode(src: bytes) -> bytes:
    """TIFF-flavor LZW encoder (early change mirrored)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    width = 9
    emit(CLEAR, width)
    cur = b""
    for byte in src:
        cand = cur + bytes([byte])
        if cand in table:
            cur = cand
            continue
        emit(table[cur], width)
        table[cand] = nxt
        nxt += 1
        # encoder-side early change: the encoder runs one table entry
        # AHEAD of the decoder (it assigns on the same code the decoder
        # assigns one code later), so the decoder's next-free == 2^w - 1
        # rule lands here as next-to-assign == 2^w
        if nxt == (1 << width) and width < 12:
            width += 1
        if nxt > 4093:  # keep headroom, reset like common writers
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
        cur = bytes([byte])
    if cur:
        emit(table[cur], width)
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def tiff_encode(
    px: np.ndarray,
    compression: str = "none",
    predictor: bool = False,
    byte_order: str = "II",
) -> bytes:
    """Mint a single-strip chunky TIFF: (h, w, 3) uint8 -> RGB, (h, w)
    uint8 -> gray. compression in {'none', 'packbits', 'lzw', 'deflate'}."""
    from pincspark.operators.multimodal import _MAX_PIXELS

    gray = px.ndim == 2
    h, w = px.shape[:2]
    if w * h > _MAX_PIXELS:
        raise ValueError("TIFF encoder: exceeds the decoder pixel cap")
    nch = 1 if gray else 3
    comp_id = {"none": 1, "packbits": 32773, "lzw": 5, "deflate": 8}[compression]
    if predictor and comp_id not in (5, 8):
        raise ValueError(
            "TIFF encoder: predictor 2 is defined only for lzw/deflate "
            "(readers ignore the tag otherwise)"
        )
    body = np.ascontiguousarray(px.astype(np.uint8))
    if predictor:
        arr = body.reshape(h, w, nch)
        body = np.concatenate(
            [arr[:, :1], (arr[:, 1:].astype(np.int16) - arr[:, :-1]).astype(np.uint8)],
            axis=1,
        )
    raw = body.tobytes()
    if comp_id == 1:
        payload = raw
    elif comp_id == 32773:
        rb = w * nch
        payload = b"".join(_packbits(raw[i : i + rb]) for i in range(0, len(raw), rb))
    elif comp_id == 5:
        payload = _lzw_encode(raw)
    else:
        payload = zlib.compress(raw, 6)

    e = "<" if byte_order == "II" else ">"
    entries = [
        (_T_WIDTH, 4, 1, w),
        (_T_LENGTH, 4, 1, h),
        (_T_BITS, 3, nch, None),
        (_T_COMPRESSION, 3, 1, comp_id),
        (_T_PHOTOMETRIC, 3, 1, 1 if gray else 2),
        (_T_STRIP_OFFSETS, 4, 1, None),
        (_T_SAMPLES, 3, 1, nch),
        (_T_ROWS_PER_STRIP, 4, 1, h),
        (_T_STRIP_COUNTS, 4, 1, len(payload)),
        (_T_PLANAR, 3, 1, 1),
    ]
    if predictor:
        entries.append((_T_PREDICTOR, 3, 1, 2))
    entries.sort()
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * len(entries) + 4
    bits_off = data_off  # out-of-line BitsPerSample when nch == 3
    strip_off = data_off + (2 * nch if nch > 2 else 0)

    out = bytearray()
    out += (b"II*\x00" if e == "<" else b"MM\x00*") + struct.pack(e + "I", ifd_off)
    out += struct.pack(e + "H", len(entries))
    for tag, typ, count, val in entries:
        if tag == _T_BITS:
            if nch == 1:
                out += struct.pack(e + "HHIHH", tag, typ, count, 8, 0)
            else:
                out += struct.pack(e + "HHII", tag, typ, count, bits_off)
        elif tag == _T_STRIP_OFFSETS:
            out += struct.pack(e + "HHII", tag, typ, count, strip_off)
        elif typ == 3:
            out += struct.pack(e + "HHIHH", tag, typ, count, val, 0)
        else:
            out += struct.pack(e + "HHII", tag, typ, count, val)
    out += struct.pack(e + "I", 0)  # next IFD
    if nch == 3:
        out += struct.pack(e + "HHH", 8, 8, 8)
    assert len(out) == strip_off
    out += payload
    return bytes(out)
