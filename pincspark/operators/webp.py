"""From-scratch lossless WebP (VP8L) codec: decoder + minting encoder.

Pure Python/numpy implementation of the public WebP Lossless Bitstream
Specification (RFC 9649 / Google's VP8L spec) — no codec libraries, same
policy as the PNG/GIF/JPEG/FLAC codecs in this package. The decoder
covers the full still-image bitstream:

- LSB-first bit reading inside a RIFF/WEBP/VP8L container
- both Huffman code classes (simple 1-2 symbol codes and normal codes
  with the 19-symbol code-length code, RLE codes 16/17/18, and the
  optional max_symbol shortcut)
- color cache (the 0x1e35a7bd multiplicative hash), LZ77 backward
  references with the 120-entry 2D distance map, meta-Huffman groups
- all four transforms, inverted in reverse read order: PREDICTOR (14
  modes), COLOR (signed delta multiply >> 5), SUBTRACT_GREEN,
  COLOR_INDEXING (incl. sub-byte pixel packing for palettes <= 16)

The encoder mints spec-conformant literal-mode streams (no transforms,
no cache, no LZ77, per-channel Huffman codes — simple codes for <= 2
distinct values, normal codes otherwise), which is the same
"our-encoder-mints, our-decoder-proves" arrangement FLAC uses: no WebP
encoder exists in this container (no PIL, no ffmpeg; Java ImageIO has no
WebP plugin), so cross-implementation vectors are replaced by
hand-assembled golden bitstreams in tests/test_webp.py whose expected
pixels are computed by hand from the spec, exercising the decoder paths
the encoder never emits (cache hits, backrefs, every transform).

Hostile-input policy mirrors the other codecs: 14-bit dimensions are
spec-bounded, the shared 64M-pixel cap rejects dimension bombs before
allocation, the bit reader raises on overrun, and backref copies are
bounds-checked — a corrupt blob raises and the multimodal layer treats
it as undecodable instead of killing the task.
"""

from __future__ import annotations

import struct

import numpy as np

# The shared 64M-px cap bounds MEMORY, but this decoder's entropy loop is
# per-pixel Python (~6 us/px; the predictor inversion more) — a crafted
# few-KB blob declaring 64M px would tie a worker up for minutes, a CPU
# bomb the vectorized PNG/GIF paths don't have (review finding r7). The
# VP8L cap is therefore CPU-sized: 1M px is ~6-15 s worst case, far above
# any thumbnail/feature-extraction blob this engine decodes. The shared
# multimodal cap still applies on top (imported at decode time to stay in
# lockstep if it is ever tuned).
MAX_PIXELS = 1 << 20

# Order in which the 3-bit lengths of the code-length code are stored.
_CODE_LENGTH_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

# 2D distance map for LZ77 plane codes 1..120: (dx, dy) neighbor offsets.
_DISTANCE_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


class _BitReader:
    """LSB-first bit reader (VP8L convention — the opposite of JPEG's)."""

    def __init__(self, data: bytes):
        self._d = data
        self._pos = 0  # bit position

    def bit(self) -> int:
        p = self._pos
        byte = p >> 3
        if byte >= len(self._d):
            raise ValueError("VP8L: bitstream overrun")
        self._pos = p + 1
        return (self._d[byte] >> (p & 7)) & 1

    def bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            v |= self.bit() << i
        return v


class _Huffman:
    """Canonical prefix code (DEFLATE-style assignment). Decoding walks
    bit-by-bit appending each new bit on the right — matching how the
    spec's codes are emitted into the LSB-first stream."""

    __slots__ = ("_first", "_offset", "_count", "_symbols", "_single", "max_len")

    def __init__(self, lengths: list[int]):
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise ValueError("VP8L: empty Huffman code")
        if len(nz) == 1:
            # one symbol: zero-bit code, reads consume nothing
            self._single = nz[0][1]
            self.max_len = 0
            return
        self._single = None
        self.max_len = max(l for l, _ in nz)
        if self.max_len > 15:
            raise ValueError("VP8L: code length > 15")
        count = [0] * (self.max_len + 1)
        for l, _ in nz:
            count[l] += 1
        # Kraft check: an over/under-subscribed code is malformed
        total = sum(c << (self.max_len - l) for l, c in enumerate(count) if l)
        if total != 1 << self.max_len:
            raise ValueError("VP8L: invalid (non-complete) Huffman code")
        self._first = [0] * (self.max_len + 1)  # first canonical code per length
        self._offset = [0] * (self.max_len + 1)  # index into _symbols per length
        self._count = count
        code = 0
        idx = 0
        self._symbols = [s for _, s in sorted(nz)]
        for l in range(1, self.max_len + 1):
            self._first[l] = code
            self._offset[l] = idx
            code = (code + count[l]) << 1
            idx += count[l]

    def read(self, br: _BitReader) -> int:
        if self._single is not None:
            return self._single
        code = 0
        for l in range(1, self.max_len + 1):
            code = (code << 1) | br.bit()
            rel = code - self._first[l]
            if 0 <= rel < self._count[l]:
                return self._symbols[self._offset[l] + rel]
        raise ValueError("VP8L: invalid Huffman bit sequence")


def _read_code_lengths(br: _BitReader, cl_huff: _Huffman, num_symbols: int) -> list[int]:
    lengths = [0] * num_symbols
    if br.bit():  # use max_symbol shortcut
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = num_symbols
    symbol = 0
    prev_len = 8
    while symbol < num_symbols:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = cl_huff.read(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len != 0:
                prev_len = code_len
        else:
            if code_len == 16:
                repeat, fill = br.bits(2) + 3, prev_len
            elif code_len == 17:
                repeat, fill = br.bits(3) + 3, 0
            else:  # 18
                repeat, fill = br.bits(7) + 11, 0
            end = min(symbol + repeat, num_symbols)
            for i in range(symbol, end):
                lengths[i] = fill
            symbol = end
    return lengths


def _read_huffman_code(br: _BitReader, alphabet_size: int) -> _Huffman:
    if br.bit():  # simple code
        num_symbols = br.bit() + 1
        if br.bit():  # first symbol is 8-bit
            sym0 = br.bits(8)
        else:
            sym0 = br.bit()
        lengths = [0] * alphabet_size
        if num_symbols == 1:
            if sym0 >= alphabet_size:
                raise ValueError("VP8L: simple-code symbol out of range")
            lengths[sym0] = 1  # value unused for single-symbol codes
            h = _Huffman.__new__(_Huffman)
            h._single = sym0
            h.max_len = 0
            return h
        sym1 = br.bits(8)
        if sym0 >= alphabet_size or sym1 >= alphabet_size or sym0 == sym1:
            raise ValueError("VP8L: bad simple-code symbols")
        lengths[sym0] = lengths[sym1] = 1
        return _Huffman(lengths)
    # normal code
    num_codes = 4 + br.bits(4)
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_CODE_LENGTH_ORDER[i]] = br.bits(3)
    cl_huff = _Huffman(cl_lengths)
    lengths = _read_code_lengths(br, cl_huff, alphabet_size)
    return _Huffman(lengths)


def _prefix_value(code: int, br: _BitReader) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1


def _cache_key(argb: int, cache_bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)


def _decode_entropy_image(br: _BitReader, w: int, h: int, allow_meta: bool):
    """The spec's 'spatially-coded image': Huffman groups + cache + LZ77.
    Returns a flat list of ARGB uint32 pixels, length w*h. Sub-resolution
    images (transform data, palettes, meta indices) use allow_meta=False
    (no meta-Huffman at those levels; the color-cache flag IS read)."""
    cache_bits = 0
    cache = None
    if br.bit():
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L: bad color-cache size")
        cache = [0] * (1 << cache_bits)

    meta = None
    meta_bits = 0
    num_groups = 1
    if allow_meta and br.bit():
        meta_bits = br.bits(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_px = _decode_entropy_image(br, mw, mh, allow_meta=False)
        meta = [((p >> 8) & 0xFFFF) for p in meta_px]  # (red<<8)|green
        num_groups = max(meta) + 1

    green_size = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(num_groups):
        g = _read_huffman_code(br, green_size)
        r = _read_huffman_code(br, 256)
        b = _read_huffman_code(br, 256)
        a = _read_huffman_code(br, 256)
        d = _read_huffman_code(br, 40)
        groups.append((g, r, b, a, d))

    n = w * h
    out = [0] * n
    pos = 0
    mw = ((w + (1 << meta_bits) - 1) >> meta_bits) if meta is not None else 0

    def group_at(p: int):
        if meta is None:
            return groups[0]
        x, y = p % w, p // w
        return groups[meta[(y >> meta_bits) * mw + (x >> meta_bits)]]

    while pos < n:
        gh, rh, bh, ah, dh = group_at(pos)
        s = gh.read(br)
        if s < 256:
            red = rh.read(br)
            blue = bh.read(br)
            alpha = ah.read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            pos += 1
            if cache is not None:
                cache[_cache_key(px, cache_bits)] = px
        elif s < 256 + 24:
            length = _prefix_value(s - 256, br)
            dist_code = _prefix_value(dh.read(br), br)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DISTANCE_MAP[dist_code - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > n:
                raise ValueError("VP8L: backref out of bounds")
            for _ in range(length):
                px = out[pos - dist]
                out[pos] = px
                pos += 1
                if cache is not None:
                    cache[_cache_key(px, cache_bits)] = px
        else:
            if cache is None:
                raise ValueError("VP8L: cache symbol without cache")
            out[pos] = cache[s - 256 - 24]
            pos += 1
    return out


def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a.astype(np.int32) + b.astype(np.int32)) >> 1


def _predict(mode: int, L, T, TL, TR) -> np.ndarray:
    """One of the 14 predictor modes over ARGB channel vectors (len 4)."""
    if mode == 0:
        return np.array([255, 0, 0, 0], np.int32)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:  # Select
        p = L.astype(np.int32) + T.astype(np.int32) - TL.astype(np.int32)
        p_l = int(np.abs(p - L).sum())
        p_t = int(np.abs(p - T).sum())
        return L if p_l < p_t else T
    if mode == 12:  # ClampAddSubtractFull
        return np.clip(
            L.astype(np.int32) + T.astype(np.int32) - TL.astype(np.int32), 0, 255
        )
    if mode == 13:  # ClampAddSubtractHalf
        ave = _avg2(L, T).astype(np.int32)
        d = ave - TL.astype(np.int32)
        # C truncation toward zero ((a-b)/2), not Python floor shift:
        # -3 / 2 is -1 in the spec, -2 under >> (review finding r7)
        half = np.sign(d) * (np.abs(d) >> 1)
        return np.clip(ave + half, 0, 255)
    raise ValueError(f"VP8L: bad predictor mode {mode}")


def _inv_predictor(px: np.ndarray, sub, bits: int) -> None:
    """In-place inverse predictor over the (h, w, 4) ARGB residual array;
    sub = flat mode sub-image (modes in the green byte), block size 2^bits."""
    h, w, _ = px.shape
    sub_w = (w + (1 << bits) - 1) >> bits
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0], np.int32)
            elif y == 0:
                pred = px[0, x - 1]  # top row: L
            elif x == 0:
                pred = px[y - 1, 0]  # left column: T
            else:
                mode = (sub[(y >> bits) * sub_w + (x >> bits)] >> 8) & 0xFF
                L = px[y, x - 1]
                T = px[y - 1, x]
                TL = px[y - 1, x - 1]
                # Top-right of the rightmost pixel: the spec addresses the
                # pixel AFTER (w-1, y-1) in scanline order, which is the
                # CURRENT row's leftmost, already reconstructed (libwebp
                # reads data[pos - width + 1]; review finding r7 — the
                # first cut wrongly used the row above's leftmost).
                TR = px[y - 1, x + 1] if x + 1 < w else px[y, 0]
                pred = _predict(mode, L, T, TL, TR)
            px[y, x] = (px[y, x].astype(np.int32) + pred) & 0xFF


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: signed-int8 multiply >> 5."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _inv_color_transform(px: np.ndarray, sub, bits: int) -> None:
    h, w, _ = px.shape
    sub_w = (w + (1 << bits) - 1) >> bits
    for y in range(h):
        for x in range(w):
            cte = sub[(y >> bits) * sub_w + (x >> bits)]
            g2r = cte & 0xFF          # blue byte
            g2b = (cte >> 8) & 0xFF   # green byte
            r2b = (cte >> 16) & 0xFF  # red byte
            a, r, g, b = (int(v) for v in px[y, x])
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g)) & 0xFF
            b = (b + _ct_delta(r2b, r)) & 0xFF
            px[y, x, 1] = r
            px[y, x, 3] = b


def decode_webp_raw(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WEBP/VP8L container -> ((h, w, 3) RGB int64 raster, 255).

    Same return contract as the PNG/GIF/JPEG decoders (alpha dropped for
    the luminance feature path). Raises ValueError on malformed input.
    """
    if len(data) < 20 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP container")
    # chunk walk (VP8L for lossless; VP8/VP8X lossy/extended unsupported)
    off = 12
    payload = None
    while off + 8 <= len(data):
        tag = data[off : off + 4]
        (size,) = struct.unpack("<I", data[off + 4 : off + 8])
        body = data[off + 8 : off + 8 + size]
        if len(body) < size:
            raise ValueError("VP8L: truncated chunk")
        if tag == b"VP8L":
            payload = body
            break
        off += 8 + size + (size & 1)
    if payload is None:
        raise ValueError("no VP8L chunk (lossy WebP is not supported)")
    if not payload or payload[0] != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    br = _BitReader(payload[1:])
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bit()  # alpha hint
    if br.bits(3) != 0:
        raise ValueError("VP8L: unsupported version")
    from pincspark.operators.multimodal import _MAX_PIXELS

    if w * h > min(MAX_PIXELS, _MAX_PIXELS):
        raise ValueError("VP8L: dimension bomb")

    # transforms, recorded in read order
    transforms = []
    seen = set()
    xsize = w
    while br.bit():
        ttype = br.bits(2)
        if ttype in seen:
            raise ValueError("VP8L: duplicate transform")
        seen.add(ttype)
        if ttype == 0 or ttype == 1:  # PREDICTOR / COLOR
            bits = br.bits(3) + 2
            sw = (xsize + (1 << bits) - 1) >> bits
            sh = (h + (1 << bits) - 1) >> bits
            sub = _decode_entropy_image(br, sw, sh, allow_meta=False)
            transforms.append((ttype, bits, sub))
        elif ttype == 2:  # SUBTRACT_GREEN
            transforms.append((2, 0, None))
        else:  # COLOR_INDEXING
            pal_size = br.bits(8) + 1
            pal_px = _decode_entropy_image(br, pal_size, 1, allow_meta=False)
            # palette entries are delta-coded per channel
            pal = [pal_px[0]]
            for p in pal_px[1:]:
                prev = pal[-1]
                pal.append(
                    (((p >> 24) + (prev >> 24)) & 0xFF) << 24
                    | ((((p >> 16) & 0xFF) + ((prev >> 16) & 0xFF)) & 0xFF) << 16
                    | ((((p >> 8) & 0xFF) + ((prev >> 8) & 0xFF)) & 0xFF) << 8
                    | (((p & 0xFF) + (prev & 0xFF)) & 0xFF)
                )
            if pal_size <= 2:
                pbits = 3
            elif pal_size <= 4:
                pbits = 2
            elif pal_size <= 16:
                pbits = 1
            else:
                pbits = 0
            transforms.append((3, pbits, pal))
            xsize = (w + (1 << pbits) - 1) >> pbits

    flat = _decode_entropy_image(br, xsize, h, allow_meta=True)

    # Invert transforms in reverse read order. The image's width at each
    # inversion step is the width that was CURRENT when that transform
    # was READ: a predictor/color transform read after COLOR_INDEXING
    # operates on the still-index-packed reduced-width image, and only
    # the color-indexing inversion expands back to w (review finding r7
    # — reshaping to (h, w) unconditionally broke that legal order).
    cur_w = xsize
    for ttype, bits, aux in reversed(transforms):
        if ttype == 3:  # color indexing: unpack + palette lookup
            pal = aux
            if bits == 0:
                idx = [(p >> 8) & 0xFF for p in flat]
            else:
                per = 1 << bits  # packed pixels per coded pixel
                ibits = 8 >> bits
                mask = (1 << ibits) - 1
                idx = []
                for y in range(h):
                    row = []
                    for cx in range(cur_w):
                        g = (flat[y * cur_w + cx] >> 8) & 0xFF
                        for k in range(per):
                            row.append((g >> (k * ibits)) & mask)
                    idx.extend(row[:w])
            # libwebp pads the packed-palette color map with zeros, so an
            # out-of-range index decodes to transparent black rather than
            # rejecting the file (ADVICE r7) — match that.
            npal = len(pal)
            flat = [pal[i] if i < npal else 0 for i in idx]
            cur_w = w
        elif ttype == 2:  # add green
            flat = [
                (p & 0xFF00FF00)
                | ((((p >> 16) & 0xFF) + ((p >> 8) & 0xFF)) & 0xFF) << 16
                | ((((p >> 0) & 0xFF) + ((p >> 8) & 0xFF)) & 0xFF)
                for p in flat
            ]
        else:
            arr = np.empty((h, cur_w, 4), np.uint8)  # ARGB channel order
            fa = np.array(flat, np.uint32).reshape(h, cur_w)
            arr[..., 0] = (fa >> 24) & 0xFF
            arr[..., 1] = (fa >> 16) & 0xFF
            arr[..., 2] = (fa >> 8) & 0xFF
            arr[..., 3] = fa & 0xFF
            if ttype == 0:
                _inv_predictor(arr, aux, bits)
            else:
                _inv_color_transform(arr, aux, bits)
            fa = (
                arr[..., 0].astype(np.uint32) << 24
                | arr[..., 1].astype(np.uint32) << 16
                | arr[..., 2].astype(np.uint32) << 8
                | arr[..., 3].astype(np.uint32)
            )
            flat = list(fa.reshape(-1))

    fa = np.array(flat, np.uint32).reshape(h, w)
    raster = np.empty((h, w, 3), np.int64)
    raster[..., 0] = (fa >> 16) & 0xFF  # R
    raster[..., 1] = (fa >> 8) & 0xFF  # G
    raster[..., 2] = fa & 0xFF  # B
    return raster, 255


# --------------------------------------------------------------------------
# Minting encoder (literal mode)
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self._bytes = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        """LSB-first: value's low bit goes into the stream first."""
        self._acc |= (value & ((1 << nbits) - 1)) << self._n
        self._n += nbits
        while self._n >= 8:
            self._bytes.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def write_code(self, code: int, length: int) -> None:
        """A canonical Huffman code: emitted MSB-of-code first, so the
        decoder's (code<<1)|bit walk reconstructs it."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def done(self) -> bytes:
        if self._n:
            self._bytes.append(self._acc & 0xFF)
            self._acc, self._n = 0, 0
        return bytes(self._bytes)


def _package_merge_lengths(freqs: dict[int, int], max_len: int) -> dict[int, int]:
    """Optimal length-limited code lengths via package-merge (Larmore &
    Hirschberg 1990): coins are (freq, symbol-tuple); max_len rounds of
    pair-packaging against the original coins, then the first 2(n-1) items
    of the final pool give each symbol's depth as its occurrence count.
    Exact Kraft equality, depth <= max_len, minimal weighted length among
    all such codes."""
    syms = sorted(freqs.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(syms)
    if n > (1 << max_len):
        raise ValueError(
            f"cannot code {n} symbols within depth {max_len}"
        )
    originals = [(f, (s,)) for s, f in syms]
    pool = sorted(originals)
    for _ in range(max_len - 1):
        packages = [
            (pool[i][0] + pool[i + 1][0], pool[i][1] + pool[i + 1][1])
            for i in range(0, len(pool) - 1, 2)
        ]
        pool = sorted(originals + packages)
    lengths = dict.fromkeys(freqs, 0)
    for _, members in pool[: 2 * (n - 1)]:
        for s in members:
            lengths[s] += 1
    return lengths


def _huffman_lengths(freqs: dict[int, int], max_len: int = 15) -> dict[int, int]:
    """Code lengths for >= 3 distinct symbols via plain Huffman merging
    (depths stay tiny at typical alphabet/count sizes). A highly skewed
    histogram CAN exceed the spec's 15-bit cap well under the pixel caps
    (Fibonacci-like frequencies need only ~17 distinct symbols), so on
    overflow fall back to optimal length-limited codes via package-merge
    instead of raising (ADVICE r7)."""
    import heapq
    import itertools

    counter = itertools.count()
    heap = [(f, next(counter), {s: 0}) for s, f in freqs.items()]
    heapq.heapify(heap)
    while len(heap) > 1:
        f1, _, d1 = heapq.heappop(heap)
        f2, _, d2 = heapq.heappop(heap)
        merged = {s: l + 1 for s, l in d1.items()}
        merged.update({s: l + 1 for s, l in d2.items()})
        heapq.heappush(heap, (f1 + f2, next(counter), merged))
    lengths = heap[0][2]
    if max(lengths.values()) > max_len:
        return _package_merge_lengths(freqs, max_len)
    return lengths


def _canonical_codes(lengths: dict[int, int]) -> dict[int, int]:
    by = sorted(lengths.items(), key=lambda kv: (kv[1], kv[0]))
    codes = {}
    code = 0
    prev_len = by[0][1]
    for sym, l in by:
        code <<= l - prev_len
        prev_len = l
        codes[sym] = code
        code += 1
    return codes


def _write_huffman_code(bw: _BitWriter, freqs: dict[int, int], alphabet: int):
    """Emit one of the five codes; returns {symbol: (code, length)} for
    the pixel loop. Chooses simple for <= 2 distinct symbols."""
    syms = sorted(freqs)
    # Simple codes carry symbols in at most 8 bits — a length/cache
    # symbol >= 256 CANNOT be simple-coded and silently truncating it
    # mints a corrupt stream (review finding r7); such alphabets take
    # the normal-code path even with <= 2 distinct symbols.
    if len(syms) <= 2 and all(s <= 255 for s in syms):
        bw.write(1, 1)  # simple
        if not syms:
            syms = [0]
        bw.write(len(syms) - 1, 1)
        first = syms[0]
        if first <= 1:
            bw.write(0, 1)  # 1-bit first symbol
            bw.write(first, 1)
        else:
            bw.write(1, 1)
            bw.write(first, 8)
        if len(syms) == 1:
            return {syms[0]: (0, 0)}
        bw.write(syms[1], 8)
        return {syms[0]: (0, 1), syms[1]: (1, 1)}
    bw.write(0, 1)  # normal
    if len(syms) == 1:
        # a single >255 symbol: transmit length 1 for it; the decoder's
        # single-nonzero-length special case makes reads consume 0 bits
        lengths = {syms[0]: 1}
    else:
        lengths = _huffman_lengths(freqs)
    lens = [lengths.get(s, 0) for s in range(alphabet)]
    # trim trailing zeros; RLE-encode the rest with codes 16/17/18
    while lens and lens[-1] == 0:
        lens.pop()
    rle: list[tuple[int, int, int]] = []  # (symbol, extra_value, extra_bits)
    i = 0
    while i < len(lens):
        l = lens[i]
        run = 1
        while i + run < len(lens) and lens[i + run] == l:
            run += 1
        i += run
        if l == 0:
            while run >= 11:
                r = min(run, 74)
                rle.append((18, r - 11, 7))
                run -= r
            while run >= 3:
                r = min(run, 10)
                rle.append((17, r - 3, 3))
                run -= r
            rle.extend((0, 0, 0) for _ in range(run))
        else:
            # code 16 repeats the PREVIOUS length, so the first of a run
            # is always a literal
            rle.append((l, 0, 0))
            run -= 1
            while run >= 3:
                r = min(run, 6)
                rle.append((16, r - 3, 2))
                run -= r
            rle.extend((l, 0, 0) for _ in range(run))
    cl_freqs: dict[int, int] = {}
    for s, _, _ in rle:
        cl_freqs[s] = cl_freqs.get(s, 0) + 1
    if len(cl_freqs) >= 3:
        cl_lengths = _huffman_lengths(cl_freqs, max_len=7)
    elif len(cl_freqs) == 2:
        a, b = sorted(cl_freqs)
        cl_lengths = {a: 1, b: 1}
    else:
        (only,) = cl_freqs
        cl_lengths = {only: 1}
    bw.write(15, 4)  # num_code_lengths = 4 + 15 = 19 (send all)
    for s in _CODE_LENGTH_ORDER:
        bw.write(cl_lengths.get(s, 0), 3)
    cl_codes = (
        _canonical_codes(cl_lengths) if len(cl_lengths) > 1 else {next(iter(cl_lengths)): 0}
    )
    cl_nbits = cl_lengths if len(cl_lengths) > 1 else {next(iter(cl_lengths)): 0}
    # max_symbol shortcut: the decoder performs exactly len(rle) symbol
    # reads, then stops — required because the trailing zero lengths of
    # the alphabet are never transmitted (len(rle) >= 2 always holds for
    # >= 3 distinct symbols, and the field encodes max_symbol - 2).
    need = len(rle) - 2
    nbits = max(2, need.bit_length())
    if nbits % 2:
        nbits += 1
    bw.write(1, 1)
    bw.write((nbits - 2) // 2, 3)
    bw.write(need, nbits)
    for s, extra, ebits in rle:
        bw.write_code(cl_codes[s], cl_nbits[s])
        if ebits:
            bw.write(extra, ebits)
    if len(lengths) == 1:
        return {syms[0]: (0, 0)}  # zero-bit emission, matching the decoder
    codes = _canonical_codes(lengths)
    return {s: (codes[s], lengths[s]) for s in lengths}


def webp_encode(px: np.ndarray) -> bytes:
    """(h, w, 3) RGB uint8 -> lossless WebP (VP8L literal mode: no
    transforms, no cache, no LZ77; per-channel Huffman codes)."""
    px = np.asarray(px, np.uint8)
    h, w, _ = px.shape
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("VP8L encoder: dimensions out of range")
    if w * h > MAX_PIXELS:
        # the minting encoder must not produce blobs its own decoder
        # rejects (review finding r7)
        raise ValueError("VP8L encoder: exceeds the decoder pixel cap")
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta-Huffman

    g = px[..., 1].reshape(-1)
    r = px[..., 0].reshape(-1)
    b = px[..., 2].reshape(-1)

    def freqs(arr) -> dict[int, int]:
        v, c = np.unique(arr, return_counts=True)
        return {int(s): int(n) for s, n in zip(v, c)}

    g_tab = _write_huffman_code(bw, freqs(g), 256 + 24)
    r_tab = _write_huffman_code(bw, freqs(r), 256)
    b_tab = _write_huffman_code(bw, freqs(b), 256)
    a_tab = _write_huffman_code(bw, {255: 1}, 256)
    _write_huffman_code(bw, {0: 1}, 40)  # distance code: unused

    for i in range(w * h):
        cg, lg = g_tab[int(g[i])]
        bw.write_code(cg, lg)
        cr, lr = r_tab[int(r[i])]
        bw.write_code(cr, lr)
        cb, lb = b_tab[int(b[i])]
        bw.write_code(cb, lb)
        ca, la = a_tab[255]
        bw.write_code(ca, la)

    payload = bw.done()
    riff_size = 4 + 8 + len(payload) + (len(payload) & 1)
    out = b"RIFF" + struct.pack("<I", riff_size) + b"WEBP"
    out += b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        out += b"\x00"
    return out
