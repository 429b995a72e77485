"""From-scratch lossless WebP (VP8L) codec tests.

Round-trips prove encoder<->decoder consistency; the decoder paths the
literal-mode encoder never emits (LZ77 backrefs, color cache, all four
transforms, meta-Huffman groups) are covered by HAND-ASSEMBLED golden
bitstreams whose expected rasters are computed by hand from the spec —
the same arrangement as FLAC's hand-computed golden frames (no WebP
encoder of any kind exists in this container to mint cross-impl
vectors; re-probed r7)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pincspark.operators.webp import (
    _BitWriter,
    _write_huffman_code,
    decode_webp_raw,
    webp_encode,
)


def _container(payload: bytes) -> bytes:
    riff_size = 4 + 8 + len(payload) + (len(payload) & 1)
    out = b"RIFF" + struct.pack("<I", riff_size) + b"WEBP"
    out += b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        out += b"\x00"
    return out


def _header(bw: _BitWriter, w: int, h: int) -> None:
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version


def _emit(bw, tab, sym) -> None:
    code, length = tab[sym]
    bw.write_code(code, length)


# --------------------------------------------------------------------------
# round-trips (encoder paths)
# --------------------------------------------------------------------------


@pytest.mark.parametrize("shape", [(1, 1), (3, 5), (8, 8), (16, 7), (31, 33)])
def test_roundtrip_random(shape):
    rng = np.random.default_rng(sum(shape))
    px = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    ras, maxval = decode_webp_raw(webp_encode(px))
    assert maxval == 255
    assert (ras == px).all()


def test_roundtrip_flat_and_two_value():
    px = np.full((6, 6, 3), 42, np.uint8)  # single-symbol simple codes
    assert (decode_webp_raw(webp_encode(px))[0] == px).all()
    rng = np.random.default_rng(1)
    px = rng.integers(0, 2, (9, 9, 3), dtype=np.uint8) * 200  # 2-symbol simple
    assert (decode_webp_raw(webp_encode(px))[0] == px).all()


def test_roundtrip_gradient():
    px = np.zeros((10, 12, 3), np.uint8)
    px[..., 0] = np.arange(12)
    px[..., 1] = np.arange(10)[:, None]
    px[..., 2] = 7
    assert (decode_webp_raw(webp_encode(px))[0] == px).all()


# --------------------------------------------------------------------------
# hand-assembled goldens (decoder-only paths)
# --------------------------------------------------------------------------


def test_golden_lz77_backrefs_distance_map():
    """4x2: literals A, B; length-2 backref at plane-code 2 ((1,0) ->
    distance 1, 'previous pixel'); then a length-4 backref at plane-code
    1 ((0,1) -> distance = row width) copying the whole first row."""
    w, h = 4, 2
    A = (30, 10, 50)  # (r, g, b)
    B = (70, 20, 90)
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    g_tab = _write_huffman_code(bw, {10: 1, 20: 1, 257: 1, 259: 1}, 280)
    r_tab = _write_huffman_code(bw, {30: 1, 70: 1}, 256)
    b_tab = _write_huffman_code(bw, {50: 1, 90: 1}, 256)
    a_tab = _write_huffman_code(bw, {255: 1}, 256)
    d_tab = _write_huffman_code(bw, {0: 1, 1: 1}, 40)
    for px in (A, B):
        _emit(bw, g_tab, px[1])
        _emit(bw, r_tab, px[0])
        _emit(bw, b_tab, px[2])
        _emit(bw, a_tab, 255)
    _emit(bw, g_tab, 257)  # length prefix 1 -> length 2
    _emit(bw, d_tab, 1)  # distance prefix 1 -> code 2 -> map (1,0) -> 1
    _emit(bw, g_tab, 259)  # length prefix 3 -> length 4
    _emit(bw, d_tab, 0)  # distance prefix 0 -> code 1 -> map (0,1) -> w
    ras, _ = decode_webp_raw(_container(bw.done()))
    row = [A, B, B, B]
    assert ras.tolist() == [ [list(p) for p in row] ] * 2


def test_golden_color_cache():
    """2x2 with a 4-bit color cache: two literals, then two cache hits
    reproducing them. Cache indices follow the spec's multiplicative
    hash of the ARGB word."""
    X = (1, 2, 3)
    Y = (200, 150, 100)

    def key(px):
        argb = (255 << 24) | (px[0] << 16) | (px[1] << 8) | px[2]
        return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - 4)

    kx, ky = key(X), key(Y)
    assert kx != ky  # goldens require distinct slots
    bw = _BitWriter()
    _header(bw, 2, 2)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # cache present
    bw.write(4, 4)  # cache_bits = 4
    bw.write(0, 1)  # no meta
    green_alpha = 256 + 24 + 16
    g_tab = _write_huffman_code(
        bw, {2: 1, 150: 1, 280 + kx: 1, 280 + ky: 1}, green_alpha
    )
    r_tab = _write_huffman_code(bw, {1: 1, 200: 1}, 256)
    b_tab = _write_huffman_code(bw, {3: 1, 100: 1}, 256)
    a_tab = _write_huffman_code(bw, {255: 1}, 256)
    _write_huffman_code(bw, {0: 1}, 40)
    for px in (X, Y):
        _emit(bw, g_tab, px[1])
        _emit(bw, r_tab, px[0])
        _emit(bw, b_tab, px[2])
        _emit(bw, a_tab, 255)
    _emit(bw, g_tab, 280 + kx)
    _emit(bw, g_tab, 280 + ky)
    ras, _ = decode_webp_raw(_container(bw.done()))
    assert ras.tolist() == [[list(X), list(Y)], [list(X), list(Y)]]


def _literal_image(bw: _BitWriter, pixels) -> None:
    """Emit an entropy-coded sub/main image body (after any transform
    bits): no cache, no meta, literal pixels (list of (a, r, g, b))."""
    bw.write(0, 1)  # no cache
    # NOTE: caller controls whether the meta bit exists (sub-images have
    # no meta bit; the main image writes it before calling with meta=False)
    gs = {g: 1 for _, _, g, _ in pixels}
    rs = {r: 1 for _, r, _, _ in pixels}
    bs = {b: 1 for _, _, _, b in pixels}
    as_ = {a: 1 for a, _, _, _ in pixels}
    g_tab = _write_huffman_code(bw, gs, 280)
    r_tab = _write_huffman_code(bw, rs, 256)
    b_tab = _write_huffman_code(bw, bs, 256)
    a_tab = _write_huffman_code(bw, as_, 256)
    _write_huffman_code(bw, {0: 1}, 40)
    for a, r, g, b in pixels:
        _emit(bw, g_tab, g)
        _emit(bw, r_tab, r)
        _emit(bw, b_tab, b)
        _emit(bw, a_tab, a)


def test_golden_subtract_green():
    """2x1 with SUBTRACT_GREEN: stored (r, b) are residuals relative to
    green; expected raster adds green back mod 256."""
    bw = _BitWriter()
    _header(bw, 2, 1)
    bw.write(1, 1)  # transform present
    bw.write(2, 2)  # SUBTRACT_GREEN
    bw.write(0, 1)  # no more transforms
    # main image: residual pixels (a, r, g, b)
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    gs = {100: 1, 250: 1}
    g_tab = _write_huffman_code(bw, gs, 280)
    r_tab = _write_huffman_code(bw, {10: 1, 20: 1}, 256)
    b_tab = _write_huffman_code(bw, {5: 1, 30: 1}, 256)
    a_tab = _write_huffman_code(bw, {255: 1}, 256)
    _write_huffman_code(bw, {0: 1}, 40)
    for r, g, b in ((10, 100, 5), (20, 250, 30)):
        _emit(bw, g_tab, g)
        _emit(bw, r_tab, r)
        _emit(bw, b_tab, b)
        _emit(bw, a_tab, 255)
    ras, _ = decode_webp_raw(_container(bw.done()))
    # r' = (r + g) % 256, b' = (b + g) % 256
    assert ras.tolist() == [
        [[110, 100, 105], [(20 + 250) % 256, 250, (30 + 250) % 256]]
    ]


def test_golden_predictor_transform():
    """4x2 PREDICTOR transform, block bits 2 (one 4x4 block, mode 2 =
    top). Spec edge rules: (0,0) predicts opaque black, rest of the top
    row predicts left, the left column predicts top; interior pixels use
    the block's mode."""
    bw = _BitWriter()
    _header(bw, 4, 2)
    bw.write(1, 1)
    bw.write(0, 2)  # PREDICTOR
    bw.write(0, 3)  # size_bits = 2 -> 4x4 blocks -> 1x1 sub-image
    _literal_image(bw, [(0, 0, 2, 0)])  # mode 2 in the green byte
    bw.write(0, 1)  # no more transforms
    # main image residuals (a, r, g, b); top row then second row
    residuals = [
        (255, 9, 8, 7),  # (0,0): + (255,0,0,0) -> a wraps to 254
        (0, 1, 1, 1),  # (1,0): + left
        (0, 1, 1, 1),  # (2,0): + left
        (0, 1, 1, 1),  # (3,0): + left
        (0, 5, 5, 5),  # (0,1): + top
        (0, 2, 2, 2),  # (1,1): mode 2 -> + top
        (0, 3, 3, 3),  # (2,1)
        (0, 4, 4, 4),  # (3,1)
    ]
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    gs = {g: 1 for _, _, g, _ in residuals}
    rs = {r: 1 for _, r, _, _ in residuals}
    bs = {b: 1 for _, _, _, b in residuals}
    as_ = {a: 1 for a, _, _, _ in residuals}
    g_tab = _write_huffman_code(bw, gs, 280)
    r_tab = _write_huffman_code(bw, rs, 256)
    b_tab = _write_huffman_code(bw, bs, 256)
    a_tab = _write_huffman_code(bw, as_, 256)
    _write_huffman_code(bw, {0: 1}, 40)
    for a, r, g, b in residuals:
        _emit(bw, g_tab, g)
        _emit(bw, r_tab, r)
        _emit(bw, b_tab, b)
        _emit(bw, a_tab, a)
    ras, _ = decode_webp_raw(_container(bw.done()))
    # hand-reconstructed RGB (alpha dropped by the raster contract):
    # top row: (9,8,7), then +1 cumulative left three times
    # second row: column 0 = top + 5; then + top (mode 2)
    top = [[9, 8, 7], [10, 9, 8], [11, 10, 9], [12, 11, 10]]
    second = [
        [14, 13, 12],
        [12, 11, 10],
        [14, 13, 12],
        [16, 15, 14],
    ]
    assert ras.tolist() == [top, second]


def test_golden_color_transform():
    """2x1 COLOR transform, one block, green_to_red = 2 (so red gains
    (2 * int8(green)) >> 5), other deltas zero."""
    bw = _BitWriter()
    _header(bw, 2, 1)
    bw.write(1, 1)
    bw.write(1, 2)  # COLOR
    bw.write(0, 3)  # size_bits = 2
    # cte pixel: blue byte = green_to_red = 2; green/red bytes zero
    _literal_image(bw, [(0, 0, 0, 2)])
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    pixels = [(255, 10, 64, 20), (255, 100, 160, 30)]
    gs = {g: 1 for _, _, g, _ in pixels}
    g_tab = _write_huffman_code(bw, gs, 280)
    r_tab = _write_huffman_code(bw, {r: 1 for _, r, _, _ in pixels}, 256)
    b_tab = _write_huffman_code(bw, {b: 1 for _, _, _, b in pixels}, 256)
    a_tab = _write_huffman_code(bw, {255: 1}, 256)
    _write_huffman_code(bw, {0: 1}, 40)
    for a, r, g, b in pixels:
        _emit(bw, g_tab, g)
        _emit(bw, r_tab, r)
        _emit(bw, b_tab, b)
        _emit(bw, a_tab, a)
    ras, _ = decode_webp_raw(_container(bw.done()))
    # delta(2, g): g=64 -> (2*64)>>5 = 4; g=160 -> int8 = -96 -> (2*-96)>>5 = -6
    assert ras.tolist() == [[[14, 64, 20], [94, 160, 30]]]


def test_golden_color_indexing_packed():
    """5x2 COLOR_INDEXING with a 4-entry palette: pbits=2 -> 4 indices
    packed per coded green byte, coded width ceil(5/4)=2, the row tail
    beyond width 5 discarded. Palette entries are delta-coded."""
    palette = [(10, 20, 30), (40, 50, 60), (70, 80, 90), (200, 210, 220)]
    bw = _BitWriter()
    _header(bw, 5, 2)
    bw.write(1, 1)
    bw.write(3, 2)  # COLOR_INDEXING
    bw.write(3, 8)  # palette size - 1
    # palette image: first entry raw, others per-channel deltas
    pal_px = []
    prev = (0, 0, 0)
    for r, g, b in palette:
        pal_px.append((255 if not pal_px else 0, (r - prev[0]) % 256,
                       (g - prev[1]) % 256, (b - prev[2]) % 256))
        prev = (r, g, b)
    _literal_image(bw, pal_px)
    bw.write(0, 1)  # no more transforms
    # indices row0: 0 1 2 3 0 ; row1: 3 2 1 0 1
    # packed 2-bit LSB-first: row0 -> [0|1<<2|2<<4|3<<6]=0b11100100=228,
    # then [0] ; row1 -> [3|2<<2|1<<4|0<<6]=0b00011011=27, then [1]
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    greens = [228, 0, 27, 1]
    g_tab = _write_huffman_code(bw, {g: 1 for g in greens}, 280)
    r_tab = _write_huffman_code(bw, {0: 1}, 256)
    b_tab = _write_huffman_code(bw, {0: 1}, 256)
    a_tab = _write_huffman_code(bw, {255: 1}, 256)
    _write_huffman_code(bw, {0: 1}, 40)
    for g in greens:
        _emit(bw, g_tab, g)
        _emit(bw, r_tab, 0)
        _emit(bw, b_tab, 0)
        _emit(bw, a_tab, 255)
    ras, _ = decode_webp_raw(_container(bw.done()))
    exp0 = [list(palette[i]) for i in (0, 1, 2, 3, 0)]
    exp1 = [list(palette[i]) for i in (3, 2, 1, 0, 1)]
    assert ras.tolist() == [exp0, exp1]


def test_golden_meta_huffman_groups():
    """8x1 with a meta-Huffman image at block bits 2: two 4-pixel blocks
    mapped to two different single-symbol code groups — pixels take their
    block's group color with zero per-pixel bits."""
    bw = _BitWriter()
    _header(bw, 8, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(1, 1)  # meta-Huffman present
    bw.write(0, 3)  # huffman_bits = 2 -> 2 meta pixels
    # meta sub-image: group index in (red<<8)|green -> greens 0 and 1
    _literal_image(bw, [(0, 0, 0, 0), (0, 0, 1, 0)])
    # group 0: all single-symbol codes -> pixel (40, 1, 60)
    for freqs, alpha in (
        ({1: 1}, 280), ({40: 1}, 256), ({60: 1}, 256), ({255: 1}, 256), ({0: 1}, 40),
    ):
        _write_huffman_code(bw, freqs, alpha)
    # group 1: pixel (80, 9, 120)
    for freqs, alpha in (
        ({9: 1}, 280), ({80: 1}, 256), ({120: 1}, 256), ({255: 1}, 256), ({0: 1}, 40),
    ):
        _write_huffman_code(bw, freqs, alpha)
    # zero data bits per pixel: all codes are single-symbol
    ras, _ = decode_webp_raw(_container(bw.done()))
    assert ras.tolist() == [[[40, 1, 60]] * 4 + [[80, 9, 120]] * 4]


# --------------------------------------------------------------------------
# hostile inputs
# --------------------------------------------------------------------------


def test_rejects_dimension_bomb_before_allocation():
    bw = _BitWriter()
    _header(bw, 16384, 16384)  # 268M pixels > 64M cap
    with pytest.raises(ValueError, match="dimension bomb"):
        decode_webp_raw(_container(bw.done() + b"\x00" * 64))


def test_rejects_truncated_stream():
    blob = webp_encode(np.full((8, 8, 3), 9, np.uint8))
    with pytest.raises(ValueError):
        decode_webp_raw(blob[: len(blob) - 6] )


def test_rejects_non_vp8l_container():
    with pytest.raises(ValueError, match="lossy"):
        decode_webp_raw(b"RIFF\x10\x00\x00\x00WEBPVP8 \x04\x00\x00\x00abcd")
    with pytest.raises(ValueError):
        decode_webp_raw(b"not a webp at all, definitely")


def test_rejects_out_of_bounds_backref():
    """A backref whose distance exceeds the pixels decoded so far."""
    bw = _BitWriter()
    _header(bw, 4, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    g_tab = _write_huffman_code(bw, {5: 1, 10: 1, 257: 1}, 280)
    r_tab = _write_huffman_code(bw, {0: 1}, 256)
    b_tab = _write_huffman_code(bw, {0: 1}, 256)
    a_tab = _write_huffman_code(bw, {255: 1}, 256)
    d_tab = _write_huffman_code(bw, {30: 1}, 40)  # huge distance prefix
    _emit(bw, g_tab, 5)
    _emit(bw, r_tab, 0)
    _emit(bw, b_tab, 0)
    _emit(bw, a_tab, 255)
    _emit(bw, g_tab, 257)  # length 2
    _emit(bw, d_tab, 30)
    bw.write(0xFFFF, 14)  # extra distance bits
    with pytest.raises(ValueError):
        decode_webp_raw(_container(bw.done()))


# --------------------------------------------------------------------------
# multimodal integration
# --------------------------------------------------------------------------


def test_multimodal_dispatch_decodes_webp():
    from pincspark.operators.multimodal import _decode_image_bytes

    px = np.zeros((8, 8, 3), np.uint8)
    px[..., 0] = np.arange(8) * 30
    px[..., 1] = 128
    blob = webp_encode(px)
    got = _decode_image_bytes(blob, 4)
    assert got is not None
    mean, feats = got
    lum = px.astype(np.float64).sum() / 3.0 / 64.0 / 255.0
    assert abs(mean - lum) < 1e-9
    assert len(feats) == 4


# --------------------------------------------------------------------------
# review-finding regressions (spec-conformance fixes)
# --------------------------------------------------------------------------


def test_golden_predictor_tr_rightmost_uses_current_row_leftmost():
    """Mode 3 (top-right) at x = w-1: the spec addresses the pixel AFTER
    (w-1, y-1) in scanline order — the CURRENT row's leftmost pixel, not
    the row above's (the original implementation's bug)."""
    bw = _BitWriter()
    _header(bw, 2, 2)
    bw.write(1, 1)
    bw.write(0, 2)  # PREDICTOR
    bw.write(0, 3)  # size_bits = 2 -> one block
    _literal_image(bw, [(0, 0, 3, 0)])  # mode 3 = TR
    bw.write(0, 1)  # no more transforms
    residuals = [
        (255, 10, 10, 10),  # (0,0): + black -> a=254, rgb=(10,10,10)
        (0, 1, 1, 1),  # (1,0): + L -> (11,11,11)
        (0, 5, 5, 5),  # (0,1): + T -> (15,15,15)
        (0, 2, 2, 2),  # (1,1): mode 3 -> + TR = current row leftmost
    ]
    bw.write(0, 1)
    bw.write(0, 1)
    g_tab = _write_huffman_code(bw, {g: 1 for _, _, g, _ in residuals}, 280)
    r_tab = _write_huffman_code(bw, {r: 1 for _, r, _, _ in residuals}, 256)
    b_tab = _write_huffman_code(bw, {b: 1 for _, _, _, b in residuals}, 256)
    a_tab = _write_huffman_code(bw, {a: 1 for a, _, _, _ in residuals}, 256)
    _write_huffman_code(bw, {0: 1}, 40)
    for a, r, g, b in residuals:
        _emit(bw, g_tab, g)
        _emit(bw, r_tab, r)
        _emit(bw, b_tab, b)
        _emit(bw, a_tab, a)
    ras, _ = decode_webp_raw(_container(bw.done()))
    # (1,1) = 2 + TR where TR = (0,1) = (15,15,15) -> (17,17,17); the old
    # row-above-leftmost bug would have given 2 + (10,10,10) = (12,12,12)
    assert ras.tolist() == [
        [[10, 10, 10], [11, 11, 11]],
        [[15, 15, 15], [17, 17, 17]],
    ]


def test_golden_predictor_mode13_truncates_toward_zero():
    """ClampAddSubtractHalf: ave + (ave - TL)/2 with C truncation. For
    ave=100, TL=103 the spec gives 100 + (-1) = 99; a floor shift gives
    98."""
    bw = _BitWriter()
    _header(bw, 2, 2)
    bw.write(1, 1)
    bw.write(0, 2)
    bw.write(0, 3)
    _literal_image(bw, [(0, 0, 13, 0)])  # mode 13
    bw.write(0, 1)
    residuals = [
        (255, 103, 103, 103),  # (0,0): TL = 103 after +black (a wraps)
        (0, 253, 253, 253),  # (1,0): + L -> 100
        (0, 253, 253, 253),  # (0,1): + T -> 100
        (0, 0, 0, 0),  # (1,1): + pred(13)
    ]
    bw.write(0, 1)
    bw.write(0, 1)
    g_tab = _write_huffman_code(bw, {g: 1 for _, _, g, _ in residuals}, 280)
    r_tab = _write_huffman_code(bw, {r: 1 for _, r, _, _ in residuals}, 256)
    b_tab = _write_huffman_code(bw, {b: 1 for _, _, _, b in residuals}, 256)
    a_tab = _write_huffman_code(bw, {a: 1 for a, _, _, _ in residuals}, 256)
    _write_huffman_code(bw, {0: 1}, 40)
    for a, r, g, b in residuals:
        _emit(bw, g_tab, g)
        _emit(bw, r_tab, r)
        _emit(bw, b_tab, b)
        _emit(bw, a_tab, a)
    ras, _ = decode_webp_raw(_container(bw.done()))
    # L = T = 100 -> ave = 100; TL = 103 -> pred = 100 + trunc(-3/2) = 99
    assert ras[1, 1].tolist() == [99, 99, 99]


def test_golden_predictor_after_color_indexing_runs_at_reduced_width():
    """COLOR_INDEXING then PREDICTOR (a legal read order): the predictor
    must invert on the still-index-packed reduced-width image — the
    original code reshaped to full width and raised on this stream."""
    palette = [(10, 20, 30), (40, 50, 60), (70, 80, 90), (200, 210, 220)]
    bw = _BitWriter()
    _header(bw, 5, 1)
    bw.write(1, 1)
    bw.write(3, 2)  # COLOR_INDEXING (read first: reduces width 5 -> 2)
    bw.write(3, 8)
    pal_px = []
    prev = (0, 0, 0)
    for r, g, b in palette:
        pal_px.append((255 if not pal_px else 0, (r - prev[0]) % 256,
                       (g - prev[1]) % 256, (b - prev[2]) % 256))
        prev = (r, g, b)
    _literal_image(bw, pal_px)
    bw.write(1, 1)
    bw.write(0, 2)  # PREDICTOR (read second: operates on width 2)
    bw.write(0, 3)
    _literal_image(bw, [(0, 0, 1, 0)])  # mode 1 (L) — unused on a 1-row
    bw.write(0, 1)  # no more transforms
    # coded pixels (width 2), residuals relative to the predictor:
    # (0,0) + black; (1,0) + L. Packed greens must come out [228, 0]
    # (indices 0 1 2 3 | 0...) -> residual greens 228 and (0-228)%256=28
    residuals = [(0, 0, 228, 0), (0, 0, 28, 0)]
    bw.write(0, 1)
    bw.write(0, 1)
    g_tab = _write_huffman_code(bw, {228: 1, 28: 1}, 280)
    r_tab = _write_huffman_code(bw, {0: 1}, 256)
    b_tab = _write_huffman_code(bw, {0: 1}, 256)
    a_tab = _write_huffman_code(bw, {0: 1}, 256)
    _write_huffman_code(bw, {0: 1}, 40)
    for a, r, g, b in residuals:
        _emit(bw, g_tab, g)
        _emit(bw, r_tab, r)
        _emit(bw, b_tab, b)
        _emit(bw, a_tab, a)
    ras, _ = decode_webp_raw(_container(bw.done()))
    assert ras.tolist() == [[list(palette[i]) for i in (0, 1, 2, 3, 0)]]


def test_simple_code_cannot_truncate_length_symbols():
    """A 2-symbol alphabet containing a length/cache symbol >= 256 must
    take the normal-code path (simple codes are 8-bit-limited; the
    original helper silently truncated 257 to 1)."""
    bw = _BitWriter()
    tab = _write_huffman_code(bw, {10: 1, 257: 1}, 280)
    blob = bw.done()
    from pincspark.operators.webp import _BitReader, _read_huffman_code

    h = _read_huffman_code(_BitReader(blob), 280)
    for sym in (10, 257):
        bw2 = _BitWriter()
        bw2.write_code(*tab[sym])
        assert h.read(_BitReader(bw2.done())) == sym


def test_encoder_rejects_blobs_its_decoder_would_refuse():
    """Encoder and decoder share the CPU-sized 1M-pixel cap."""
    with pytest.raises(ValueError, match="pixel cap"):
        webp_encode(np.zeros((1025, 1025, 3), np.uint8))


def test_palette_index_beyond_palette_decodes_as_zero():
    """4x1 COLOR_INDEXING with a 3-entry palette: 2-bit packing makes
    index 3 representable but out of range. libwebp pads the color map
    with zeros and decodes such files, so the padded pixel must come back
    transparent black instead of the file being rejected (ADVICE r7)."""
    palette = [(10, 20, 30), (40, 50, 60), (70, 80, 90)]
    bw = _BitWriter()
    _header(bw, 4, 1)
    bw.write(1, 1)
    bw.write(3, 2)  # COLOR_INDEXING
    bw.write(2, 8)  # palette size - 1 = 2 -> 2-bit packed indices
    pal_px = []
    prev = (0, 0, 0)
    for r, g, b in palette:
        pal_px.append((255 if not pal_px else 0, (r - prev[0]) % 256,
                       (g - prev[1]) % 256, (b - prev[2]) % 256))
        prev = (r, g, b)
    _literal_image(bw, pal_px)
    bw.write(0, 1)  # no more transforms
    # indices 0 1 2 3 packed LSB-first 2-bit -> one coded byte 228
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    g_tab = _write_huffman_code(bw, {228: 1}, 280)
    r_tab = _write_huffman_code(bw, {0: 1}, 256)
    b_tab = _write_huffman_code(bw, {0: 1}, 256)
    a_tab = _write_huffman_code(bw, {255: 1}, 256)
    _write_huffman_code(bw, {0: 1}, 40)
    _emit(bw, g_tab, 228)
    _emit(bw, r_tab, 0)
    _emit(bw, b_tab, 0)
    _emit(bw, a_tab, 255)
    ras, _ = decode_webp_raw(_container(bw.done()))
    assert ras.tolist() == [[[10, 20, 30], [40, 50, 60], [70, 80, 90], [0, 0, 0]]]


def test_huffman_lengths_are_depth_limited_on_skewed_histogram():
    """Fibonacci-like frequencies drive plain Huffman past the 15-bit spec
    cap with only ~20 distinct symbols — legal well under the pixel caps.
    The encoder must fall back to length-limited codes (package-merge)
    instead of raising (ADVICE r7): depth <= 15, Kraft equality (a full
    canonical code), and codes still round-trip through the decoder's
    table reader."""
    from pincspark.operators.webp import (
        _BitReader,
        _huffman_lengths,
        _package_merge_lengths,
        _read_huffman_code,
    )

    fib = [1, 1]
    while len(fib) < 22:
        fib.append(fib[-1] + fib[-2])
    freqs = {s: f for s, f in enumerate(fib)}
    lengths = _huffman_lengths(freqs)
    assert max(lengths.values()) <= 15
    assert sum(2 ** -l for l in lengths.values()) == 1.0

    # package-merge equals unconstrained Huffman cost when the cap is slack
    easy = {0: 5, 1: 4, 2: 3, 3: 2, 4: 1}
    plain = _huffman_lengths(easy)
    limited = _package_merge_lengths(easy, 15)
    assert sum(easy[s] * l for s, l in plain.items()) == sum(
        easy[s] * l for s, l in limited.items()
    )

    # the whole alphabet survives the on-wire code-length coding
    bw = _BitWriter()
    tab = _write_huffman_code(bw, freqs, 280)
    h = _read_huffman_code(_BitReader(bw.done()), 280)
    for sym in freqs:
        bw2 = _BitWriter()
        bw2.write_code(*tab[sym])
        assert h.read(_BitReader(bw2.done())) == sym
