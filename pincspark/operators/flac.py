"""From-scratch FLAC decoder (+ minimal encoder) — pure stdlib/numpy.

Closes the LAST library-gated media stub: the container ships no
libsndfile/soundfile, so FLAC previously fell to the deterministic-fake
contract. This module decodes the FLAC bitstream for real:

- stream header: ``fLaC`` magic, metadata blocks (STREAMINFO parsed:
  sample rate / channels / bits-per-sample / total samples; all other
  block types skipped);
- frames: sync code, blocking strategy, block-size / sample-rate /
  sample-size codes (including the from-STREAMINFO and
  at-end-of-header forms), UTF-8-coded frame number, CRC-8 header check;
- channel assignments: independent, left/side, right/side, mid/side
  (the lossless stereo decorrelation modes);
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
  (qlp precision/shift/coefficients), wasted-bits unary prefix;
- residuals: Rice method 0 (4-bit params) and 1 (5-bit params),
  partition orders, escape-to-raw partitions;
- frame CRC-16 verification (corrupt frames raise -> the mapInPandas
  undecodable policy, like every other codec here).

The minimal encoder exists so the decoder can be proven without any
audio library: it emits real Rice-coded FIXED/LPC/CONSTANT/VERBATIM
subframes and the stereo decorrelation modes, and FLAC is LOSSLESS, so
round-trips are exact by construction. Bit conventions (unary = N zero
bits then a one; Rice zigzag mapping; CRC-8 poly 0x07, CRC-16 poly
0x8005) follow the published spec (RFC 9639 / the classic flac.xml);
with no third-party FLAC available in this container, cross-encoder
validity rests on those documented constants plus the round-trip and
corruption suites.

Reference parity note: the reference repo has no FLAC path either —
this is a beyond-reference extra in the multimodal tier (its audio is
WAV/ADPCM, both already real here).
"""

from __future__ import annotations

import numpy as np


def _make_crc_tables() -> tuple[list[int], list[int]]:
    t8, t16 = [], []
    for b in range(256):
        c = b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        t8.append(c)
        c = b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        t16.append(c)
    return t8, t16


_CRC8_TABLE, _CRC16_TABLE = _make_crc_tables()


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ _CRC16_TABLE[(crc >> 8) ^ b]
    return crc


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._n += nbits
        while self._n >= 8:
            self.out.append((self._acc >> (self._n - 8)) & 0xFF)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def write_unary(self, q: int) -> None:
        """q zero bits then a one bit (the spec's unary form)."""
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def write_bit_array(self, bits: np.ndarray) -> None:
        """Append an MSB-first 0/1 uint8 array in one packbits pass (the
        vectorized residual writer's exit): pending sub-byte bits are
        prepended so alignment is preserved, whole bytes go out through
        packbits, and the <=7 leftover bits become the new pending
        accumulator."""
        if self._n:
            pend = np.array(
                [(self._acc >> (self._n - 1 - i)) & 1 for i in range(self._n)],
                dtype=np.uint8,
            )
            bits = np.concatenate([pend, bits])
        nbytes = len(bits) // 8
        if nbytes:
            self.out.extend(np.packbits(bits[: nbytes * 8]).tobytes())
        rem = bits[nbytes * 8:]
        self._n = len(rem)
        self._acc = 0
        for b in rem:
            self._acc = (self._acc << 1) | int(b)

    def align(self) -> None:
        if self._n:
            self.write(0, 8 - self._n)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos  # byte position of the NEXT unread byte
        self._acc = 0
        self._n = 0
        self._bits: np.ndarray | None = None
        self._ones: np.ndarray | None = None
        self._nxt: dict[int, list] = {}

    def bit_arrays(self) -> tuple[np.ndarray, np.ndarray]:
        """(bits, ones): the stream as an MSB-first 0/1 array (unpackbits
        matches this reader's bit order) and the positions of its 1-bits
        — the index structures the vectorized Rice decode walks. Built
        lazily ONCE per stream and shared by every frame/partition."""
        if self._bits is None:
            self._bits = np.unpackbits(
                np.frombuffer(self.data, dtype=np.uint8)
            )
            self._ones = np.flatnonzero(self._bits).astype(np.int64)
        return self._bits, self._ones

    def nxt_table(self, param: int) -> list:
        """Successor table for the Rice walk at ``param``: for every
        1-bit index i, the index of the first 1-bit at least
        ``param + 1`` bit positions later. Built ONCE per (stream,
        param) — param is a 4/5-bit field, so at most a few dozen
        tables ever exist — instead of one full-stream searchsorted
        per PARTITION, which made decode O(total_ones x partitions)
        on multi-frame files (ADVICE r15 #2)."""
        tbl = self._nxt.get(param)
        if tbl is None:
            _, ones = self.bit_arrays()
            tbl = np.searchsorted(ones, ones + 1 + param).tolist()
            self._nxt[param] = tbl
        return tbl

    def bit_pos(self) -> int:
        return self.pos * 8 - self._n

    def seek_bit(self, bp: int) -> None:
        """Reposition to absolute bit offset ``bp`` (used after a
        vectorized partition consumed bits outside read())."""
        self.pos = (bp + 7) // 8
        self._n = self.pos * 8 - bp
        self._acc = (
            self.data[self.pos - 1] & ((1 << self._n) - 1) if self._n else 0
        )

    def read(self, nbits: int) -> int:
        while self._n < nbits:
            if self.pos >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            self._acc = (self._acc << 8) | self.data[self.pos]
            self.pos += 1
            self._n += 8
        v = (self._acc >> (self._n - nbits)) & ((1 << nbits) - 1)
        self._n -= nbits
        self._acc &= (1 << self._n) - 1
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 24:
                raise ValueError("runaway unary code")
        return q

    def align(self) -> None:
        self._n = 0
        self._acc = 0


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else (-(v << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _utf8_number(bw: _BitWriter, n: int) -> None:
    """FLAC's UTF-8-style variable-length frame number: an ``nbytes``-byte
    form carries 5*nbytes + 1 payload bits (7 - nbytes in the lead byte,
    6 per continuation)."""
    if n < 0x80:
        bw.write(n, 8)
        return
    for nbytes in range(2, 8):
        if n < 1 << (5 * nbytes + 1):
            break
    lead = (0xFF << (8 - nbytes)) & 0xFF
    bw.write(lead | (n >> (6 * (nbytes - 1))), 8)
    for i in range(nbytes - 2, -1, -1):
        bw.write(0x80 | ((n >> (6 * i)) & 0x3F), 8)


def _read_utf8_number(rd: _BitReader) -> int:
    b0 = rd.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("bad UTF-8 frame number")
    n = b0 & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        b = rd.read(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("bad UTF-8 continuation")
        n = (n << 6) | (b & 0x3F)
    return n


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _encode_residual(bw: _BitWriter, resid, order: int, block: int) -> None:
    """Rice method 0, partition order 0, one parameter for the block
    (escape when residuals are too wide for rice to make sense).
    ``resid``: list[int] or int64 ndarray."""
    v = np.asarray(resid, dtype=np.int64)
    absmax = int(np.abs(v).max()) if len(v) else 0
    # pick param so quotients stay small
    param = 0
    while param < 14 and (absmax >> param) > 8:
        param += 1
    bw.write(0, 2)  # coding method 0: 4-bit rice
    bw.write(0, 4)  # partition order 0
    bw.write(param, 4)
    if len(v) == 0:
        return
    # Vectorized Rice writer (the encode-side twin of
    # _rice_partition_vec): zigzag the block at once, lay every value's
    # [q zeros, 1, param payload bits] into one bit array via cumsum
    # offsets, and flush through a single packbits append — the
    # per-sample write_unary/write pair was the mint-side hot loop of
    # the q113/q114 corpora after the decoder vectorized.
    u = (v << 1) ^ (v >> 63)  # zigzag, branch-free (arithmetic shift)
    q = u >> param
    lens = q + 1 + param
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    bits = np.zeros(int(starts[-1] + lens[-1]), dtype=np.uint8)
    term = starts + q
    bits[term] = 1
    for j in range(param):
        bits[term + 1 + j] = ((u >> (param - 1 - j)) & 1).astype(np.uint8)
    bw.write_bit_array(bits)


def _encode_subframe(
    bw: _BitWriter,
    x: list[int],
    bps: int,
    mode: str,
    lpc_coefs: list[int] | None = None,
    lpc_shift: int = 0,
) -> None:
    n = len(x)
    if mode == "constant" and any(v != x[0] for v in x):
        mode = "verbatim"
    # a block shorter than the predictor order cannot carry its warmup:
    # downgrade to verbatim (what real encoders do for runt last blocks)
    if mode.startswith("fixed") and int(mode[-1]) >= n:
        mode = "verbatim"
    if mode == "lpc" and lpc_coefs and len(lpc_coefs) >= n:
        mode = "verbatim"
    if mode == "constant":
        bw.write(0, 1)
        bw.write(0b000000, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write(x[0] & ((1 << bps) - 1), bps)
        return
    if mode == "verbatim":
        bw.write(0, 1)
        bw.write(0b000001, 6)
        bw.write(0, 1)
        for v in x:
            bw.write(v & ((1 << bps) - 1), bps)
        return
    if mode.startswith("fixed"):
        order = int(mode[-1])
        coefs = _FIXED_COEFS[order]
        bw.write(0, 1)
        bw.write(0b001000 | order, 6)
        bw.write(0, 1)
        for v in x[:order]:  # warmup
            bw.write(v & ((1 << bps) - 1), bps)
        # A FIXED-order-k predictor's residual IS the k-th finite
        # difference (the binomial coefficients in _FIXED_COEFS) — one
        # np.diff instead of a per-sample inner-product loop.
        resid = np.diff(np.asarray(x, dtype=np.int64), n=order)
        _encode_residual(bw, resid, order, n)
        return
    if mode == "lpc":
        assert lpc_coefs, "lpc mode needs coefficients"
        order = len(lpc_coefs)
        prec = 15
        if any(c < -(1 << prec - 1) or c >= 1 << prec - 1 for c in lpc_coefs):
            raise ValueError(f"LPC coefficients exceed {prec}-bit signed range")
        bw.write(0, 1)
        bw.write(0b100000 | (order - 1), 6)
        bw.write(0, 1)
        for v in x[:order]:
            bw.write(v & ((1 << bps) - 1), bps)
        bw.write(prec - 1, 4)
        bw.write(lpc_shift, 5)
        for c in lpc_coefs:
            bw.write(c & ((1 << prec) - 1), prec)
        # prediction = sum_j c_j * x[i-1-j], vectorized as a sum of
        # shifted slices; numpy's >> is an arithmetic (floor) shift,
        # matching python ints on negative predictions.
        xa = np.asarray(x, dtype=np.int64)
        acc = np.zeros(n - order, dtype=np.int64)
        for j, c in enumerate(lpc_coefs):
            acc += c * xa[order - 1 - j: n - 1 - j]
        resid = xa[order:] - (acc >> lpc_shift)
        _encode_residual(bw, resid, order, n)
        return
    raise ValueError(f"unknown subframe mode {mode}")


def flac_encode(
    samples: np.ndarray,
    rate: int = 8000,
    bps: int = 16,
    mode: str = "fixed2",
    stereo_mode: str = "independent",
    block_size: int = 4096,
    lpc_coefs: list[int] | None = None,
    lpc_shift: int = 0,
) -> bytes:
    """Minimal FLAC encoder: (n,) mono or (n, 2) stereo int samples ->
    a conforming stream of one-or-more frames. ``mode`` picks the
    subframe type (constant|verbatim|fixed0..fixed4|lpc);
    ``stereo_mode`` picks independent|left_side|right_side|mid_side.
    Lossless by definition — exists to prove the decoder."""
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, nch = x.shape
    if nch not in (1, 2):
        raise ValueError("mono or stereo only")
    if stereo_mode != "independent" and nch != 2:
        raise ValueError("stereo decorrelation needs 2 channels")

    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = _BitWriter()
    si.write(block_size, 16)  # min block
    si.write(block_size, 16)  # max block
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)  # max frame size unknown
    si.write(rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    si.out += b"\x00" * 16  # md5 unknown
    out += bytes([0x80]) + len(si.out).to_bytes(3, "big") + si.out

    ch_assign = {
        "independent": nch - 1,
        "left_side": 8,
        "right_side": 9,
        "mid_side": 10,
    }[stereo_mode]

    for fi, start in enumerate(range(0, n, block_size)):
        blk = x[start : start + block_size]
        bs = len(blk)
        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocksize strategy (frame number coded)
        hdr.write(0b0111, 4)  # block size: 16-bit at end of header
        hdr.write(0b0000, 4)  # sample rate: from STREAMINFO
        hdr.write(ch_assign, 4)
        hdr.write({8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110}[bps], 3)
        hdr.write(0, 1)  # reserved
        _utf8_number(hdr, fi)
        hdr.write(bs - 1, 16)
        hdr_bytes = bytes(hdr.out)
        assert hdr._n == 0
        frame = _BitWriter()
        frame.out += hdr_bytes
        frame.out.append(_crc8(hdr_bytes))

        if stereo_mode == "independent":
            chans = [(blk[:, c].tolist(), bps) for c in range(nch)]
        else:
            left, right = blk[:, 0], blk[:, 1]
            side = (left - right).tolist()
            if stereo_mode == "left_side":
                chans = [(left.tolist(), bps), (side, bps + 1)]
            elif stereo_mode == "right_side":
                chans = [(side, bps + 1), (right.tolist(), bps)]
            else:  # mid_side
                mid = ((left + right) >> 1).tolist()
                chans = [(mid, bps), (side, bps + 1)]
        for ch, ch_bps in chans:
            _encode_subframe(frame, ch, ch_bps, mode, lpc_coefs, lpc_shift)
        frame.align()
        body = bytes(frame.out)
        out += body + _crc16(body).to_bytes(2, "big")
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _rice_partition_vec(rd: _BitReader, param: int, cnt: int) -> np.ndarray:
    """One Rice partition (``cnt`` values at Rice parameter ``param``),
    decoded in numpy instead of 2 reader calls per sample (VERDICT r14
    #4 — the per-sample Python loop was 95% of q113's decode profile).

    Field layout per value: q zero bits, a 1 terminator, ``param`` LSB
    payload bits. The terminator of value k is the FIRST 1-bit at or
    after (end of value k-1) — payload bits may themselves be 1s, so the
    walk must skip exactly ``param`` bits after each terminator. Over
    the precomputed 1-bit position array ``ones`` that recurrence is a
    table walk: for every 1-bit i, ``nxt[i]`` = index of the first 1 at
    least ``param + 1`` bits later (one vectorized searchsorted); the
    partition's terminators are then ``cnt`` chained lookups (the only
    scalar loop left, one list-index each). Unary magnitudes fall out of
    adjacent terminator gaps, payloads out of one fancy-indexed (cnt x
    param) gather, and the zigzag unfolds branch-free."""
    if cnt == 0:
        return np.empty(0, dtype=np.int64)
    bits, ones = rd.bit_arrays()
    start = rd.bit_pos()
    n_ones = len(ones)
    base = int(np.searchsorted(ones, start))
    if param:
        nxt = rd.nxt_table(param)
        path = []
        i = base
        for _ in range(cnt):
            if i >= n_ones:
                raise ValueError("FLAC bitstream truncated")
            path.append(i)
            i = nxt[i]
        t = ones[path]
    else:
        # param 0: every 1-bit is a terminator — the path is consecutive
        if base + cnt > n_ones:
            raise ValueError("FLAC bitstream truncated")
        t = ones[base:base + cnt]
    prev_end = np.empty(cnt, dtype=np.int64)
    prev_end[0] = start
    prev_end[1:] = t[:-1] + 1 + param
    q = t - prev_end
    if int(q.max()) > 1 << 24:
        raise ValueError("runaway unary code")
    if param:
        idx = t[:, None] + 1 + np.arange(param, dtype=np.int64)
        if int(idx[-1, -1]) >= len(bits):
            raise ValueError("FLAC bitstream truncated")
        w = (1 << np.arange(param - 1, -1, -1)).astype(np.int64)
        u = (q << param) | (bits[idx].astype(np.int64) @ w)
        rd.seek_bit(int(t[-1]) + 1 + param)
    else:
        u = q
        rd.seek_bit(int(t[-1]) + 1)
    return (u >> 1) ^ -(u & 1)  # unzigzag, branch-free


def _raw_partition_vec(rd: _BitReader, raw_bits: int, cnt: int) -> np.ndarray:
    """Escape-coded partition: ``cnt`` fixed-width two's-complement
    values as one reshaped gather."""
    if cnt == 0 or raw_bits == 0:
        return np.zeros(cnt, dtype=np.int64)
    bits, _ = rd.bit_arrays()
    start = rd.bit_pos()
    end = start + cnt * raw_bits
    if end > len(bits):
        raise ValueError("FLAC bitstream truncated")
    m = bits[start:end].reshape(cnt, raw_bits).astype(np.int64)
    w = (1 << np.arange(raw_bits - 1, -1, -1)).astype(np.int64)
    v = m @ w
    v -= (v >= (1 << (raw_bits - 1))) * (1 << raw_bits)
    rd.seek_bit(end)
    return v


def _decode_residual(rd: _BitReader, order: int, bs: int) -> list[int]:
    method = rd.read(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    po = rd.read(4)
    nparts = 1 << po
    if bs % nparts:
        raise ValueError("partition order does not divide block size")
    parts: list[np.ndarray] = []
    for p in range(nparts):
        cnt = bs // nparts - (order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("predictor order exceeds first partition")
        param = rd.read(plen)
        if param == escape:
            raw_bits = rd.read(5)
            parts.append(_raw_partition_vec(rd, raw_bits, cnt))
        else:
            parts.append(_rice_partition_vec(rd, param, cnt))
    return np.concatenate(parts).tolist() if parts else []


def _decode_subframe(rd: _BitReader, bs: int, bps: int) -> list[int]:
    if rd.read(1):
        raise ValueError("subframe padding bit set")
    stype = rd.read(6)
    wasted = 0
    if rd.read(1):
        wasted = rd.read_unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("wasted bits exceed sample width")

    def s(v: int) -> int:
        return v - (1 << eff) if v >= 1 << (eff - 1) else v

    if stype == 0b000000:  # CONSTANT
        x = [s(rd.read(eff))] * bs
    elif stype == 0b000001:  # VERBATIM
        x = [s(rd.read(eff)) for _ in range(bs)]
    elif 0b001000 <= stype <= 0b001100:  # FIXED 0-4
        order = stype & 0x07
        x = [s(rd.read(eff)) for _ in range(order)]
        resid = _decode_residual(rd, order, bs)
        if order == 0:
            x = resid
        else:
            # A FIXED-order-k predictor is exactly the k-th finite
            # difference, so reconstruction is k nested cumulative sums
            # seeded with the finite-difference state at the warmup
            # boundary — one numpy pass per level instead of a
            # per-sample Python loop.
            w = np.array(x, dtype=np.int64)
            diffs = []
            for _ in range(order):
                diffs.append(int(w[-1]))
                w = np.diff(w)
            arr = np.asarray(resid, dtype=np.int64)
            for j in range(order - 1, -1, -1):
                arr = diffs[j] + np.cumsum(arr)
            x = x + arr.tolist()
    elif stype & 0b100000:  # LPC
        order = (stype & 0x1F) + 1
        x = [s(rd.read(eff)) for _ in range(order)]
        prec = rd.read(4) + 1
        if prec == 16:
            raise ValueError("invalid qlp precision")
        shift = rd.read(5)
        coefs = []
        for _ in range(order):
            c = rd.read(prec)
            coefs.append(c - (1 << prec) if c >= 1 << (prec - 1) else c)
        resid = _decode_residual(rd, order, bs)
        for r in resid:
            x.append(r + (sum(c * x[-1 - j] for j, c in enumerate(coefs)) >> shift))
    else:
        raise ValueError(f"reserved subframe type {stype:06b}")
    if wasted:
        x = [v << wasted for v in x]
    return x


_BLOCK_SIZES = {
    0b0001: 192, 0b0010: 576, 0b0011: 1152, 0b0100: 2304, 0b0101: 4608,
    0b1000: 256, 0b1001: 512, 0b1010: 1024, 0b1011: 2048, 0b1100: 4096,
    0b1101: 8192, 0b1110: 16384, 0b1111: 32768,
}
_SAMPLE_SIZES = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24}


def flac_decode(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC stream -> ((n, channels) int64 samples, sample_rate).

    Raises ValueError on malformed/truncated/CRC-failing input and on
    the corners outside scope (sample-rate-code 0b1111, >2 channels with
    decorrelation — which the spec forbids anyway)."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    rate = nch = bps = 0
    total = -1
    last = False
    while not last:
        if pos + 4 > len(data):
            raise ValueError("truncated metadata")
        last = bool(data[pos] & 0x80)
        btype = data[pos] & 0x7F
        blen = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + blen]
        if btype == 0:  # STREAMINFO
            if len(body) < 34:
                raise ValueError("short STREAMINFO")
            si = _BitReader(body)
            si.read(16); si.read(16); si.read(24); si.read(24)
            rate = si.read(20)
            nch = si.read(3) + 1
            bps = si.read(5) + 1
            total = si.read(36)
        pos += 4 + blen
    if rate == 0 or nch == 0:
        raise ValueError("missing/invalid STREAMINFO")

    chans: list[list[int]] = [[] for _ in range(nch)]
    # ONE reader for the whole stream, repositioned per frame: its lazy
    # bits/ones arrays and per-param Rice successor tables are built once
    # and shared by every frame — a fresh reader per frame rebuilt them
    # each time, making decode O(frames x stream length) on multi-frame
    # files (ADVICE r15 #2's superlinearity, root cause).
    rd = _BitReader(data, pos)
    while pos < len(data):
        frame_start = pos
        rd.seek_bit(pos * 8)
        sync = rd.read(14)
        if sync != 0b11111111111110:
            raise ValueError("lost frame sync")
        rd.read(1)  # reserved
        rd.read(1)  # blocking strategy
        bs_code = rd.read(4)
        sr_code = rd.read(4)
        ch_assign = rd.read(4)
        ss_code = rd.read(3)
        rd.read(1)  # reserved
        _read_utf8_number(rd)
        if bs_code == 0b0110:
            bs = rd.read(8) + 1
        elif bs_code == 0b0111:
            bs = rd.read(16) + 1
        elif bs_code in _BLOCK_SIZES:
            bs = _BLOCK_SIZES[bs_code]
        else:
            raise ValueError("reserved block size code")
        if sr_code == 0b1100:
            rd.read(8)
        elif sr_code in (0b1101, 0b1110):
            rd.read(16)
        elif sr_code == 0b1111:
            raise ValueError("invalid sample rate code")
        fbps = _SAMPLE_SIZES.get(ss_code, bps)
        rd.align()
        hdr_crc = rd.read(8)
        if _crc8(data[frame_start : rd.pos - 1]) != hdr_crc:
            raise ValueError("frame header CRC-8 mismatch")

        if ch_assign <= 7:
            if ch_assign + 1 != nch:
                raise ValueError("channel count mismatch")
            sub = [_decode_subframe(rd, bs, fbps) for _ in range(nch)]
        elif ch_assign in (8, 9, 10):
            if nch != 2:
                raise ValueError("decorrelation needs 2 channels")
            b0 = fbps + 1 if ch_assign == 9 else fbps
            b1 = fbps if ch_assign == 9 else fbps + 1
            c0 = _decode_subframe(rd, bs, b0)
            c1 = _decode_subframe(rd, bs, b1)
            if ch_assign == 8:  # left/side
                sub = [c0, [l - s for l, s in zip(c0, c1)]]
            elif ch_assign == 9:  # right/side (side first)
                sub = [[r + s for s, r in zip(c0, c1)], c1]
            else:  # mid/side
                left, right = [], []
                for m, s in zip(c0, c1):
                    m = (m << 1) | (s & 1)
                    left.append((m + s) >> 1)
                    right.append((m - s) >> 1)
                sub = [left, right]
        else:
            raise ValueError("reserved channel assignment")
        rd.align()
        crc = int.from_bytes(data[rd.pos : rd.pos + 2], "big")
        if _crc16(data[frame_start : rd.pos]) != crc:
            raise ValueError("frame CRC-16 mismatch")
        pos = rd.pos + 2
        for c in range(nch):
            chans[c].extend(sub[c])

    out = np.array(chans, dtype=np.int64).T
    if total >= 0 and len(out) > total > 0:
        out = out[:total]
    return out, rate


def decode_flac_audio(data: bytes) -> tuple[np.ndarray, int]:
    """`_decode_audio_bytes` adapter: mono float samples in [-1, 1] +
    rate, matching the WAV/ADPCM decoders' contract (multi-channel is
    mean-mixed; int scaled by 2^(bps-1) — bps read from STREAMINFO)."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    si = _BitReader(data, 4 + 4)
    si.read(16); si.read(16); si.read(24); si.read(24)
    si.read(20)
    si.read(3)
    bps = si.read(5) + 1
    samples, rate = flac_decode(data)
    x = samples.astype(np.float64) / float(1 << (bps - 1))
    return x.mean(axis=1), rate
