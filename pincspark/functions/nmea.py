"""NMEA 0183 / AIS transport primitives: sentence tokenization (P1),
checksum validation (P2), 6-bit payload armoring (P3), bit-field extraction
(P4), and 6-bit ASCII text (P5).

Reference parity: ais_analysis.py:143-167 (checksum + armoring),
ais_parser.py:13-31 (bit slice + 6-bit text). Re-architected: instead of
building a Python bitstring and slicing it per field, the payload is decoded
once into an arbitrary-precision integer; every field extraction is then two
C-level bigint ops (shift + mask). This is the kernel the Arrow-batched
pandas UDF loops over (pincspark.decode.kernel).

Deliberate divergences from the reference (documented per SURVEY §7.5):
- out-of-range bit slices return 0 instead of raising (the reference crashes
  on short payloads, ais_parser.py:13-16);
- 6-bit text truncates at the first '@' padding char (ITU-R M.1371
  semantics); the reference instead maps any text containing '@@@@@' to
  'Not available' (ais_parser.py:31), which destroys real @-padded names.
  All-padding/empty strings still yield 'Not available'.
"""

from __future__ import annotations

# The 64-char payload armoring alphabet (ITU-R M.1371 / NMEA !AIVDM).
ARMORING = "0123456789:;<=>?@ABCDEFGHIJKLMNOPQRSTUVW`abcdefghijklmnopqrstuvw"
_SIXBIT = {c: i for i, c in enumerate(ARMORING)}

NOT_AVAILABLE = "Not available"


def checksum_ok(sentence: str) -> bool:
    """Validate the NMEA checksum: XOR of all chars between '!'/'$' and '*'
    equals the two hex digits after '*'."""
    try:
        star = sentence.rindex("*")
    except ValueError:
        return False
    body = sentence[1:star]
    declared = sentence[star + 1 : star + 3]
    x = 0
    for ch in body:
        x ^= ord(ch)
    try:
        return x == int(declared, 16)
    except ValueError:
        return False


def tokenize(sentence: str) -> dict:
    """Split an !xxVDM sentence into its comma fields.

    Returns package_type, total, num, seq_id, channel, payload, fill.
    """
    parts = sentence.split(",")
    if len(parts) < 7:
        raise ValueError(f"not a VDM sentence: {sentence!r}")
    tail = parts[6]
    fill = int(tail.split("*")[0]) if tail else 0
    return {
        "package_type": parts[0],
        "total": int(parts[1]) if parts[1] else 1,
        "num": int(parts[2]) if parts[2] else 1,
        "seq_id": int(parts[3]) if parts[3] else 0,
        "channel": parts[4],
        "payload": parts[5],
        "fill": fill,
    }


class Bits:
    """An AIS payload decoded to a single big integer.

    ``value`` holds the concatenated 6-bit groups MSB-first; ``nbits`` is the
    total bit length. Field extraction never allocates strings.
    """

    __slots__ = ("value", "nbits")

    def __init__(self, value: int, nbits: int):
        self.value = value
        self.nbits = nbits

    @classmethod
    def from_payload(cls, payload: str) -> "Bits":
        acc = 0
        n = 0
        for ch in payload:
            v = _SIXBIT.get(ch)
            if v is None:
                raise ValueError(f"invalid armoring char {ch!r}")
            acc = (acc << 6) | v
            n += 6
        return cls(acc, n)

    def u(self, start: int, length: int) -> int:
        """Unsigned bit-field [start, start+length). Bits beyond the payload
        end are clamped (short slice decodes as fewer bits; empty -> 0)."""
        if start >= self.nbits or length <= 0:
            return 0
        eff = min(length, self.nbits - start)
        shift = self.nbits - start - eff
        return (self.value >> shift) & ((1 << eff) - 1)

    def i(self, start: int, length: int) -> int:
        """Signed (two's-complement) bit-field with the same clamping."""
        if start >= self.nbits or length <= 0:
            return 0
        eff = min(length, self.nbits - start)
        raw = self.u(start, eff)
        if raw & (1 << (eff - 1)):
            raw -= 1 << eff
        return raw

    def tail_u(self, start: int) -> int:
        """Unsigned value of all bits from ``start`` to the end."""
        return self.u(start, self.nbits - start)

    def text_raw(self, start: int, length: int) -> str:
        """Raw 6-bit chars without padding/strip post-processing."""
        out = []
        pos = start
        end = min(start + length, self.nbits)
        while pos + 6 <= end:
            code = self.u(pos, 6)
            out.append(chr(code + 64) if code < 32 else chr(code))
            pos += 6
        return "".join(out)

    def text(self, start: int, length: int) -> str:
        """6-bit ASCII string field: chars < 32 shift into '@'..'_'.

        Truncates at the first '@' (padding); strips; empty -> NOT_AVAILABLE.
        """
        out = []
        pos = start
        end = min(start + length, self.nbits)
        while pos + 6 <= end:
            code = self.u(pos, 6)
            out.append(chr(code + 64) if code < 32 else chr(code))
            pos += 6
        s = "".join(out)
        at = s.find("@")
        if at != -1:
            s = s[:at]
        s = s.strip()
        return s if s else NOT_AVAILABLE
