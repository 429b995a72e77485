"""The decode kernel (§2.9): one Arrow-batched pandas UDF turning an AIS
payload column into the typed ``catalog.DECODED`` struct, plus pure-SQL
column-expression fast paths for the routing fields (messageType, mmsi) and
checksum validation so Catalyst can filter/prune BEFORE the Python stage.

Scale design: the UDF is the only Python hop in the pipeline; everything
upstream (checksum filter, type routing) and downstream (family projection,
joins, aggs) is JVM-side. Routing filters use the SQL fast path, so a query
that only wants types 1/2/3 never pays Python decode for type-8 weather
blobs. The reference decodes row-at-a-time dicts in-process
(ais_analysis.py:170-245); here a 10k-row Arrow batch costs one Python call.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from pincspark.catalog import DECODED, FAMILY_SCHEMAS
from pincspark.decode.families import decode_message
from pincspark.functions.nmea import Bits

_TOP_COLS = ["messageType", "repeat", "mmsi", "family"] + list(FAMILY_SCHEMAS)


def decode_payload(payload: str) -> dict:
    """Decode one (possibly multi-part concatenated) armored payload into the
    nested record shape of ``catalog.DECODED``. Invalid payloads yield an
    all-null record."""
    try:
        b = Bits.from_payload(payload)
        rec = decode_message(b)
    except (ValueError, KeyError):
        return {c: None for c in _TOP_COLS}
    out = {c: None for c in _TOP_COLS}
    out["messageType"] = rec["messageType"]
    out["repeat"] = rec["repeat"]
    out["mmsi"] = rec["mmsi"]
    out["family"] = rec["family"]
    if rec["family"] is not None:
        out[rec["family"]] = rec["payload_fields"]
    return out


@pandas_udf(DECODED)
def decode_udf(payload: pd.Series) -> pd.DataFrame:
    recs = [decode_payload(p) if p is not None else {c: None for c in _TOP_COLS}
            for p in payload]
    return pd.DataFrame.from_records(recs, columns=_TOP_COLS)


def decode_ais(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Attach the decoded struct as column ``ais``. Select families with
    e.g. ``df.select("ais.mmsi", "ais.position.*")``."""
    return df.withColumn("ais", decode_udf(F.col(payload_col)))


# ---------------------------------------------------------------------------
# Pure-SQL fast paths (JVM-side, whole-stage-codegen'd)
# ---------------------------------------------------------------------------


def armor_value(ch: Column) -> Column:
    """6-bit value of one armoring char: ascii-48, minus 8 above 40
    (equivalent to the 64-char table lookup, ais_analysis.py:157-166)."""
    v = F.ascii(ch) - F.lit(48)
    return F.when(v > 40, v - 8).otherwise(v)


def _char_val(payload: Column, i: int) -> Column:
    return armor_value(F.substring(payload, i + 1, 1))


def routing_message_type(payload: Column) -> Column:
    """messageType (bits 0-6) without Python: the first payload char.
    NULL on an empty payload (the Python path raises; the SQL fast path
    must not fabricate a value from ascii('') = 0)."""
    return F.when(F.length(payload) >= 1, _char_val(payload, 0)).otherwise(F.lit(None))


def routing_mmsi(payload: Column) -> Column:
    """mmsi (bits 8-38) as a pure column expression over chars 1..6.
    NULL when the payload is shorter than 7 chars (see routing_message_type)."""
    v = [_char_val(payload, i) for i in range(7)]
    val = (
        (v[1].bitwiseAND(F.lit(15)) * F.lit(1 << 26))
        + (v[2] * F.lit(1 << 20))
        + (v[3] * F.lit(1 << 14))
        + (v[4] * F.lit(1 << 8))
        + (v[5] * F.lit(1 << 2))
        + F.shiftright(v[6], 4)
    ).cast("bigint")
    return F.when(F.length(payload) >= 7, val).otherwise(F.lit(None))


def bitfield(payload: Column, start: int, nbits: int, signed: bool = False) -> Column:
    """P4 as a pure column expression for ANY fixed bit span: fold the
    covering armored chars into one integer, shift/mask/sign-extend. All
    int64 arithmetic — whole-stage codegen, and portable verbatim to the
    SQL oracle (see ``bitfield_sql``). Practical up to ~50-bit fields
    (the fold value stays within int64).

    NULL when the payload does not cover the span: substring past the end
    yields '' and ascii('') = 0 would otherwise fold to plausible-looking
    garbage (the Python kernel clamps instead — callers that want the
    clamping semantics go through the pandas kernel)."""
    i0, i1 = start // 6, (start + nbits - 1) // 6
    acc: Column = F.lit(0).cast("bigint")
    for i in range(i0, i1 + 1):
        acc = acc * F.lit(64) + _char_val(payload, i).cast("bigint")
    shift = (i1 + 1) * 6 - (start + nbits)
    val = F.shiftright(acc, shift).bitwiseAND(F.lit((1 << nbits) - 1))
    if signed:
        val = F.when(val >= F.lit(1 << (nbits - 1)), val - F.lit(1 << nbits)).otherwise(val)
    return F.when(F.length(payload) >= i1 + 1, val).otherwise(F.lit(None))


def bitfield_sql(payload_expr: str, start: int, nbits: int, signed: bool = False) -> str:
    """DuckDB mirror of :func:`bitfield` — identical integer arithmetic
    (including the too-short-payload NULL guard) so results hash-match."""
    armor = (
        "(CASE WHEN unicode({p}[{i}]) - 48 > 40 "
        "THEN unicode({p}[{i}]) - 56 ELSE unicode({p}[{i}]) - 48 END)"
    )
    i0, i1 = start // 6, (start + nbits - 1) // 6
    acc = "CAST(0 AS BIGINT)"
    for i in range(i0, i1 + 1):
        acc = f"({acc} * 64 + {armor.format(p=payload_expr, i=i + 1)})"
    shift = (i1 + 1) * 6 - (start + nbits)
    val = f"(({acc} >> {shift}) & {(1 << nbits) - 1})"
    if signed:
        val = f"(CASE WHEN {val} >= {1 << (nbits - 1)} THEN {val} - {1 << nbits} ELSE {val} END)"
    return f"(CASE WHEN length({payload_expr}) >= {i1 + 1} THEN {val} ELSE NULL END)"


def sixbit_text(payload: Column, start: int, length: int) -> Column:
    """P5 (6-bit ASCII text) as a pure column expression — the SQL twin of
    ``Bits.text`` (functions/nmea.py): each 6-bit group maps codes < 32 into
    '@'..'_', the string truncates at the first '@' padding char, strips,
    and empty becomes 'Not available'. Groups past the payload end vanish
    (the Python kernel's clamping loop). Matches the reference's shipName /
    callsign / destination extraction (ais_parser.py:18-31) minus its
    '@@@@@' -> 'Not available' quirk (documented divergence, nmea.py:12-18).

    Pure concat of per-group char() expressions — whole-stage codegen,
    mirrored verbatim by :func:`sixbit_text_sql` for the DuckDB oracle."""
    from pincspark.functions.nmea import NOT_AVAILABLE

    chars = []
    for j in range(length // 6):
        pos = start + 6 * j
        i0, i1 = pos // 6, (pos + 5) // 6
        if i0 == i1:
            acc = _char_val(payload, i0).cast("bigint")
        else:
            acc = _char_val(payload, i0).cast("bigint") * F.lit(64) + _char_val(
                payload, i1
            ).cast("bigint")
        shift = (i1 + 1) * 6 - (pos + 6)
        code = F.shiftright(acc, shift).bitwiseAND(F.lit(63))
        # codes < 32 map to '@'..'_' (+64), >= 32 stay: branch-free
        # `code + 64 - ((code >> 5) << 6)` keeps the expression tree small
        # enough for whole-stage codegen (a 20-char field otherwise blows
        # janino's 64 KB method limit via nested CASE duplication).
        ch = F.char(code + F.lit(64) - F.shiftleft(F.shiftright(code, 5), 6))
        chars.append(F.when(F.length(payload) >= i1 + 1, ch).otherwise(F.lit("")))
    s = F.trim(F.substring_index(F.concat(*chars), "@", 1))
    return F.when(s == "", F.lit(NOT_AVAILABLE)).otherwise(s)


def sixbit_text_sql(payload_expr: str, start: int, length: int) -> str:
    """DuckDB mirror of :func:`sixbit_text` — identical char-by-char
    construction so text fields hash-match."""
    armor = (
        "(CASE WHEN unicode({p}[{i}]) - 48 > 40 "
        "THEN unicode({p}[{i}]) - 56 ELSE unicode({p}[{i}]) - 48 END)"
    )
    groups = []
    for j in range(length // 6):
        pos = start + 6 * j
        i0, i1 = pos // 6, (pos + 5) // 6
        if i0 == i1:
            acc = armor.format(p=payload_expr, i=i0 + 1)
        else:
            acc = (
                f"({armor.format(p=payload_expr, i=i0 + 1)} * 64 "
                f"+ {armor.format(p=payload_expr, i=i1 + 1)})"
            )
        shift = (i1 + 1) * 6 - (pos + 6)
        code = f"(({acc} >> {shift}) & 63)"
        ch = f"chr(CAST({code} + 64 - (({code} >> 5) << 6) AS INTEGER))"
        groups.append(
            f"(CASE WHEN length({payload_expr}) >= {i1 + 1} THEN {ch} ELSE '' END)"
        )
    concat = "concat(" + ", ".join(groups) + ")"
    s = f"trim(split_part({concat}, '@', 1))"
    return f"(CASE WHEN {s} = '' THEN 'Not available' ELSE {s} END)"


def checksum_valid(sentence: Column) -> Column:
    """P2 checksum as a pure SQL expression: XOR of chars between '!' and
    '*' equals the hex suffix (ais_analysis.py:143-153). Codegen-friendly —
    keeps the validity filter ahead of the Python decode stage."""
    body = F.substring(F.substring_index(sentence, "*", 1), 2, 1_000_000)
    declared = F.upper(F.substring_index(sentence, "*", -1))
    folded = F.aggregate(
        F.split(body, ""),
        F.lit(0),
        lambda acc, ch: F.when(ch == "", acc).otherwise(acc.bitwiseXOR(F.ascii(ch))),
    )
    return folded == F.conv(declared, 16, 10).try_cast("int")
