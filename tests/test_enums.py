"""Enum dimension parity: our code tables must reproduce every *Desc string
the reference decoder emitted for the golden corpus (the reference computes
them via Enum(...).name.replace('_',' ') with clamping)."""

from __future__ import annotations

import json
import os

from pincspark.functions import enums

GOLDEN = json.load(
    open(os.path.join(os.path.dirname(__file__), "golden", "reference_decoded.json"))
)

# reference Desc key -> (enum table name, code key, clamp fn)
DESC_KEYS = {
    "navStatusDesc": ("nav_status", "navStatus", lambda c: c if c <= 15 else 15),
    "shipTypeDesc": ("ship_type", "shipType", lambda c: c if c <= 99 else 99),
    "epfdDesc": ("epfd", "epfd", lambda c: c if c <= 15 else 0),
    "aidTypeDesc": ("aid_type", "aidType", lambda c: c if c <= 31 else 0),
    "syncStateDesc": ("sync_state", "syncState", lambda c: c if c <= 3 else 0),
    "airPressureTendencyDesc": ("common_indicator", "airPressureTendency", lambda c: c if c <= 3 else 3),
    "waterLevelTrendDesc": ("common_indicator", "waterLevelTrend", lambda c: c if c <= 3 else 3),
    "seaStateDesc": ("beaufort", "seaState", lambda c: c if c <= 15 else 13),
    "precipitationDesc": ("precipitation", "precipitation", lambda c: c if c <= 7 else 7),
    "iceDesc": ("common_indicator_yesno", "ice", lambda c: c if c <= 3 else 3),
}


def test_desc_parity_on_golden_corpus():
    checked = 0
    for rec in GOLDEN:
        body = rec.get("body") or {}
        for desc_key, (enum_name, code_key, clamp) in DESC_KEYS.items():
            if desc_key in body and code_key in body:
                table = enums.ENUMS[enum_name][0]
                assert table[clamp(body[code_key])] == body[desc_key], (
                    rec["sentences"][0],
                    desc_key,
                )
                checked += 1
    assert checked >= 10  # corpus covers plenty of desc lookups


def test_full_table_parity_with_reference_enums():
    """Directly compare every table against the reference enum modules."""
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        from ais_aid_type import Nav_Aid_Type
        from ais_beaufortscale import BeaufortScale
        from ais_comm_state import Slot_Timeout, Sync_State
        from ais_common_indicator import CommonIndicator, CommonIndicator_yesno
        from ais_epfd import EPFD
        from ais_message_type import MessageType
        from ais_navigation_status import NavigationStatus
        from ais_precipitation import Precipitation
        from ais_shiptype import ShipType
    finally:
        sys.path.remove("/root/reference")

    pairs = [
        (enums.MESSAGE_TYPE, MessageType),
        (enums.NAV_STATUS, NavigationStatus),
        (enums.EPFD, EPFD),
        (enums.SHIP_TYPE, ShipType),
        (enums.AID_TYPE, Nav_Aid_Type),
        (enums.BEAUFORT, BeaufortScale),
        (enums.PRECIPITATION, Precipitation),
        (enums.COMMON_INDICATOR, CommonIndicator),
        (enums.COMMON_INDICATOR_YESNO, CommonIndicator_yesno),
        (enums.SYNC_STATE, Sync_State),
        (enums.SLOT_TIMEOUT, Slot_Timeout),
    ]
    for mine, ref in pairs:
        ref_table = {e.value: e.name.replace("_", " ") for e in ref}
        assert mine == ref_table, ref.__name__


def test_lookup_and_attach(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(0,), (7,), (120,)], "shipType INT")
    out = enums.attach_enum(df, spark, "shipType", "ship_type", "shipTypeDesc")
    got = {r["shipType"]: r["shipTypeDesc"] for r in out.collect()}
    assert got[0] == "Not available"
    assert got[7] == "Reserved for future use 7"
    assert got[120] == "Other type No additional information"  # clamped to 99

    expr_out = df.select(
        "shipType", enums.lookup(F.col("shipType"), "ship_type").alias("d")
    )
    got2 = {r["shipType"]: r["d"] for r in expr_out.collect()}
    assert got2 == got
