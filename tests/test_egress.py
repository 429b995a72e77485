"""Warehouse egress tests: golden corpus -> the four fact tables, DAC533
FID1 name-remapping per data_transform, date-partitioned parquet layout."""

from __future__ import annotations

import json
import os

import pytest

GOLDEN = json.load(
    open(os.path.join(os.path.dirname(__file__), "golden", "reference_decoded.json"))
)
TAG = "\\s:rORBCOMM000,q:u,c:1673222400,i:X*32"


@pytest.fixture(scope="module")
def decoded(spark, tmp_path_factory):
    from pincspark.sources.nmea_source import read_and_decode

    p = tmp_path_factory.mktemp("eg") / "archive"
    p.write_text("\n".join(TAG + s for r in GOLDEN for s in r["sentences"]) + "\n")
    return read_and_decode(spark, str(p)).cache()


def test_fact_table_routing(spark, decoded):
    from pincspark.egress import warehouse_tables

    tables = warehouse_tables(decoded)
    mt = lambda n: [r["common"]["messageType"] for r in GOLDEN].count(n)
    assert tables["ais_position"].count() == mt(1) + mt(2) + mt(3)
    assert tables["ais_static"].count() == mt(5)
    assert tables["ais_type21"].count() == mt(21)

    pos = tables["ais_position"].collect()[0]
    assert pos["messageTypeDesc"] in (
        "Position Report Class A",
        "Response to interrogation Position Report Class A",
    )
    assert pos["sog"] is not None and pos["longitude"] is not None


def test_type6_533_normalization(spark, decoded):
    from pincspark.egress import TYPE6_533_COLUMNS, warehouse_tables

    t6 = warehouse_tables(decoded)["ais_type6_533"]
    assert t6.columns == TYPE6_533_COLUMNS
    rows = {r["mmsi"]: r for r in t6.collect()}

    # golden type-6 sentences with dac==533
    want = {
        r["common"]["mmsi"]: r["body"]
        for r in GOLDEN
        if r["common"]["messageType"] == 6 and r["body"]["dac"] == 533
    }
    assert set(rows) == set(want)
    for mmsi, body in want.items():
        row = rows[mmsi]
        assert row["dac"] == 533 and row["fid"] == body["fid"]
        assert row["volt_int"] == pytest.approx(body["volt_int"])
        if body["fid"] == 1:
            # data_transform aliasing (ais_egressServerCH.py:47-49)
            assert row["buoy_led_power"] == body["lantern_batt"]
            assert row["buoy_low_vin"] == body["lantern"]
            assert row["buoy_photocell"] == body["hatch_door"]
            assert row["buoy_temp"] == 0
        if body["fid"] == 2:
            # no positional smearing: lantern-state fields have no slot
            assert row["buoy_led_power"] == 0
            assert row["beat"] == body["beat"]


def test_write_warehouse_partitioned(spark, decoded, tmp_path):
    from pincspark.egress import write_warehouse

    paths = write_warehouse(decoded, str(tmp_path / "wh"))
    pos = spark.read.parquet(paths["ais_position"])
    assert pos.count() > 0
    assert any("event_date=" in d for d in os.listdir(paths["ais_position"]))
