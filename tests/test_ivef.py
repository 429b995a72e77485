"""IVEF XML path tests against the reference's golden record
(ais_ivefParser.py:233-263): batch file scan, framed-stream parse,
flatten+coerce, latest-state upsert (FIXTURES.md B6)."""

from __future__ import annotations

import pytest

GOLDEN_XML = """<MSG_IVEF xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance" xmlns="http://www.iala-to-be-confirmed.org/XMLSchema/IVEF/0.2.5">
  <Header MsgRefId="{159fdc7a-b9ff-474e-9c04-b65b368cdedd}" Version="0.2.5" />
  <Body>
    <ObjectDatas>
      <ObjectData>
        <TrackData COG="254.1" Id="202401022004338694" Length="136" Heading="255" ROT="0" SOG="4.47566666671751" SourceName="CoastWatch" UpdateTime="2024-01-02T23:29:47.563Z" TrackStatus="1" Width="22">
          <Pos Lat="1.23972166666667" Long="103.94434" />
          <NavStatus Value="0" />
        </TrackData>
        <VesselData Class="1" Id="202401022004338694" SourceName="CoastWatch" SourceType="1" UpdateTime="2024-01-02T23:29:47.563Z" />
        <VoyageData Id="202401022004338694" CargoTypeIMO="0" SourceName="CoastWatch" SourceType="1" UpdateTime="2024-01-02T23:29:47.563Z" />
      </ObjectData>
      <ObjectData>
        <TrackData COG="10.0" Id="202401022004338694" SOG="5.5" SourceName="CoastWatch" UpdateTime="2024-01-02T23:31:00.000Z" TrackStatus="1">
          <Pos Lat="1.24" Long="103.95" />
          <NavStatus Value="0" />
        </TrackData>
        <VesselData Class="1" Id="202401022004338694" SourceName="CoastWatch" SourceType="1" UpdateTime="2024-01-02T23:31:00.000Z" />
        <VoyageData Id="202401022004338694" CargoTypeIMO="0" SourceName="CoastWatch" SourceType="1" UpdateTime="2024-01-02T23:31:00.000Z" />
      </ObjectData>
      <ObjectData>
        <TrackData COG="90.0" Id="999" SOG="1.0" SourceName="Radar" UpdateTime="2024-01-02T23:30:00.000Z" TrackStatus="2">
          <Pos Lat="2.0" Long="101.0" />
          <NavStatus Key="NavStatus" Value="5" />
        </TrackData>
        <VesselData Class="2" Id="999" MMSI="563148100" Name="TEST VESSEL" Callsign="9V7754" SourceName="Radar" SourceType="2" UpdateTime="2024-01-02T23:30:00.000Z" />
        <VoyageData Id="999" CargoTypeIMO="70" Draught="10.8" DestName="TPP" SourceName="Radar" SourceType="2" UpdateTime="2024-01-02T23:30:00.000Z" />
      </ObjectData>
    </ObjectDatas>
  </Body>
</MSG_IVEF>
"""


@pytest.fixture(scope="module")
def xml_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("ivef") / "tracks.xml"
    p.write_text(GOLDEN_XML)
    return str(p)


def test_batch_scan_flatten_coerce(spark, xml_file):
    from pincspark.sources.ivef import flatten_object_data, read_ivef_file

    raw = read_ivef_file(spark, xml_file)
    flat = flatten_object_data(raw)
    rows = sorted(flat.collect(), key=lambda r: (r["Id"], str(r["UpdateTime"])))
    assert len(rows) == 3

    first = rows[0]
    assert first["Id"] == "202401022004338694"
    assert first["COG"] == pytest.approx(254.1)
    assert first["SOG"] == pytest.approx(4.47566666671751)
    assert first["Lat"] == pytest.approx(1.23972166666667)
    assert first["Long"] == pytest.approx(103.94434)
    assert first["NavStatus"] == 0  # @Value with no @Key -> NavStatus
    assert first["TrackStatus"] == 1
    assert first["UpdateTime"].year == 2024
    assert first["Length"] == pytest.approx(136.0)

    radar = rows[2]
    assert radar["Id"] == "999"
    assert radar["NavStatus"] == 5  # explicit @Key/@Value promotion
    assert radar["MMSI"] == 563148100
    assert radar["Name"] == "TEST VESSEL"
    assert radar["Draught"] == pytest.approx(10.8)
    assert radar["CargoTypeIMO"] == 70


def test_latest_track_state(spark, xml_file):
    from pincspark.sources.ivef import (
        flatten_object_data,
        latest_track_state,
        read_ivef_file,
    )

    flat = flatten_object_data(read_ivef_file(spark, xml_file))
    latest = {r["Id"]: r for r in latest_track_state(flat).collect()}
    assert len(latest) == 2
    # the newer of the two reports for the same Id wins (ais_ivef.py:286-312)
    assert latest["202401022004338694"]["SOG"] == pytest.approx(5.5)
    assert latest["202401022004338694"]["Long"] == pytest.approx(103.95)


def test_framed_stream_parse(spark):
    from pincspark.sources.ivef import flatten_object_data, parse_ivef_frames

    frame = (
        '<ObjectData><TrackData COG="1.5" Id="t1" SOG="2.5" '
        'UpdateTime="2024-01-02T23:29:47.563Z" TrackStatus="1">'
        '<Pos Lat="1.0" Long="100.0" /><NavStatus Value="3" /></TrackData>'
        "</ObjectData>"
    )
    df = spark.createDataFrame([(frame,)], "frame STRING")
    parsed = flatten_object_data(parse_ivef_frames(df), record_col="record")
    r = parsed.collect()[0]
    assert r["Id"] == "t1"
    assert r["COG"] == pytest.approx(1.5)
    assert r["NavStatus"] == 3
    assert r["Lat"] == pytest.approx(1.0)
