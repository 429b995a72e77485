"""Extended message-type decoders (beyond the reference's surface): types
7/13 acks, 10 UTC inquiry, 11 (type-4 layout), 20 DLM, 22 channel mgmt,
23 group assignment, 25 slot binary — round-tripped through synthesized
payloads (encode helper from test_bitfields)."""

from __future__ import annotations

from pincspark.decode.families import decode_message
from pincspark.functions.nmea import Bits
from tests.test_bitfields import encode_payload


def build(fields: list[tuple[int, int]]) -> Bits:
    """fields = [(value, width), ...] -> Bits (padded to 6-bit multiple)."""
    bits = "".join(format(v & ((1 << w) - 1), f"0{w}b") for v, w in fields)
    pad = (-len(bits)) % 6
    bits += "0" * pad
    return Bits.from_payload(encode_payload(bits))


def header(mt: int, mmsi: int = 123456789) -> list[tuple[int, int]]:
    return [(mt, 6), (0, 2), (mmsi, 30)]


def test_type7_ack():
    b = build(header(7) + [(0, 2), (111111111, 30), (1, 2), (222222222, 30), (3, 2)])
    rec = decode_message(b)
    assert rec["family"] == "ack"
    f = rec["payload_fields"]
    assert (f["mmsi1"], f["mmsiseq1"]) == (111111111, 1)
    assert (f["mmsi2"], f["mmsiseq2"]) == (222222222, 3)
    assert f["mmsi3"] is None  # only two acks present


def test_type10_inquiry():
    b = build(header(10) + [(0, 2), (987654321, 30), (0, 2)])
    rec = decode_message(b)
    assert rec["family"] == "utc_inquiry"
    assert rec["payload_fields"]["dest_mmsi"] == 987654321


def test_type11_shares_type4_layout():
    b = build(header(11) + [(2024, 14), (6, 4), (15, 5), (12, 5), (30, 6), (45, 6)]
              + [(0, 1), (0, 28), (0, 27), (7, 4)] + [(0, 168 - 134)])
    rec = decode_message(b)
    assert rec["family"] == "base_station"
    f = rec["payload_fields"]
    assert (f["utc_year"], f["utc_month"], f["utc_day"]) == (2024, 6, 15)
    assert (f["utc_hour"], f["utc_minute"], f["utc_second"]) == (12, 30, 45)
    assert f["epfd"] == 7


def test_type20_dlm():
    b = build(header(20) + [(0, 2), (100, 12), (5, 4), (3, 3), (250, 11),
                            (200, 12), (2, 4), (1, 3), (125, 11)])
    rec = decode_message(b)
    assert rec["family"] == "dlm"
    f = rec["payload_fields"]
    assert (f["offset1"], f["number1"], f["timeout1"], f["increment1"]) == (100, 5, 3, 250)
    assert (f["offset2"], f["number2"], f["timeout2"], f["increment2"]) == (200, 2, 1, 125)
    assert f["offset3"] is None


def test_type22_broadcast_box():
    # ne (10.0E, 5.0N), sw (9.0E, 4.0N) in 0.1-minute units
    ne_lon, ne_lat = int(10.0 * 600), int(5.0 * 600)
    sw_lon, sw_lat = int(9.0 * 600), int(4.0 * 600)
    b = build(header(22) + [(0, 2), (2087, 12), (2088, 12), (0, 4), (1, 1),
                            (ne_lon, 18), (ne_lat, 17), (sw_lon, 18), (sw_lat, 17),
                            (0, 1), (0, 1), (1, 1), (4, 3), (0, 23)])
    rec = decode_message(b)
    assert rec["family"] == "channel_mgmt"
    f = rec["payload_fields"]
    assert (f["channel_a"], f["channel_b"]) == (2087, 2088)
    assert f["ne_lon"] == 10.0 and f["ne_lat"] == 5.0
    assert f["sw_lon"] == 9.0 and f["sw_lat"] == 4.0
    assert f["addressed"] == 0 and f["band_b"] == 1 and f["zonesize"] == 4


def test_type23_group_assignment():
    b = build(header(23) + [(0, 2), (int(10.0 * 600), 18), (int(5.0 * 600), 17),
                            (int(9.0 * 600), 18), (int(4.0 * 600), 17),
                            (6, 4), (70, 8), (0, 22), (2, 2), (9, 4), (3, 4)])
    rec = decode_message(b)
    assert rec["family"] == "group_assignment"
    f = rec["payload_fields"]
    assert f["station_type"] == 6 and f["ship_type"] == 70
    assert f["txrx"] == 2 and f["interval"] == 9 and f["quiet"] == 3
    assert f["ne_lon"] == 10.0 and f["sw_lat"] == 4.0


def test_type25_addressed_structured():
    b = build(header(25) + [(1, 1), (1, 1), (555555555, 30), (0x1234, 16), (0xABC, 12)])
    rec = decode_message(b)
    assert rec["family"] == "slot_binary"
    f = rec["payload_fields"]
    assert f["addressed"] == 1 and f["structured"] == 1
    assert f["dest_mmsi"] == 555555555
    assert f["app_id"] == 0x1234
    assert f["data_bits"] >= 12
    assert int(f["data"], 16) >> (f["data_bits"] - 12) == 0xABC
