"""The engine catalog: explicit StructType schemas per AIS message family.

The reference's schemas are emergent (dict keys vary by message type and
payload length, SURVEY §1.2); here every family is a pinned, nullable,
typed struct — optional trailing fields are plain nullable columns with the
reference's zero defaults filled by the decoders.

Field inventories mirror /root/reference/ais_parser.py (citations in
pincspark.decode.families); *Desc description strings are intentionally NOT
part of the decode schema — they are enum dimensions joined relationally
(pincspark.functions.enums).
"""

from __future__ import annotations

from pyspark.sql import types as T

_T = {
    "i": T.IntegerType(),
    "l": T.LongType(),
    "d": T.DoubleType(),
    "s": T.StringType(),
}


def _struct(spec: dict[str, str]) -> T.StructType:
    return T.StructType([T.StructField(n, _T[t], True) for n, t in spec.items()])


POSITION = _struct({
    "navStatus": "i", "rot": "d", "sog": "d", "positionAccuracy": "i",
    "longitude": "d", "latitude": "d", "cog": "d", "trueHeading": "i",
    "timeStamp": "i", "manoeuvre": "i", "raimFlag": "i", "radioStatus": "l",
    "syncState": "i", "slotTimeout": "i", "subMessage": "l",
})

BASE_STATION = _struct({
    "utc_year": "i", "utc_month": "i", "utc_day": "i", "utc_hour": "i",
    "utc_minute": "i", "utc_second": "i", "positionAccuracy": "i",
    "longitude": "d", "latitude": "d", "epfd": "i", "raimFlag": "i",
    "radioStatus": "l", "syncState": "i", "slotTimeout": "i", "subMessage": "l",
})

STATIC_VOYAGE = _struct({
    "aisVersion": "i", "imo": "l", "callsign": "s", "shipName": "s",
    "shipType": "i", "to_bow": "i", "to_stern": "i", "to_port": "i",
    "to_starboard": "i", "epfd": "i", "eta_month": "i", "eta_day": "i",
    "eta_hour": "i", "eta_minute": "i", "draught": "d", "destination": "s",
    "dte": "i",
})

# Type 6 with the superset of vendor sub-payload fields (DAC133/13,
# DAC250/10, DAC533/1+235/10, DAC533/2, DAC533/4) — heterogeneous layouts
# normalized into one nullable struct (P24 applied at the catalog level).
BIN_ADDRESSED = _struct({
    "seqno": "i", "dest_mmsi": "l", "retransmit": "i", "dac": "i", "fid": "i",
    # DAC133/FID13 dredger
    "empty": "i", "full": "i", "actual": "i", "supply": "i", "half": "i",
    "case_cover": "i", "battery": "d", "sonar": "i", "hoppers": "i",
    "hopper1": "i", "hopper2": "i", "hopper3": "i", "hopper4": "i",
    "hopper5": "i", "hopper6": "i", "hopper7": "i", "hopper8": "i",
    # shared beacon telemetry
    "volt_int": "d", "volt_ex1": "d", "volt_ex2": "d", "racon": "i",
    "light": "i", "health": "i", "beat": "i", "off_pos": "i", "ambient": "i",
    "hatch_door": "i",
    # DAC250/FID10 lighthouse
    "stat_ext0": "i", "stat_ext1": "i", "stat_ext2": "i", "stat_ext3": "i",
    "stat_ext4": "i", "stat_ext5": "i", "stat_ext6": "i", "stat_ext7": "i",
    # DAC533/FID1
    "lantern_batt": "i", "lantern": "i",
    # DAC533/FID2
    "main_lantern_cond": "i", "main_lantern_stat": "i",
    "stdby_lantern_cond": "i", "stdby_lantern_stat": "i",
    "emerg_lantern_cond": "i", "emerg_lantern_stat": "i",
    "opticA_drive_stat": "i", "opticA_drive_cond": "i",
    "opticB_drive_stat": "i", "opticB_drive_cond": "i",
    "main_power": "i", "bms_cond": "i",
    # DAC533/FID4 buoy flags
    "alarm_active": "i", "buoy_led_power": "i", "buoy_low_vin": "i",
    "buoy_photocell": "i", "buoy_temp": "i", "buoy_force_off": "i",
    "buoy_islight": "i", "buoy_errled_short": "i", "buoy_errled_open": "i",
    "buoy_errled_voltlow": "i", "buoy_errled_vinlow": "i",
    "buoy_errled_power": "i", "buoy_adjmaxpower": "i",
    "buoy_sensor_interrupt": "i", "buoy_solarcharging": "i",
})

BIN_BROADCAST = _struct({
    "dac": "i", "fid": "i",
    # DAC1/FID29 text broadcast
    "linkId": "i", "text": "s",
    # DAC1/FID31 weather
    "longitude": "d", "latitude": "d", "positionAccuracy": "i",
    "utc_day": "i", "utc_hour": "i", "utc_minute": "i",
    "avgWindSpeed": "i", "windGust": "i", "windDirection": "i",
    "windGustDirection": "i", "airTemperature": "i", "relativeHumidity": "i",
    "dewpoint": "i", "airPressure": "i", "airPressureTendency": "i",
    "horizontalVisibility": "i", "waterLevel": "i", "waterLevelTrend": "i",
    "surfaceCurrentSpeed": "i", "surfaceCurrentDirection": "i",
    "surfaceCurrentSpeed_2": "i", "surfaceCurrentDirection_2": "i",
    "CurrentMeasureLevel_2": "i",
    "surfaceCurrentSpeed_3": "i", "surfaceCurrentDirection_3": "i",
    "CurrentMeasureLevel_3": "i",
    "significantWaveHeight": "i", "wavePeriod": "i", "waveDirection": "i",
    "swellHeight": "i", "swellPeriod": "i", "swellDirection": "i",
    "seaState": "i", "waterTemperature": "i", "precipitation": "i",
    "salinity": "i", "ice": "i",
})

SAR_AIRCRAFT = _struct({
    "altitude": "i", "sog": "d", "positionAccuracy": "i", "longitude": "d",
    "latitude": "d", "cog": "d", "timeStamp": "i", "regional": "i",
    "dte": "i", "assigned": "i", "raimFlag": "i", "radioStatus": "l",
    "syncState": "i", "slotTimeout": "i", "subMessage": "l",
})

SAFETY_ADDRESSED = _struct({
    "seqNo": "i", "dest_mmsi": "l", "retransmit": "i", "text": "s",
})

SAFETY_BROADCAST = _struct({"text": "s"})

INTERROGATION = _struct({
    "mmsi1": "l", "type1_1": "i", "offset1_1": "i",
    "type1_2": "i", "offset1_2": "i",
    "mmsi2": "l", "type2_1": "i", "offset2_1": "i",
})

ASSIGNMENT = _struct({
    "mmsi1": "l", "offset1": "i", "increment1": "i",
    "mmsi2": "l", "offset2": "i", "increment2": "i",
})

DGNSS = _struct({"longitude": "i", "latitude": "i", "data": "s"})

CLASSB = _struct({
    "reserved": "i", "sog": "d", "positionAccuracy": "i", "longitude": "d",
    "latitude": "d", "cog": "d", "trueHeading": "i", "timeStamp": "i",
    "regional": "i", "cs": "i", "display": "i", "dsc": "i", "band": "i",
    "msg22": "i", "assigned": "i", "raimFlag": "i", "radioStatus": "l",
})

CLASSB_EXT = _struct({
    "reserved": "i", "sog": "d", "positionAccuracy": "i", "longitude": "d",
    "latitude": "d", "cog": "d", "trueHeading": "i", "timeStamp": "i",
    "regional": "i", "shipName": "s", "shipType": "i", "to_bow": "i",
    "to_stern": "i", "to_port": "i", "to_starboard": "i", "epfd": "i",
    "raimFlag": "i", "dte": "i", "assigned": "i",
})

ATON = _struct({
    "aidType": "i", "aidName": "s", "positionAccuracy": "i",
    "longitude": "d", "latitude": "d", "to_bow": "i", "to_stern": "i",
    "to_port": "i", "to_starboard": "i", "epfd": "i", "utc_second": "i",
    "off_position": "i", "regional": "i", "raimFlag": "i", "virtualAid": "i",
    "assigned": "i", "ext_name": "s",
})

STATIC_REPORT = _struct({
    "partNo": "i", "shipName": "s", "shipType": "i", "vendor": "s",
    "model": "i", "serial": "l", "callsign": "s", "motherShip_mmsi": "l",
    "to_bow": "i", "to_stern": "i", "to_port": "i", "to_starboard": "i",
})

LONG_RANGE = _struct({
    "positionAccuracy": "i", "raimFlag": "i", "navStatus": "i",
    "longitude": "d", "latitude": "d", "sog": "d", "cog": "d", "gnss": "i",
})

# Families beyond the reference's surface (full ITU message-type coverage).
ACK = _struct({
    "mmsi1": "l", "mmsiseq1": "i", "mmsi2": "l", "mmsiseq2": "i",
    "mmsi3": "l", "mmsiseq3": "i", "mmsi4": "l", "mmsiseq4": "i",
})

UTC_INQUIRY = _struct({"dest_mmsi": "l"})

DLM = _struct({
    "offset1": "i", "number1": "i", "timeout1": "i", "increment1": "i",
    "offset2": "i", "number2": "i", "timeout2": "i", "increment2": "i",
    "offset3": "i", "number3": "i", "timeout3": "i", "increment3": "i",
    "offset4": "i", "number4": "i", "timeout4": "i", "increment4": "i",
})

CHANNEL_MGMT = _struct({
    "channel_a": "i", "channel_b": "i", "txrx": "i", "power": "i",
    "ne_lon": "d", "ne_lat": "d", "sw_lon": "d", "sw_lat": "d",
    "dest_mmsi1": "l", "dest_mmsi2": "l", "addressed": "i",
    "band_a": "i", "band_b": "i", "zonesize": "i",
})

GROUP_ASSIGNMENT = _struct({
    "ne_lon": "d", "ne_lat": "d", "sw_lon": "d", "sw_lat": "d",
    "station_type": "i", "ship_type": "i", "txrx": "i",
    "interval": "i", "quiet": "i",
})

SLOT_BINARY = _struct({
    "addressed": "i", "structured": "i", "dest_mmsi": "l",
    "app_id": "i", "data_bits": "i", "data": "s",
})

FAMILY_SCHEMAS: dict[str, T.StructType] = {
    "position": POSITION,
    "base_station": BASE_STATION,
    "ack": ACK,
    "utc_inquiry": UTC_INQUIRY,
    "dlm": DLM,
    "channel_mgmt": CHANNEL_MGMT,
    "group_assignment": GROUP_ASSIGNMENT,
    "slot_binary": SLOT_BINARY,
    "static_voyage": STATIC_VOYAGE,
    "bin_addressed": BIN_ADDRESSED,
    "bin_broadcast": BIN_BROADCAST,
    "sar_aircraft": SAR_AIRCRAFT,
    "safety_addressed": SAFETY_ADDRESSED,
    "safety_broadcast": SAFETY_BROADCAST,
    "interrogation": INTERROGATION,
    "assignment": ASSIGNMENT,
    "dgnss": DGNSS,
    "classb": CLASSB,
    "classb_ext": CLASSB_EXT,
    "aton": ATON,
    "static_report": STATIC_REPORT,
    "long_range": LONG_RANGE,
}

# Full decode record: common header + one nullable struct per family
# (exactly one is non-null for a known message type).
DECODED = T.StructType(
    [
        T.StructField("messageType", T.IntegerType(), True),
        T.StructField("repeat", T.IntegerType(), True),
        T.StructField("mmsi", T.LongType(), True),
        T.StructField("family", T.StringType(), True),
    ]
    + [T.StructField(name, schema, True) for name, schema in FAMILY_SCHEMAS.items()]
)

# Raw sentence-stream schema (B1 in FIXTURES.md).
RAW_NMEA = T.StructType([
    T.StructField("tagblock", T.StringType(), True),
    T.StructField("sentence", T.StringType(), True),
])
