"""Warehouse egress tier: the reference's four ClickHouse fact tables as
typed DataFrame projections + partitioned parquet writers.

Reference parity: ais_egressServerCH.py:127-191 routes decoded JSON by
messageType into pnav.ais_position (1/2/3), pnav.ais_static (5),
pnav.ais_type21 (21), pnav.ais_type6_533 (6 with DAC533), buffering 20 rows
per insert; DAC533/FID1 payloads are remapped onto the FID4 37-column
layout by ``data_transform`` (ais_egressServerCH.py:23-65) and FID2 rows are
padded with two zero columns (ais_egressServerCH.py:176-183).

Deliberate fix vs reference (SURVEY §7.5): the reference zips FID2's value
LIST positionally against the FID4 column-name list, landing renewable-
energy lantern fields under unrelated buoy_* names. Here every FID maps by
NAME into the pinned layout: shared telemetry keeps its column, the FID1
aliases follow data_transform (lantern_batt->buoy_led_power,
lantern->buoy_low_vin, hatch_door->buoy_photocell), and absent flags are
zero-filled. Micro-batch buffering is Structured Streaming's job (ST3);
batch writes partition by event date.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pincspark.functions.enums import lookup

# The pinned 37-column DAC533 fact layout (ais_egressServerCH.py:167).
TYPE6_533_COLUMNS = [
    "ts", "messageType", "messageTypeDesc", "repeat", "mmsi",
    "seqno", "dest_mmsi", "retransmit", "dac", "fid",
    "volt_int", "volt_ex1", "volt_ex2", "off_pos", "ambient", "racon",
    "light", "health", "beat", "alarm_active", "buoy_led_power",
    "buoy_low_vin", "buoy_photocell", "buoy_temp", "buoy_force_off",
    "buoy_islight", "buoy_errled_short", "buoy_errled_open",
    "buoy_errled_voltlow", "buoy_errled_vinlow", "buoy_errled_power",
    "buoy_adjmaxpower", "buoy_sensor_interrupt", "buoy_solarcharging",
]


def _common(decoded: DataFrame) -> list:
    return [
        F.col("ts"),
        F.col("ais.messageType").alias("messageType"),
        lookup(F.col("ais.messageType"), "message_type").alias("messageTypeDesc"),
        F.col("ais.repeat").alias("repeat"),
        F.col("ais.mmsi").alias("mmsi"),
    ]


def position_table(decoded: DataFrame) -> DataFrame:
    return decoded.filter(F.col("ais.messageType").isin(1, 2, 3)).select(
        *_common(decoded), "ais.position.*"
    )


def static_table(decoded: DataFrame) -> DataFrame:
    return decoded.filter(F.col("ais.messageType") == 5).select(
        *_common(decoded), "ais.static_voyage.*"
    )


def type21_table(decoded: DataFrame) -> DataFrame:
    return decoded.filter(F.col("ais.messageType") == 21).select(
        *_common(decoded), "ais.aton.*"
    )


def type6_533_table(decoded: DataFrame) -> DataFrame:
    """DAC533 FID 1/2/4 normalized by NAME into the 37-column layout."""
    b = F.col("ais.bin_addressed")
    t6 = decoded.filter(
        (F.col("ais.messageType") == 6) & (b["dac"] == 533) & (b["fid"].isin(1, 2, 4))
    )
    zero = F.lit(0)
    fid = b["fid"]
    cols = {
        "seqno": b["seqno"], "dest_mmsi": b["dest_mmsi"],
        "retransmit": b["retransmit"], "dac": b["dac"], "fid": fid,
        "volt_int": b["volt_int"], "volt_ex1": b["volt_ex1"],
        "volt_ex2": b["volt_ex2"],
        "off_pos": F.coalesce(b["off_pos"], zero),
        "ambient": F.coalesce(b["ambient"], zero),
        "racon": F.coalesce(b["racon"], zero),
        "light": F.coalesce(b["light"], zero),
        "health": F.coalesce(b["health"], zero),
        "beat": F.coalesce(b["beat"], zero),
        # FID4 carries real buoy flags; FID1 aliases per data_transform;
        # FID2's lantern-state fields have no slot in this layout -> 0.
        "alarm_active": F.when(fid == 4, F.coalesce(b["alarm_active"], zero)).otherwise(zero),
        "buoy_led_power": F.when(fid == 4, F.coalesce(b["buoy_led_power"], zero))
        .when(fid == 1, F.coalesce(b["lantern_batt"], zero)).otherwise(zero),
        "buoy_low_vin": F.when(fid == 4, F.coalesce(b["buoy_low_vin"], zero))
        .when(fid == 1, F.coalesce(b["lantern"], zero)).otherwise(zero),
        "buoy_photocell": F.when(fid == 4, F.coalesce(b["buoy_photocell"], zero))
        .when(fid == 1, F.coalesce(b["hatch_door"], zero)).otherwise(zero),
    }
    for flag in (
        "buoy_temp", "buoy_force_off", "buoy_islight", "buoy_errled_short",
        "buoy_errled_open", "buoy_errled_voltlow", "buoy_errled_vinlow",
        "buoy_errled_power", "buoy_adjmaxpower", "buoy_sensor_interrupt",
        "buoy_solarcharging",
    ):
        cols[flag] = F.when(fid == 4, F.coalesce(b[flag], zero)).otherwise(zero)

    return t6.select(
        *_common(decoded), *[expr.alias(name) for name, expr in cols.items()]
    ).select(*TYPE6_533_COLUMNS)


def warehouse_tables(decoded: DataFrame) -> dict[str, DataFrame]:
    return {
        "ais_position": position_table(decoded),
        "ais_static": static_table(decoded),
        "ais_type21": type21_table(decoded),
        "ais_type6_533": type6_533_table(decoded),
    }


def write_warehouse(decoded: DataFrame, base_dir: str) -> dict[str, str]:
    """Batch write all fact tables, partitioned by event date (the
    ClickHouse-insert analog; streaming uses sinks.append_stream)."""
    paths = {}
    for name, df in warehouse_tables(decoded).items():
        path = os.path.join(base_dir, name)
        (
            df.withColumn("event_date", F.to_date("ts"))
            .write.mode("overwrite")
            .partitionBy("event_date")
            .parquet(path)
        )
        paths[name] = path
    return paths
