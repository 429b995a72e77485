"""The reference's flagship batch analysis (ais_analysis.py:main, 308-498)
as one composed Spark pipeline:

    archive text -> validate/reassemble -> decode -> position & static
    frames -> as-of join per mmsi -> gold parquet -> zone spatial join ->
    distinct-vessel occupancy

Stage-for-stage parity with SURVEY §3.1; every hop is one of the engine's
operators, so the whole job is: scan -> narrow decode -> ONE shuffle on
mmsi (as-of) -> broadcast zone predicate -> low-card agg. At 100 TB the
only wide exchange is the mmsi shuffle, which AQE skew-handles.

The decoded frame is staged (eager localCheckpoint inside
``read_and_decode``) before the position/static fan-out: the gold DAG
consumes it three times (positions + the t5/t24 static union), and without
staging Spark re-scans the archive and re-runs the Python decode once per
consumer — the reference reads the day file once (ais_analysis.py:318-321),
and so does this pipeline (exactly 1 FileScan + 1 ArrowEvalPython across
the whole flagship, asserted in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pincspark.operators.asof import asof_join
from pincspark.operators.geo import spatial_join
from pincspark.sources.nmea_source import read_and_decode

STATIC_COLS = ["shipName", "shipType", "callsign", "destination", "draught"]


def position_frame(decoded: DataFrame) -> DataFrame:
    """Types 1/2/3 -> the position analytic frame
    (ais_analysis_polars.py:391-401)."""
    return decoded.filter(F.col("ais.messageType").isin(1, 2, 3)).select(
        "ts",
        F.col("ais.messageType").alias("messageType"),
        F.col("ais.mmsi").alias("mmsi"),
        "ais.position.*",
    )


def static_frame(decoded: DataFrame) -> DataFrame:
    """Types 5 and 24 normalized into one static frame
    (ais_analysis_polars.py:361-374; msg-24 part A carries shipName, part B
    shipType/callsign — absent columns null-filled, P24 semantics)."""
    t5 = decoded.filter(F.col("ais.messageType") == 5).select(
        "ts",
        F.col("ais.messageType").alias("messageType"),
        F.col("ais.mmsi").alias("mmsi"),
        F.col("ais.static_voyage.shipName").alias("shipName"),
        F.col("ais.static_voyage.shipType").alias("shipType"),
        F.col("ais.static_voyage.callsign").alias("callsign"),
        F.col("ais.static_voyage.destination").alias("destination"),
        F.col("ais.static_voyage.draught").alias("draught"),
    )
    t24 = decoded.filter(F.col("ais.messageType") == 24).select(
        "ts",
        F.col("ais.messageType").alias("messageType"),
        F.col("ais.mmsi").alias("mmsi"),
        F.col("ais.static_report.shipName").alias("shipName"),
        F.col("ais.static_report.shipType").alias("shipType"),
        F.col("ais.static_report.callsign").alias("callsign"),
        F.lit(None).cast("string").alias("destination"),
        F.lit(None).cast("double").alias("draught"),
    )
    return t5.unionByName(t24)


def build_gold(positions: DataFrame, statics: DataFrame) -> DataFrame:
    """J1: each position enriched with the latest static report of the same
    vessel (merge_asof twin, ais_analysis.py:476)."""
    right = statics.select("mmsi", "ts", *STATIC_COLS)
    return asof_join(
        positions.drop("messageType"),
        right,
        on="ts",
        by="mmsi",
        right_cols=STATIC_COLS,
    )


def batch_archive_analysis(
    spark: SparkSession,
    archive_path: str,
    gold_path: str | None = None,
    plan_sink: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Full §3.1 pipeline. Returns (gold, occupancy); writes/re-reads the
    gold parquet when ``gold_path`` is given (the reference persists then
    analyzes, ais_analysis.py:477-486)."""
    decoded = read_and_decode(spark, archive_path, plan_sink=plan_sink)
    gold = build_gold(position_frame(decoded), static_frame(decoded))
    if gold_path is not None:
        gold.write.mode("overwrite").parquet(gold_path)
        gold = spark.read.parquet(gold_path)

    in_zones = spatial_join(
        gold.filter(F.col("longitude").isNotNull()), zones=None
    )
    occupancy = in_zones.groupBy("zone_id", "zone_name").agg(
        F.countDistinct("mmsi").alias("n_vessels"),
        F.count(F.lit(1)).alias("n_reports"),
    )
    return gold, occupancy
