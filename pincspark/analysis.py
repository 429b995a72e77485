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


def build_gold_fused(decoded: DataFrame) -> DataFrame:
    """:func:`build_gold` in ONE narrow pass over ``decoded``.

    The composed form consumes ``decoded`` three times (positions + the
    t5/t24 static union), which forces an eager staging barrier so the
    Python decode runs once. But :func:`pincspark.operators.asof.asof_join`
    unions its two sides BEFORE its single key shuffle anyway — so the
    position/static fan-out can be ONE projection: filter to the five gold
    message types, CASE the position fields (null on static rows), CASE
    the carried static struct (null on position rows), tag the side, then
    run exactly the asof window. ``decoded`` then has ONE consumer, the
    staging barrier disappears, and the Arrow decode stage pipelines
    straight into the as-of exchange — at 100 TB that removes a full
    materialization of the decoded archive. Row-identical to
    ``build_gold(position_frame(d), static_frame(d))`` (pinned in
    tests/test_analysis.py)."""
    from pyspark.sql import Window

    from pincspark.catalog import POSITION

    t = F.col("ais.messageType")
    is_pos = t.isin(1, 2, 3)
    pos_fields = POSITION.fieldNames()

    def _static(prefix: str, absent: dict[str, str]) -> F.Column:
        cols = []
        for c in STATIC_COLS:
            if c in absent:
                cols.append(F.lit(None).cast(absent[c]).alias(c))
            else:
                cols.append(F.col(f"ais.{prefix}.{c}").alias(c))
        return F.struct(*cols, F.col("ts").alias("ts_right"))

    unioned = decoded.filter(t.isin(1, 2, 3, 5, 24)).select(
        F.col("ts"),
        F.col("ais.mmsi").alias("mmsi"),
        *[
            F.when(is_pos, F.col(f"ais.position.{c}")).alias(c)
            for c in pos_fields
        ],
        F.when(is_pos, F.lit(1)).otherwise(F.lit(0)).alias("__side"),
        F.when(t == 5, _static("static_voyage", {}))
        .when(
            t == 24,
            _static(
                "static_report", {"destination": "string", "draught": "double"}
            ),
        )
        .alias("__carry"),
    )
    # Identical window semantics to asof_join: right rows sort before left
    # rows on ts ties -> backward-inclusive merge_asof.
    w = (
        Window.partitionBy("mmsi")
        .orderBy(F.col("ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn("__c", F.last("__carry", ignorenulls=True).over(w))
    return filled.filter(F.col("__side") == 1).select(
        "ts",
        "mmsi",
        *pos_fields,
        *[F.col("__c").getField(c).alias(c) for c in STATIC_COLS],
        F.col("__c").getField("ts_right").alias("ts_right"),
    )


# The five message types the gold pipeline consumes; F1-routed below the
# Python decode stage (see read_and_decode's message_types).
GOLD_TYPES = (1, 2, 3, 5, 24)


def batch_archive_analysis(
    spark: SparkSession,
    archive_path: str,
    gold_path: str | None = None,
    plan_sink: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Full §3.1 pipeline. Returns (gold, occupancy); writes/re-reads the
    gold parquet when ``gold_path`` is given (the reference persists then
    analyzes, ais_analysis.py:477-486).

    With ``gold_path`` set, the gold write is the ONLY consumer of the
    decoded frame (occupancy reads the parquet back), so the decode
    staging barrier is skipped and the whole pipeline is two jobs: write
    gold, then aggregate occupancy. Without it, the two RETURNED lazy
    frames share the decode subtree, so staging stays on to keep the
    single-decode guarantee."""
    decoded = read_and_decode(
        spark,
        archive_path,
        plan_sink=plan_sink,
        message_types=GOLD_TYPES,
        stage_decoded=gold_path is None,
    )
    gold = build_gold_fused(decoded)
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
