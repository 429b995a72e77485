"""Dimension sources: the AtoN list CSV (S7) and its broadcast enrichment
join (J3).

Reference parity: ais_webSocketServer.py:186-193 loads the AtoN CSV once at
startup and filters it per record by mmsi, dropping records with no match
(``continue`` -> inner-join semantics, ais_webSocketServer.py:96-97).
Spark-first: one ``spark.read.csv`` + an explicit broadcast hash join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ATON_SCHEMA = T.StructType([
    T.StructField("mmsi", T.LongType(), False),
    T.StructField("name", T.StringType(), True),
    T.StructField("region", T.StringType(), True),
    T.StructField("type", T.StringType(), True),
])


def read_aton_csv(spark: SparkSession, path: str) -> DataFrame:
    """S7: AtoN dimension scan (header CSV, pinned schema — no inference)."""
    return spark.read.schema(ATON_SCHEMA).option("header", True).csv(path)


def enrich_aton(
    df: DataFrame,
    aton: DataFrame,
    mmsi_col: str = "mmsi",
    how: str = "inner",
) -> DataFrame:
    """J3: broadcast equi-join the AtoN attributes onto a decoded stream.
    Inner join drops non-AtoN records, matching the reference."""
    dim = F.broadcast(
        aton.select(
            F.col("mmsi").alias("__aton_mmsi"),
            F.col("name").alias("atonname"),
            "region",
            "type",
        )
    )
    return df.join(dim, F.col(mmsi_col) == F.col("__aton_mmsi"), how).drop("__aton_mmsi")
