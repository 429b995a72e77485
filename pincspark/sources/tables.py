"""Parquet table loading for the driver's synthetic warehouse (S8 analog).

Reference parity: the reference persists/reads back gold Parquet
(``ais_analysis.py:477``); here every table is a columnar parquet scan so
Catalyst gets predicate pushdown + column pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one warehouse table, normalizing timestamp precision.

    The events table is written with parquet TIMESTAMP(NANOS), which Spark 4
    refuses to map to TimestampType. We read nanos as long
    (``spark.sql.legacy.parquet.nanosAsLong``) and truncate to microseconds —
    exactly what DuckDB's parquet reader does — so engine and oracle see
    identical instants.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # NTZ->LTZ casts (for unix_micros) are tz-invariant vs the oracle ONLY
    # if the session timezone is UTC when the plan EXECUTES — the cast below
    # is lazy, so this conf must still hold at action time (ADVICE r3).
    # In-repo sessions pin UTC at builder time (session.py — the source of
    # truth); this set exists to normalize EXTERNAL sessions (the driver's
    # correctness harness hands us its own SparkSession) and is idempotent
    # for ours. Callers must not change the tz between plan and action.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        elif isinstance(field.dataType, T.TimestampNTZType):
            # Parquet timestamp[us] without tz arrives as TIMESTAMP_NTZ;
            # with the session pinned to UTC above, the cast to LTZ is a
            # no-op on the stored instant, and epoch functions
            # (unix_micros etc.) resolve identically to DuckDB's epoch view.
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}
