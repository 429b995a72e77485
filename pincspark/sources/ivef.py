"""IVEF (IALA Inter-VTS Exchange Format) XML ingestion: batch file scan
(S6), framed-stream parsing (S5), record flattening (P25), string->typed
coercion (P26), and latest-state upsert per track Id (J5/W2).

Reference parity: ais_ivef.py:353-460 frames TCP bytes on </MSG_IVEF>,
parses with xmltodict, flattens ObjectData recursively (ais_ivef.py:226-258
— '@' attr prefixes stripped, '@Key'/'@Value' pairs promoted with default
key NavStatus), coerces each field with ast.literal_eval/strptime
(ais_ivef.py:130-207), and upserts into Postgres by Id (ais_ivef.py:286-312).
The golden record shape is the commented sample at ais_ivefParser.py:233-263.

Spark-first: the native XML source / ``from_xml`` does the parse; flattening
is a typed ``select`` over the nested struct; coercion is ``cast`` +
``to_timestamp``. Fixed vs reference: EstAccLat is NOT populated from Id
(copy-paste bug at ais_ivef.py:132).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Nested schema of one <ObjectData> record (attributePrefix '_').
OBJECT_DATA_SCHEMA = T.StructType([
    T.StructField("TrackData", T.StructType([
        T.StructField("_Id", T.StringType()),
        T.StructField("_COG", T.StringType()),
        T.StructField("_SOG", T.StringType()),
        T.StructField("_ROT", T.StringType()),
        T.StructField("_Heading", T.StringType()),
        T.StructField("_Length", T.StringType()),
        T.StructField("_Width", T.StringType()),
        T.StructField("_SourceId", T.StringType()),
        T.StructField("_SourceName", T.StringType()),
        T.StructField("_UpdateTime", T.StringType()),
        T.StructField("_TrackStatus", T.StringType()),
        T.StructField("Pos", T.StructType([
            T.StructField("_Lat", T.StringType()),
            T.StructField("_Long", T.StringType()),
        ])),
        T.StructField("NavStatus", T.StructType([
            T.StructField("_Key", T.StringType()),
            T.StructField("_Value", T.StringType()),
        ])),
    ])),
    T.StructField("VesselData", T.StructType([
        T.StructField("_Id", T.StringType()),
        T.StructField("_Class", T.StringType()),
        T.StructField("_MMSI", T.StringType()),
        T.StructField("_IMO", T.StringType()),
        T.StructField("_Callsign", T.StringType()),
        T.StructField("_Name", T.StringType()),
        T.StructField("_SourceId", T.StringType()),
        T.StructField("_SourceName", T.StringType()),
        T.StructField("_SourceType", T.StringType()),
        T.StructField("_UpdateTime", T.StringType()),
    ])),
    T.StructField("VoyageData", T.StructType([
        T.StructField("_Id", T.StringType()),
        T.StructField("_CargoTypeIMO", T.StringType()),
        T.StructField("_Draught", T.StringType()),
        T.StructField("_DestName", T.StringType()),
        T.StructField("_ETA", T.StringType()),
        T.StructField("_SourceName", T.StringType()),
        T.StructField("_SourceType", T.StringType()),
        T.StructField("_UpdateTime", T.StringType()),
    ])),
])

_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"


def read_ivef_file(spark: SparkSession, path: str) -> DataFrame:
    """S6: batch scan of an IVEF XML file, one row per <ObjectData>."""
    return (
        spark.read.format("xml")
        .option("rowTag", "ObjectData")
        .option("attributePrefix", "_")
        .schema(OBJECT_DATA_SCHEMA)
        .load(path)
    )


def parse_ivef_frames(df: DataFrame, xml_col: str = "frame") -> DataFrame:
    """S5: parse framed <ObjectData> XML strings (e.g. from a socket/Kafka
    stream framed on </MSG_IVEF> and exploded to records) via from_xml."""
    return df.withColumn(
        "record",
        F.from_xml(F.col(xml_col), OBJECT_DATA_SCHEMA, {"attributePrefix": "_"}),
    )


def _ts(col: Column) -> Column:
    return F.to_timestamp(col, _TS_FMT)


def flatten_object_data(df: DataFrame, record_col: str | None = None) -> DataFrame:
    """P25 + P26: nested ObjectData -> the flat typed track-state layout
    (FIXTURES.md B6 subset of the ~75-column SwaslaDto, ais_ivef.py:28-118).

    The '@Key/@Value' promotion (default key NavStatus, ais_ivef.py:243-252)
    becomes: take NavStatus.Value when Key is null or 'NavStatus'.
    """
    r = (F.col(record_col) if record_col else F.struct(*df.columns).alias("r"))
    td = r["TrackData"]
    vd = r["VesselData"]
    vy = r["VoyageData"]
    nav = F.when(
        td["NavStatus"]["_Key"].isNull() | (td["NavStatus"]["_Key"] == "NavStatus"),
        td["NavStatus"]["_Value"],
    )
    return df.select(
        td["_Id"].alias("Id"),
        td["Pos"]["_Lat"].try_cast("double").alias("Lat"),
        td["Pos"]["_Long"].try_cast("double").alias("Long"),
        td["_COG"].try_cast("double").alias("COG"),
        td["_SOG"].try_cast("double").alias("SOG"),
        td["_ROT"].try_cast("double").alias("ROT"),
        td["_Heading"].try_cast("double").alias("Heading"),
        td["_Length"].try_cast("double").alias("Length"),
        td["_Width"].try_cast("double").alias("Width"),
        _ts(td["_UpdateTime"]).alias("UpdateTime"),
        td["_TrackStatus"].try_cast("int").alias("TrackStatus"),
        nav.try_cast("int").alias("NavStatus"),
        td["_SourceId"].alias("SourceId"),
        td["_SourceName"].alias("SourceName"),
        vd["_Class"].try_cast("int").alias("Class"),
        vd["_MMSI"].try_cast("bigint").alias("MMSI"),
        vd["_IMO"].try_cast("bigint").alias("IMO"),
        vd["_Callsign"].alias("Callsign"),
        vd["_Name"].alias("Name"),
        vd["_SourceType"].try_cast("int").alias("SourceType"),
        vy["_CargoTypeIMO"].try_cast("int").alias("CargoTypeIMO"),
        vy["_Draught"].try_cast("double").alias("Draught"),
        vy["_DestName"].alias("DestName"),
        _ts(vy["_ETA"]).alias("ETA"),
    )


def latest_track_state(df: DataFrame) -> DataFrame:
    """J5/W2 batch twin of the Postgres upsert: newest row per track Id."""
    from pincspark.operators.keyed import latest_per_key

    return latest_per_key(
        df, "Id", order_by=[F.col("UpdateTime").desc()]
    )
