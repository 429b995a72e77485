"""ST2 — zone entry/exit tracking as a keyed state machine + A4 occupancy
aggregation.

Reference parity: ais_webSocketServerDb.py:25-26,169-170,226-260 keeps
per-zone membership deques keyed by mmsi: a position report inside a zone
adds the vessel, a report outside removes it and bumps a cumulative exit
counter; every update pushes an occupancy summary to subscribers.

Spark-first split:
1. Zone membership per position is computed BEFORE the stateful operator
   with the pure-SQL point-in-polygon predicate (JVM-side, broadcast zones)
   — the Python state function only compares booleans.
2. ``track_zone_transitions`` (applyInPandasWithState keyed by mmsi) emits
   enter/exit TRANSITION rows — the minimal state (two booleans/vessel).
3. ``occupancy_summary`` turns transitions into the reference's counters
   {in_N, in_S, left_N, left_S} with a plain aggregation, streamable in
   update mode or batch.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from pincspark.operators.geo import point_in_polygon

STATE_SCHEMA = T.StructType([
    T.StructField("in_north", T.BooleanType(), True),
    T.StructField("in_south", T.BooleanType(), True),
])

TRANSITION_SCHEMA = T.StructType([
    T.StructField("mmsi", T.LongType(), True),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("zone_id", T.IntegerType(), True),
    T.StructField("event", T.StringType(), True),  # 'enter' | 'exit'
])


def with_zone_flags(points: DataFrame, zones: DataFrame) -> DataFrame:
    """Attach in_north/in_south booleans via the broadcast PIP predicate."""
    zrows = {r["zone_id"]: r["verts"] for r in zones.collect()}
    out = points
    for zone_id, name in ((1, "in_north"), (2, "in_south")):
        verts = F.array(*[
            F.struct(F.lit(x).alias("x"), F.lit(y).alias("y")) for x, y in zrows[zone_id]
        ])
        out = out.withColumn(
            name, point_in_polygon(F.col("longitude"), F.col("latitude"), verts)
        )
    return out


def _make_track_group(timeout_ms: int | None):
    def _track_group(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (mmsi,) = key
        if state.hasTimedOut:
            state.remove()
            return
        in_n, in_s = state.get if state.exists else (False, False)

        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for row in pdf.itertuples(index=False):
                for zone_id, now, prev in (
                    (1, bool(row.in_north), in_n),
                    (2, bool(row.in_south), in_s),
                ):
                    if now and not prev:
                        rows.append((int(mmsi), row.ts, zone_id, "enter"))
                    elif prev and not now:
                        rows.append((int(mmsi), row.ts, zone_id, "exit"))
                in_n, in_s = bool(row.in_north), bool(row.in_south)

        state.update((in_n, in_s))
        if timeout_ms:
            state.setTimeoutDuration(timeout_ms)
        if rows:
            yield pd.DataFrame(rows, columns=["mmsi", "ts", "zone_id", "event"])

    return _track_group


def track_zone_transitions(
    flagged: DataFrame, timeout_ms: int | None = 24 * 3600 * 1000
) -> DataFrame:
    """ST2 core: flagged position stream -> enter/exit transition stream.
    ``timeout_ms`` evicts vessels silent for that long (None = NoTimeout,
    for deterministic micro-batch tests)."""
    return (
        flagged.groupBy("mmsi")
        .applyInPandasWithState(
            _make_track_group(timeout_ms),
            outputStructType=TRANSITION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if timeout_ms
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def track_zone_transitions_tws(flagged: DataFrame) -> DataFrame:
    """ST2 on the current-generation state API (``transformWithState`` /
    StatefulProcessor, Spark 4): identical semantics to
    :func:`track_zone_transitions`; prefer this on runtimes where the new
    operator's state-store features (TTL, timers, column families) matter.

    Requires the ``protobuf`` Python package (the transformWithState
    control channel) — absent in minimal containers, in which case use the
    applyInPandasWithState variant.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class ZoneProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "membership", "in_north BOOLEAN, in_south BOOLEAN"
            )

        def handleInputRows(self, key, rows, timerValues):
            (mmsi,) = key
            in_n, in_s = (
                tuple(self._state.get()) if self._state.exists() else (False, False)
            )
            out = []
            for pdf in rows:
                pdf = pdf.sort_values("ts")
                for row in pdf.itertuples(index=False):
                    for zone_id, now, prev in (
                        (1, bool(row.in_north), in_n),
                        (2, bool(row.in_south), in_s),
                    ):
                        if now and not prev:
                            out.append((int(mmsi), row.ts, zone_id, "enter"))
                        elif prev and not now:
                            out.append((int(mmsi), row.ts, zone_id, "exit"))
                    in_n, in_s = bool(row.in_north), bool(row.in_south)
            self._state.update((in_n, in_s))
            if out:
                yield pd.DataFrame(out, columns=["mmsi", "ts", "zone_id", "event"])

        def close(self) -> None:
            pass

    return (
        flagged.groupBy("mmsi")
        .transformWithStateInPandas(
            statefulProcessor=ZoneProcessor(),
            outputStructType=TRANSITION_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )


def occupancy_summary(transitions: DataFrame) -> DataFrame:
    """A4: the reference's counters per zone — current occupancy
    (enters - exits) and cumulative exits."""
    return (
        transitions.groupBy("zone_id")
        .agg(
            F.sum(F.when(F.col("event") == "enter", 1).otherwise(0)).alias("n_enters"),
            F.sum(F.when(F.col("event") == "exit", 1).otherwise(0)).alias("n_exits"),
        )
        .select(
            "zone_id",
            (F.col("n_enters") - F.col("n_exits")).alias("currently_in"),
            F.col("n_exits").alias("cumulative_exits"),
        )
    )


def track_zone_transitions_batch(flagged: DataFrame) -> DataFrame:
    """Batch twin of ST2 (same semantics, one window pass): a transition is
    any row whose zone membership differs from the previous report of the
    same vessel (first report inside a zone is an 'enter').

    The two zone flags MELT into (zone_id, flag) rows before a single
    lag() window over (mmsi, zone_id) — one scan and one shuffle for both
    zones (r10; the previous per-zone union re-scanned the input per
    zone), and the finer partition key parallelizes better than per-mmsi
    windows at fleet scale."""
    from pyspark.sql import Window

    melted = flagged.select(
        "mmsi",
        "ts",
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("zone_id"), F.col("in_north").alias("flag")
                ),
                F.struct(
                    F.lit(2).alias("zone_id"), F.col("in_south").alias("flag")
                ),
            )
        ).alias("z"),
    ).select("mmsi", "ts", F.col("z.zone_id").alias("zone_id"), F.col("z.flag").alias("flag"))
    w = Window.partitionBy("mmsi", "zone_id").orderBy(F.col("ts").asc())
    return (
        melted.withColumn(
            "__prev", F.coalesce(F.lag("flag").over(w), F.lit(False))
        )
        .filter(F.col("flag") != F.col("__prev"))
        .select(
            "mmsi",
            "ts",
            "zone_id",
            F.when(F.col("flag"), F.lit("enter"))
            .otherwise(F.lit("exit"))
            .alias("event"),
        )
    )
