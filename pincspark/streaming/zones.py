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

from pincspark.operators.geo import load_zone_data, point_in_polygon


def zone_flag_cols() -> list[tuple[int, str]]:
    """(zone_id, flag column name) for every zone in the zone table — the
    single melt structure every ST2 variant derives from (ADVICE r10 #5:
    the operators previously hardcoded exactly two zones with ids 1/2 and
    columns in_north/in_south, so a zone added to the table silently
    produced no transitions in the batch twin and KeyError'd q91's
    flagging loop). The column name lives IN the zone table
    (``flag_col``); entries without one default to ``in_zone<id>``."""
    return [
        (z["zone_id"], z.get("flag_col", f"in_zone{z['zone_id']}"))
        for z in load_zone_data()
    ]


def _state_schema() -> T.StructType:
    return T.StructType([
        T.StructField(flag, T.BooleanType(), True)
        for _, flag in zone_flag_cols()
    ])


STATE_SCHEMA = _state_schema()

TRANSITION_SCHEMA = T.StructType([
    T.StructField("mmsi", T.LongType(), True),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("zone_id", T.IntegerType(), True),
    T.StructField("event", T.StringType(), True),  # 'enter' | 'exit'
])


def with_zone_flags(points: DataFrame, zones: DataFrame) -> DataFrame:
    """Attach one membership boolean per zone via the broadcast PIP
    predicate; flag names come from the zone table's ``flag_col``."""
    names = dict(zone_flag_cols())
    out = points
    for r in sorted(zones.collect(), key=lambda r: r["zone_id"]):
        zone_id = r["zone_id"]
        verts = F.array(*[
            F.struct(F.lit(x).alias("x"), F.lit(y).alias("y")) for x, y in r["verts"]
        ])
        out = out.withColumn(
            names.get(zone_id, f"in_zone{zone_id}"),
            point_in_polygon(F.col("longitude"), F.col("latitude"), verts),
        )
    return out


def _make_track_group(timeout_ms: int | None):
    flags = zone_flag_cols()

    def _track_group(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (mmsi,) = key
        if state.hasTimedOut:
            state.remove()
            return
        prev = list(state.get) if state.exists else [False] * len(flags)

        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for row in pdf.itertuples(index=False):
                cur = [bool(getattr(row, flag)) for _, flag in flags]
                for (zone_id, _), now, was in zip(flags, cur, prev):
                    if now and not was:
                        rows.append((int(mmsi), row.ts, zone_id, "enter"))
                    elif was and not now:
                        rows.append((int(mmsi), row.ts, zone_id, "exit"))
                prev = cur

        state.update(tuple(prev))
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
            # derived at CALL time, not import time: the state width must
            # match the flag list the tracker closure iterates (a zone
            # table change after import would otherwise desync them)
            stateStructType=_state_schema(),
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

    flags = zone_flag_cols()

    class ZoneProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "membership",
                ", ".join(f"{flag} BOOLEAN" for _, flag in flags),
            )

        def handleInputRows(self, key, rows, timerValues):
            (mmsi,) = key
            prev = (
                list(self._state.get())
                if self._state.exists()
                else [False] * len(flags)
            )
            out = []
            for pdf in rows:
                pdf = pdf.sort_values("ts")
                for row in pdf.itertuples(index=False):
                    cur = [bool(getattr(row, flag)) for _, flag in flags]
                    for (zone_id, _), now, was in zip(flags, cur, prev):
                        if now and not was:
                            out.append((int(mmsi), row.ts, zone_id, "enter"))
                        elif was and not now:
                            out.append((int(mmsi), row.ts, zone_id, "exit"))
                    prev = cur
            self._state.update(tuple(prev))
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

    The per-zone flags MELT into (zone_id, flag) rows before a single
    lag() window over (mmsi, zone_id) — one scan and one shuffle for all
    zones (r10; the previous per-zone union re-scanned the input per
    zone), and the finer partition key parallelizes better than per-mmsi
    windows at fleet scale. The melt structs derive from the zone table
    (zone_flag_cols, ADVICE r10 #5) so a zone added there is tracked
    automatically."""
    from pyspark.sql import Window

    melted = flagged.select(
        "mmsi",
        "ts",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(zone_id).alias("zone_id"), F.col(flag).alias("flag")
                )
                for zone_id, flag in zone_flag_cols()
            ])
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
