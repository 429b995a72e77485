"""q102 sequence assembly: hand-built journeys, determinism under
partitioning/encounter order (the collect_list trap), and the one-shuffle
plan contract."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from pincspark.plans.queries import q102_user_journeys
from tests.conftest import SF_DIR


def _log(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # user 1: ts order differs from insertion order; event 11 ties on
        # ts with event 12 and must win by event_id
        (13, t0 + dt.timedelta(seconds=9), 1, "buy"),
        (11, t0 + dt.timedelta(seconds=5), 1, "view"),
        (12, t0 + dt.timedelta(seconds=5), 1, "cart"),
        # user 2: single event
        (21, t0, 2, "view"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def _assemble(df):
    seq = F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type")))
    return df.groupBy("user_id").agg(
        F.array_join(F.transform(seq, lambda x: x["event_type"]), ">").alias(
            "journey"
        )
    )


def test_hand_built_journeys(spark):
    got = {r["user_id"]: r["journey"] for r in _assemble(_log(spark)).collect()}
    assert got == {1: "view>cart>buy", 2: "view"}


def test_journey_is_partitioning_and_order_invariant(spark):
    """collect_list alone is documented non-deterministic under reordering;
    the array_sort(struct) form must give identical strings however the
    rows arrive."""
    df = _log(spark)
    base = sorted(map(tuple, _assemble(df).collect()))
    scrambled = df.orderBy(F.col("event_id").desc()).repartition(7)
    assert sorted(map(tuple, _assemble(scrambled).collect())) == base


def test_q102_one_shuffle(spark):
    plan = (
        q102_user_journeys(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "Window" not in plan, plan
