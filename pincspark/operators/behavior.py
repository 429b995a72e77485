"""Behavioral analytics: ordered funnels and cohort retention.

The warehouse-classic event-sequence queries. Both are single-pass
conditional aggregations — one shuffle keyed on the entity, no joins on
the fact side (the cohort join touches only the per-entity aggregate,
which is dimension-sized). At 100 TB the event scan dominates; nothing
here adds a second pass over it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    key: str,
    ts_col: str,
    step_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Ordered funnel: per ``key``, the deepest prefix of ``steps``
    completed IN ORDER (each step's earliest occurrence strictly after
    the previous step's earliest qualifying time). Returns
    (key, reached int) where reached = number of completed steps.

    One conditional aggregation computes every step's earliest timestamp
    (min over a CASE), then the order check folds left on the driver-side
    expression tree — a single shuffle, no self-joins (the naive
    N-self-join funnel is quadratic in scan count)."""
    mins = [
        F.min(F.when(F.col(step_col) == s, F.col(ts_col))).alias(f"t{i}")
        for i, s in enumerate(steps)
    ]
    agg = events.groupBy(key).agg(*mins)
    reached: Column = F.lit(0)
    prev_ok: Column = F.lit(True)
    prev_t: Column | None = None
    for i in range(len(steps)):
        t = F.col(f"t{i}")
        ok = prev_ok & t.isNotNull() & (F.lit(True) if prev_t is None else (t > prev_t))
        reached = reached + ok.cast("int")
        prev_ok, prev_t = ok, t
    return agg.select(key, reached.alias("reached"))


def cohort_retention(
    events: DataFrame,
    key: str,
    ts_col: str,
    period: str = "week",
) -> DataFrame:
    """Cohort retention table: entities grouped by their FIRST-activity
    period; for each (cohort, periods_since) the number of distinct
    entities active. Two aggregations over entity-period pairs (the
    first collapses the fact table to distinct entity-periods; the
    cohort assignment is a window min over that collapsed table, never
    the raw events). Returns (cohort_period, periods_since, active)."""
    from pyspark.sql import Window

    p = F.date_trunc(period, F.col(ts_col))
    ep = events.select(F.col(key), p.alias("p")).distinct()
    w = Window.partitionBy(key)
    coh = ep.withColumn("cohort", F.min("p").over(w))
    unit = {"week": 7 * 86400, "day": 86400}[period]
    out = (
        coh.withColumn(
            "periods_since",
            ((F.unix_timestamp("p") - F.unix_timestamp("cohort")) / unit).cast("bigint"),
        )
        .groupBy(F.col("cohort").alias("cohort_period"), "periods_since")
        .agg(F.count_distinct(key).cast("bigint").alias("active"))
    )
    return out
