"""Interval (range) join: match points into [lo, hi) intervals at scale.

Spark has no native range-join operator — a plain
``points JOIN intervals ON ts BETWEEN lo AND hi`` plans as a
BroadcastNestedLoopJoin (O(points x intervals), and an outright OOM when
neither side fits a broadcast). The scale-correct shape is BUCKETIZATION,
the same trick Databricks' range-join hint and KDB's window joins use:

1. pick a bucket width ``w``;
2. each interval explodes to the buckets it covers
   (floor(lo/w) .. floor((hi-1)/w));
3. each point maps to its single bucket floor(ts/w);
4. equi-join on (keys..., bucket) — a plain shuffled hash join — then
   refine with the exact predicate lo <= ts < hi.

Each matching pair meets in EXACTLY the point's bucket, so no dedup step
is needed. Cost: the interval side is replicated ~len/w times — pick ``w``
near the typical interval length (explode factor ~2); the point side never
replicates. Degenerate very-long intervals fatten the explode linearly —
split those upstream or raise ``w`` (trade more refine-filter work).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Inner-join ``points`` to every interval with
    ``lo <= point < hi`` (half-open), optionally also matching on equi
    ``keys``. All three bound columns must be numeric (cast timestamps to
    unix micros upstream); empty intervals (hi <= lo) match nothing.

    One exchange per side on (keys..., bucket), whole-stage-codegen'd
    refine filter, no nested-loop join anywhere in the plan
    (asserted in tests/test_plans.py).
    """
    w = F.lit(int(bucket_width))
    covered = F.sequence(
        F.floor(F.col(lo_col) / w).cast("bigint"),
        F.floor((F.col(hi_col) - F.lit(1)) / w).cast("bigint"),
    )
    iv = intervals.withColumn(
        "__bkt",
        F.explode(
            F.when(F.col(hi_col) > F.col(lo_col), covered).otherwise(
                F.array().cast("array<bigint>")
            )
        ),
    )
    pts = points.withColumn("__bkt", F.floor(F.col(point_col) / w).cast("bigint"))
    on = [*keys, "__bkt"]
    return (
        pts.join(iv, on=on, how="inner")
        .filter(
            (F.col(lo_col) <= F.col(point_col)) & (F.col(point_col) < F.col(hi_col))
        )
        .drop("__bkt")
    )
