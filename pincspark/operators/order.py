"""Distributed total ordering: global rank / sorted export without a
single-partition window.

Spark sorts globally just fine — ``orderBy`` plans a range exchange plus a
local sort, fully distributed. What it does NOT do at scale is *number* that
order: ``row_number() OVER (ORDER BY ...)`` with an empty PARTITION BY plans
a SINGLE-partition window (Spark even warns "No Partition Defined for Window
operation"), funneling the whole table through one task. At 100 TB that one
task is the job.

``global_rank`` produces the identical ranks with the classic two-phase
construction (the same idea as ``RDD.zipWithIndex``, kept in the DataFrame/
Arrow world):

1. range-partition on the sort keys + sort within partitions — the exact
   physical plan of a distributed ``orderBy`` (ONE exchange, parallel sort);
2. a zero-shuffle ``mapInPandas`` stamps each row's 1-based position within
   its partition (batches arrive in sorted order, so a running counter is
   the rank);
3. per-partition row counts (map-side-combined aggregation: one tiny row per
   partition) become exclusive prefix-sum offsets — the only "global" step,
   a window over at most ``num_partitions`` rows (thousands of rows on a
   thousand-executor cluster, never data-sized);
4. a broadcast join adds each row's partition offset: rank = offset + local
   position.

The result is independent of the partition count and of the (sampled) range
boundaries: range partitions are non-overlapping and ordered by partition
id, so offset + local position reproduces exactly ``row_number() OVER
(ORDER BY ...)`` — provided the key set is a TOTAL order (include a unique
tie-breaker; equal keys would otherwise land ranks arbitrarily). Callers
must also mind nulls: Spark sorts NULLS FIRST ascending by default while
DuckDB defaults to NULLS LAST, so keep rank keys non-null (or make the
null ordering explicit on both sides) when oracle-matching.

Uses: curriculum ordering (rank by a difficulty/quality score, then bucket),
sorted exports, percentile assignment, stable global ids for a corpus.

Reference parity: the reference's pandas batch job materializes its analysis
frame single-process and numbers rows with a plain index
(ais_analysis.py:308-498) — a total order it gets for free at one process,
re-expressed here as the scale-safe two-phase rank.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from pincspark.staging import stage

_PID = "_gr_pid"
_LR = "_gr_lr"


def _sort_cols(order_by: Sequence[tuple[str, bool]]) -> list[Column]:
    return [
        F.col(name).asc() if ascending else F.col(name).desc()
        for name, ascending in order_by
    ]


def _stamp_local_rank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: 1-based position of each row within its (already
    sorted) partition. Narrow — batches stream through in partition order,
    state is one integer."""
    seen = 0
    for pdf in batches:
        n = len(pdf)
        pdf = pdf.copy()
        pdf[_LR] = np.arange(seen + 1, seen + n + 1, dtype="int64")
        seen += n
        yield pdf


def global_rank(
    df: DataFrame,
    order_by: Sequence[tuple[str, bool]],
    rank_col: str = "rnk",
    num_partitions: int | None = None,
    total_col: str | None = None,
) -> DataFrame:
    """Add ``rank_col`` = ``row_number() OVER (ORDER BY ...)`` (1-based,
    dense in the row_number sense: every row gets a distinct rank) without
    ever collapsing the data to one task.

    ``order_by`` is a sequence of ``(column_name, ascending)`` pairs that
    must define a TOTAL order (append a unique key as tie-breaker). The
    output rank is independent of ``num_partitions``.

    ``total_col``: optionally also attach the TOTAL row count as a column
    (= ``COUNT(*) OVER ()``). It falls out of the per-partition counts the
    offset pass already aggregates — one more window expression over the
    same <= num_partitions rows — so callers that need (rank, total) pairs
    (percentiles, decile buckets) never pay a separate eager ``count()``
    pass over the data (ADVICE r12).

    Plan shape: one range exchange + local sort + ArrowEvalPython (the
    local-rank stamp), staged once; then a tiny per-partition count agg
    (rows == partitions), a prefix-sum window over those counts only, and
    a broadcast join back. No data-sized shuffle after the range exchange,
    no single-partition pass over the data.
    """
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    cols = _sort_cols(order_by)
    ranged = (
        df.repartitionByRange(num_partitions, *cols)
        .sortWithinPartitions(*cols)
        .withColumn(_PID, F.spark_partition_id())
    )
    # A fresh StructType: StructType.add MUTATES (and .schema is the
    # DataFrame's cached instance, so mutating it corrupts `ranged`'s own
    # column list).
    out_schema = StructType(
        list(ranged.schema.fields) + [StructField(_LR, LongType(), nullable=False)]
    )
    # Stage once: both the count branch and the final join re-read the
    # sorted+stamped rows; without the barrier the range sort would run
    # twice (and, on some plans, re-sample different range boundaries).
    stamped = stage(ranged.mapInPandas(_stamp_local_rank, out_schema),
                    "global_rank:stamped")
    counts = stamped.groupBy(_PID).agg(F.count(F.lit(1)).alias("_gr_cnt"))
    # The ONLY single-partition step: a prefix sum over <= num_partitions
    # rows (one row per partition, never data-sized).
    w = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    sel = [
        F.col(_PID),
        F.coalesce(F.sum("_gr_cnt").over(w), F.lit(0)).alias("_gr_off"),
    ]
    if total_col is not None:
        wt = Window.orderBy(_PID).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        sel.append(F.sum("_gr_cnt").over(wt).cast("bigint").alias(total_col))
    offsets = counts.select(*sel)
    out = stamped.join(F.broadcast(offsets), _PID)
    return (
        out.withColumn(rank_col, (F.col("_gr_off") + F.col(_LR)).cast("bigint"))
        .drop(_PID, _LR, "_gr_off")
    )
