"""global_rank: equivalence to the single-window row_number, partition-count
independence, multi-batch partitions, empties, and the plan contract (one
range exchange over the data; the only single-partition step is the
partition-COUNT prefix sum)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pincspark.operators.order import global_rank
from pincspark.planhooks import capture_staged_plans


def _toy(spark, n=200):
    # v has heavy ties (n % 7) so the tie-breaker actually decides ranks
    return spark.range(0, n).selectExpr(
        "id AS k", "CAST(id % 7 AS DOUBLE) AS v"
    )


def _expected(df):
    w = Window.orderBy(F.col("v").desc(), F.col("k").asc())
    return {
        (r["k"], r["rnk"])
        for r in df.withColumn("rnk", F.row_number().over(w)).collect()
    }


def test_matches_single_window_row_number(spark):
    df = _toy(spark)
    got = {
        (r["k"], r["rnk"])
        for r in global_rank(df, [("v", False), ("k", True)], num_partitions=5).collect()
    }
    assert got == _expected(df)


def test_rank_independent_of_partition_count(spark):
    df = _toy(spark, 333)
    keys = [("v", False), ("k", True)]
    a = sorted((r["k"], r["rnk"]) for r in global_rank(df, keys, num_partitions=3).collect())
    b = sorted((r["k"], r["rnk"]) for r in global_rank(df, keys, num_partitions=11).collect())
    assert a == b


def test_multiple_arrow_batches_per_partition(spark):
    """The local-rank stamp carries its counter ACROSS batches — force >1
    Arrow batch per partition and check ranks stay contiguous."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        df = _toy(spark, 500)
        got = {
            (r["k"], r["rnk"])
            for r in global_rank(df, [("v", False), ("k", True)], num_partitions=3).collect()
        }
        assert got == _expected(df)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_ascending_keys_and_default_partitions(spark):
    df = _toy(spark, 50)
    out = global_rank(df, [("k", True)]).collect()
    assert {(r["k"], r["rnk"]) for r in out} == {(i, i + 1) for i in range(50)}


def test_empty_input(spark):
    df = _toy(spark).filter(F.col("k") < 0)
    assert global_rank(df, [("k", True)], num_partitions=4).count() == 0


def test_rank_column_name_and_type(spark):
    out = global_rank(_toy(spark, 10), [("k", True)], rank_col="position")
    assert dict(out.dtypes)["position"] == "bigint"


def test_plan_contract(spark):
    """The scale contract: the data-sized plan has exactly ONE exchange (the
    range repartition) feeding a non-global sort and the Arrow stamp; the
    final plan's only window runs over the per-partition COUNTS (grouped,
    partition-id keyed), never over the data, and the offset join is a
    broadcast."""
    df = _toy(spark, 300)
    with capture_staged_plans() as sink:
        out = global_rank(df, [("v", False), ("k", True)], num_partitions=4)
        final_plan = out._jdf.queryExecution().executedPlan().toString()
    staged = [p for label, p in sink if label == "global_rank:stamped"]
    assert staged, "global_rank no longer stages through pincspark.staging"
    pre = staged[0]
    assert pre.count("Exchange") == 1, pre
    assert "rangepartitioning" in pre, pre
    # sortWithinPartitions, not a global sort
    assert "Sort [v" in pre and "false, 0" in pre.split("Sort [", 1)[1][:120], pre
    # the stamp is an Arrow-batched map, not row-Python
    assert "MapInPandas" in pre or "ArrowEvalPython" in pre, pre
    # Post-stage: broadcast offset join; the single-partition window sees
    # only the count rows (its input is the groupBy(_gr_pid) aggregate).
    assert "BroadcastHashJoin" in final_plan, final_plan
    assert "SortMergeJoin" not in final_plan, final_plan
    win_at = final_plan.find("Window [")
    assert win_at != -1 and "_gr_cnt" in final_plan[win_at : win_at + 400], final_plan


def test_total_col_matches_count_without_extra_pass(spark):
    """total_col attaches COUNT(*) OVER () derived from the per-partition
    counts the offset pass already aggregates — every row carries the
    exact total, and the value is partition-count independent."""
    df = _toy(spark, 217)
    for parts in (3, 9):
        out = global_rank(
            df, [("v", False), ("k", True)], num_partitions=parts, total_col="tot"
        ).collect()
        assert len(out) == 217
        assert all(r["tot"] == 217 for r in out)
