"""Data-quality constraint operators: one-scan row-local census,
uniqueness counting semantics, referential orphans, NULL handling."""

from __future__ import annotations

from pyspark.sql import functions as F

from pincspark.operators.quality import (
    constraint_violations,
    duplicate_key_count,
    orphan_count,
)


def test_rowlocal_census_single_scan(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -3.0), (3, None), (4, 200.0)],
        "id int, v double",
    )
    out = constraint_violations(
        df,
        {
            "v_negative": F.col("v") < 0,
            "v_null": F.col("v").isNull(),
            "v_over_100": F.col("v") > 100,
        },
    )
    # single aggregation pass: exactly one source leaf in the plan (all
    # rules share one scan). Captured BEFORE the action — post-execution
    # AQE renders initial+final plans and doubles every leaf.
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") + plan.count("LocalTableScan") == 1
    assert "Union" not in plan
    got = {r["rule"]: r["violations"] for r in out.collect()}
    assert got == {"v_negative": 1, "v_null": 1, "v_over_100": 1}


def test_rowlocal_census_empty_table_zeroes(spark):
    df = spark.createDataFrame([], "id int, v double")
    got = {
        r["rule"]: r["violations"]
        for r in constraint_violations(df, {"v_null": F.col("v").isNull()}).collect()
    }
    assert got == {"v_null": 0}


def test_duplicate_key_counts_every_row_of_dup_tuple(spark):
    df = spark.createDataFrame(
        [(1, 1), (1, 1), (1, 1), (2, 1), (3, 1), (3, 2)], "a int, b int"
    )
    out = duplicate_key_count(df, ["a", "b"]).collect()[0]
    assert (out["rule"], out["violations"]) == ("duplicate_key", 3)


def test_orphan_count_ignores_null_keys(spark):
    child = spark.createDataFrame([(1,), (2,), (9,), (None,)], "fk int")
    parent = spark.createDataFrame([(1,), (2,)], "pk int")
    out = orphan_count(child, parent, "fk", "pk").collect()[0]
    assert (out["rule"], out["violations"]) == ("orphan_key", 1)
