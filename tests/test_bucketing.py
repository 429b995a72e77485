"""Bucketed co-located joins (operators/scale.py — r11 additions): the pay-once-at-
write layout tool. The whole point is the PLAN property — a fact-to-fact
equi-join on the bucket keys must contain zero shuffle exchanges — so
that is pinned here alongside result parity with a plain join and the
restart path (re-attaching an existing bucketed directory to a fresh
catalog)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pincspark.operators.scale import (
    bucketed_join,
    register_existing_bucketed,
    write_bucketed,
)


@pytest.fixture
def facts(spark):
    left = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
    )
    right = spark.range(0, 6000).select(
        (F.col("id") % 2000).alias("k"), (F.col("id") * 3).alias("val")
    )
    return left, right


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cobucketed_join_plans_zero_exchanges(spark, facts, tmp_path):
    """Both sides bucketed on the join key with equal counts: the SMJ runs
    directly on co-located buckets — NO Exchange anywhere in the join
    plan. AQE/broadcast disabled so the initial plan is the final word."""
    left, right = facts
    write_bucketed(left, "tb_left", "k", 4, path=str(tmp_path / "l"))
    write_bucketed(right, "tb_right", "k", 4, path=str(tmp_path / "r"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "tb_left", "tb_right", "k")
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and the result matches the plain (shuffled) join
        got = sorted((r["k"], r["grp"], r["val"]) for r in j.collect())
        want = sorted(
            (r["k"], r["grp"], r["val"])
            for r in left.join(right, "k").collect()
        )
        assert got == want and len(got) == 6000
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS tb_left")
        spark.sql("DROP TABLE IF EXISTS tb_right")


def test_bucketed_aggregation_skips_exchange(spark, facts, tmp_path):
    """A groupBy on the bucket key rides the scan's partitioning too —
    bucketing amortizes aggregations, not just joins."""
    left, _ = facts
    write_bucketed(left, "tb_agg", "k", 4, path=str(tmp_path / "a"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = _plan(spark.table("tb_agg").groupBy("k").agg(F.sum("grp")))
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.sql("DROP TABLE IF EXISTS tb_agg")


def test_register_existing_bucketed_survives_catalog_loss(spark, facts, tmp_path):
    """The in-memory catalog forgets tables on restart; re-attaching the
    SAME directory with the SAME bucket DDL restores the exchange-free
    property (the metastore path on a real deployment)."""
    left, right = facts
    write_bucketed(left, "tb_l2", "k", 4, path=str(tmp_path / "l2"))
    write_bucketed(right, "tb_r2", "k", 4, path=str(tmp_path / "r2"))
    n_before = bucketed_join(spark, "tb_l2", "tb_r2", "k").count()
    # simulate a fresh session's empty catalog
    spark.sql("DROP TABLE tb_l2")
    spark.sql("DROP TABLE tb_r2")
    register_existing_bucketed(
        spark, "tb_l2", str(tmp_path / "l2"), "k BIGINT, grp BIGINT", "k", 4
    )
    register_existing_bucketed(
        spark, "tb_r2", str(tmp_path / "r2"), "k BIGINT, val BIGINT", "k", 4
    )
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "tb_l2", "tb_r2", "k")
        assert "Exchange" not in _plan(j)
        assert j.count() == n_before
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS tb_l2")
        spark.sql("DROP TABLE IF EXISTS tb_r2")


def test_mismatched_bucket_counts_fall_back_to_shuffle(spark, facts, tmp_path):
    """Documented convention check: UNEQUAL bucket counts do NOT co-locate
    — Spark shuffles at least one side. Pinned so the 'bucket counts must
    match' doc claim stays true against Spark upgrades."""
    left, right = facts
    write_bucketed(left, "tb_l3", "k", 4, path=str(tmp_path / "l3"))
    write_bucketed(right, "tb_r3", "k", 8, path=str(tmp_path / "r3"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(bucketed_join(spark, "tb_l3", "tb_r3", "k"))
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS tb_l3")
        spark.sql("DROP TABLE IF EXISTS tb_r3")


def test_rewrite_to_same_external_path_succeeds(spark, facts, tmp_path):
    """ADVICE r11 #2: DROP TABLE on an external table leaves data files
    behind, so a second write_bucketed(path=...) to the same location
    used to become a CTAS into a non-empty directory (rejected by
    Spark). write_bucketed must clear the location first — a rewrite is
    a rewrite, matching the managed-table overwrite semantics."""
    left, right = facts
    loc = str(tmp_path / "rw")
    write_bucketed(left, "tb_rw", "k", 4, path=loc)
    n_first = spark.table("tb_rw").count()
    try:
        # second write: DIFFERENT data, same table name + same path
        write_bucketed(left.filter(F.col("k") < 100), "tb_rw", "k", 4,
                       path=loc)
        assert spark.table("tb_rw").count() == 100 != n_first
        # stale files from the first write must not leak into scans
        assert (
            spark.table("tb_rw").agg(F.max("k")).collect()[0][0] == 99
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS tb_rw")
