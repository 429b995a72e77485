"""KMV sketches: estimator accuracy vs exact counts, the exact path under
k, merge == rebuild-from-raw identity, and NULL handling."""

from __future__ import annotations

from pyspark.sql import functions as F

from pincspark.operators.sketches import kmv_estimate, kmv_merge, kmv_sketch


def _mkdf(spark, groups):
    rows = [(g, f"{g}:{v}") for g, n in groups for v in range(n)]
    return spark.createDataFrame(rows, "grp string, val string")


def test_exact_under_k(spark):
    df = _mkdf(spark, [("a", 100)])
    est = kmv_estimate(kmv_sketch(df, ["grp"], "val", k=256), ["grp"], k=256).collect()
    assert est[0]["n_kept"] == 100 and est[0]["est_distinct"] == 100


def test_estimate_within_stderr(spark):
    # 20000 distinct values, k=256: KMV standard error ~ 1/sqrt(k) ~ 6%;
    # deterministic hashes make this a fixed (not flaky) assertion
    df = _mkdf(spark, [("a", 20000)])
    est = kmv_estimate(kmv_sketch(df, ["grp"], "val", k=256), ["grp"], k=256).collect()
    got = est[0]["est_distinct"]
    assert est[0]["n_kept"] == 256
    assert abs(got - 20000) / 20000 < 0.2, got


def test_merge_equals_rebuild(spark):
    """k smallest of a union of per-group sketches == the sketch built
    from the union's raw values — the property that makes persisted daily
    sketches mergeable without rescanning."""
    df = _mkdf(spark, [("a", 3000), ("b", 3000)])
    per = kmv_sketch(df, ["grp"], "val", k=256)
    merged = sorted(r["h"] for r in kmv_merge(per, [], k=256).collect())
    rebuilt = sorted(
        r["h"]
        for r in kmv_sketch(df.withColumn("grp", F.lit("all")), ["grp"], "val", k=256).collect()
    )
    assert merged == rebuilt


def test_duplicates_and_nulls_ignored(spark):
    rows = [("a", "x"), ("a", "x"), ("a", "y"), ("a", None)]
    df = spark.createDataFrame(rows, "grp string, val string")
    est = kmv_estimate(kmv_sketch(df, ["grp"], "val", k=8), ["grp"], k=8).collect()
    assert est[0]["n_kept"] == 2 and est[0]["est_distinct"] == 2
