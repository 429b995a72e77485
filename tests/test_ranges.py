"""interval_join boundary semantics: half-open [lo, hi), empty intervals,
bucket-spanning intervals, and exactly-once matching."""

from __future__ import annotations


def _join(spark, points, intervals, w, keys=()):
    from pincspark.operators.ranges import interval_join

    p = spark.createDataFrame(points, "pid INT, k INT, ts LONG")
    i = spark.createDataFrame(intervals, "iid INT, k INT, lo LONG, hi LONG")
    out = interval_join(p, i, "ts", "lo", "hi", w, keys=keys)
    return sorted((r["pid"], r["iid"]) for r in out.collect())


def test_half_open_bounds(spark):
    # ts == lo matches, ts == hi does not
    got = _join(
        spark,
        [(1, 0, 100), (2, 0, 199), (3, 0, 200)],
        [(10, 0, 100, 200)],
        w=50,
    )
    assert got == [(1, 10), (2, 10)]


def test_empty_interval_matches_nothing(spark):
    got = _join(spark, [(1, 0, 100)], [(10, 0, 100, 100), (11, 0, 100, 99)], w=50)
    assert got == []


def test_interval_spanning_many_buckets_matches_once(spark):
    # interval covers 40 buckets; each point must appear exactly once
    got = _join(
        spark,
        [(1, 0, 5), (2, 0, 1999), (3, 0, 2000)],
        [(10, 0, 0, 2000)],
        w=50,
    )
    assert got == [(1, 10), (2, 10)]


def test_keys_partition_the_match(spark):
    got = _join(
        spark,
        [(1, 1, 100), (2, 2, 100)],
        [(10, 1, 0, 1000), (20, 2, 0, 1000)],
        w=100,
        keys=["k"],
    )
    assert got == [(1, 10), (2, 20)]


def test_overlapping_intervals_all_match(spark):
    got = _join(
        spark,
        [(1, 0, 150)],
        [(10, 0, 0, 200), (11, 0, 100, 160), (12, 0, 151, 300)],
        w=64,
    )
    assert got == [(1, 10), (1, 11)]
