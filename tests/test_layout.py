"""Z-order layout operator: Morton-key arithmetic pinned on a hand-computed
grid, clusteredness (per-bucket range coverage) compared against a hash
layout, and the physical write path's partition pruning plan-asserted."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pincspark.operators.layout import (
    bucket_tightness,
    write_zorder_layout,
    zorder_assign,
)

# Morton codes for a 4x4 grid (2 bits/dim, x = dim 0 -> even bit
# positions, y = dim 1 -> odd): z = interleave(x, y).
MORTON_4X4 = {
    (0, 0): 0, (1, 0): 1, (0, 1): 2, (1, 1): 3,
    (2, 0): 4, (3, 0): 5, (2, 1): 6, (3, 1): 7,
    (0, 2): 8, (1, 2): 9, (0, 3): 10, (1, 3): 11,
    (2, 2): 12, (3, 2): 13, (2, 3): 14, (3, 3): 15,
}


def test_morton_key_matches_hand_computed_grid(spark):
    rows = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "x long, y long")
    # values 0..3 with bits=2 scale to themselves: (v-0)*3 div 3 = v
    out = zorder_assign(df, ["x", "y"], bits=2, n_buckets=4)
    got = {(r["x"], r["y"]): r["zkey"] for r in out.collect()}
    assert got == MORTON_4X4
    # top 2 bits of the 4-bit key = quadrant
    quads = {(r["x"], r["y"]): r["zbucket"] for r in out.collect()}
    assert quads[(0, 0)] == 0 and quads[(3, 0)] == 1
    assert quads[(0, 3)] == 2 and quads[(3, 3)] == 3


def test_keys_are_partitioning_invariant(spark):
    df = spark.createDataFrame(
        [(i, (i * 37) % 1000, (i * 91) % 1000) for i in range(2000)],
        "id long, a long, b long",
    )
    k1 = zorder_assign(df, ["a", "b"]).select("id", "zkey", "zbucket")
    k2 = zorder_assign(df.repartition(13), ["a", "b"]).select("id", "zkey", "zbucket")
    assert k1.exceptAll(k2).count() == 0 and k2.exceptAll(k1).count() == 0


def test_zorder_buckets_are_tighter_than_hash_layout(spark):
    from pincspark.sources.tables import table
    from tests.conftest import SF_DIR_T2

    li = table(spark, SF_DIR_T2, "lineitem").select("l_partkey", "l_suppkey")
    keyed = zorder_assign(li, ["l_partkey", "l_suppkey"], bits=16, n_buckets=64)
    z = bucket_tightness(keyed, ["l_partkey", "l_suppkey"]).agg(
        F.avg("coverage_l_partkey").alias("p"), F.avg("coverage_l_suppkey").alias("s")
    ).collect()[0]
    hashed = li.withColumn(
        "zbucket", F.pmod(F.hash("l_partkey", "l_suppkey"), F.lit(64))
    )
    h = bucket_tightness(hashed, ["l_partkey", "l_suppkey"]).agg(
        F.avg("coverage_l_partkey").alias("p"), F.avg("coverage_l_suppkey").alias("s")
    ).collect()[0]
    # hash layout: every bucket spans ~the full range of both dims.
    assert h["p"] > 0.9 and h["s"] > 0.9
    # z-order with 64 buckets over 2 dims: ~1/8 of each dim per bucket.
    assert z["p"] < 0.3 and z["s"] < 0.3


def test_written_layout_prunes_partitions(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, (i * 37) % 4096, (i * 91) % 4096) for i in range(5000)],
        "id long, a long, b long",
    )
    path = str(tmp_path / "zl")
    write_zorder_layout(df, path, ["a", "b"], bits=16, n_buckets=16)
    back = spark.read.parquet(path)
    assert back.count() == 5000
    pruned = back.filter(F.col("zbucket") == 3)
    # the bucket column is a hive partition dir: the predicate must reach
    # the scan as a PartitionFilter (directory pruning, zero data read
    # outside the bucket)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "(zbucket" in plan.split("PartitionFilters", 1)[1][:120]
    on_disk = {r["zbucket"] for r in pruned.select("zbucket").distinct().collect()}
    assert on_disk == {3}


def test_n_buckets_must_be_power_of_two(spark):
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError):
        zorder_assign(df, ["a", "b"], n_buckets=48)


def test_compact_parquet_shrinks_files_keeps_rows(spark, tmp_path):
    """40 tiny fragments -> a handful of target-sized files, content
    identical, no tmp/aside residue."""
    import os

    from pincspark.operators.layout import _parquet_files, compact_parquet

    path = str(tmp_path / "frag")
    df = spark.range(20000).select(
        F.col("id"), (F.col("id") % 97).alias("k"), F.sha1(F.col("id").cast("string")).alias("pad")
    )
    df.repartition(40).write.parquet(path)
    assert len(_parquet_files(spark, path)) == 40
    before = sorted(tuple(r) for r in spark.read.parquet(path).collect())

    stats = compact_parquet(spark, path, target_mb=1)
    assert stats["files_before"] == 40
    assert stats["files_after"] < 40
    # parquet re-encode can shift bytes slightly; rows must be identical
    after = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert after == before
    assert not os.path.exists(path + ".__tmp__")
    assert not os.path.exists(path + ".__old__")


def test_compact_parquet_sorted_gives_disjoint_file_ranges(spark, tmp_path):
    """sort_by clusters the rewrite: each output file owns a disjoint id
    range (the min/max file-pruning contract)."""
    from pincspark.operators.layout import compact_parquet

    path = str(tmp_path / "clust")
    spark.range(50000).select(
        F.col("id"), F.sha1(F.col("id").cast("string")).alias("pad")
    ).repartition(30).write.parquet(path)

    compact_parquet(spark, path, target_mb=1, sort_by=["id"])
    ranges = (
        spark.read.parquet(path)
        .select("id", F.input_file_name().alias("f"))
        .groupBy("f")
        .agg(F.min("id").alias("mn"), F.max("id").alias("mx"))
        .collect()
    )
    assert len(ranges) > 1  # actually split across files
    spans = sorted((r["mn"], r["mx"]) for r in ranges)
    for (_, mx_prev), (mn_next, _) in zip(spans, spans[1:]):
        assert mx_prev < mn_next, spans


def test_backfill_partitions_touches_only_present_partitions(spark, tmp_path):
    """Dynamic partition overwrite: rewriting day 2 leaves days 1 and 3
    byte-untouched; re-running the same backfill is idempotent."""
    import os

    from pincspark.operators.layout import backfill_partitions

    path = str(tmp_path / "t")
    full = spark.createDataFrame(
        [(d, i, f"v{d}{i}") for d in (1, 2, 3) for i in range(5)],
        "day int, id int, v string",
    )
    backfill_partitions(full, path, ["day"])

    def mtimes(day):
        p = os.path.join(path, f"day={day}")
        return {f: os.path.getmtime(os.path.join(p, f)) for f in os.listdir(p)}

    before1, before3 = mtimes(1), mtimes(3)
    fix = spark.createDataFrame([(2, i, f"FIXED{i}") for i in range(5)],
                                "day int, id int, v string")
    backfill_partitions(fix, path, ["day"])
    assert mtimes(1) == before1 and mtimes(3) == before3  # untouched files
    got = spark.read.parquet(path)
    assert got.filter("day = 2").filter("v like 'FIXED%'").count() == 5
    assert got.count() == 15
    # the session setting must not leak
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode").upper() == "STATIC"
