"""Z-order (Morton-curve) data layout for multi-dimensional scan pruning —
the table-layout optimization behind Delta/Iceberg ``OPTIMIZE ZORDER BY``:
rows close in several filter dimensions land in the same files, so
parquet min/max footer stats skip most of the table for conjunctive range
predicates on ANY of the clustered columns (a single-column sort only
prunes its leading column).

At 100 TB this is the difference between "every query scans the table"
and "point-ish queries read a few files": cluster once on write, prune on
every read.

Everything is integer arithmetic (scale to a 2^bits grid with integer
div, interleave bits via div/mod/multiply — no engine-specific bit
operators), so the DuckDB oracle reproduces keys exactly and the key is
deterministic on any cluster.

Scale shape: the dimension min/max stats are ONE 1-row aggregate
broadcast back onto a narrow projection (no shuffle for key assignment);
the physical re-layout is a single repartition on the bucket key + an
in-partition sort — the same one-shuffle cost as any partitioned write,
with ``n_buckets`` sized so each bucket is a healthy file count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def interleave_sql(scaled: Sequence[str], bits: int, intdiv: str = "div") -> str:
    """SQL expression interleaving ``bits`` bits of each (already scaled,
    non-negative, < 2^bits) integer expression: dimension j contributes
    its bit i at output position i*d + j. Pure * / div / % so the same
    text (modulo the integer-division token: Spark ``div``, DuckDB ``//``)
    evaluates identically in Spark SQL and DuckDB."""
    d = len(scaled)
    terms = []
    for i in range(bits):
        for j, s in enumerate(scaled):
            terms.append(
                f"((({s}) {intdiv} {1 << i}) % 2) * {1 << (i * d + j)}"
            )
    return " + ".join(terms)


def _scaled_expr(col: str, mn: str, mx: str, bits: int, intdiv: str) -> str:
    """Scale ``col`` from [mn, mx] onto the integer grid [0, 2^bits - 1]:
    ((col - mn) * (2^bits - 1)) div max(1, mx - mn). Exact integer math —
    both engines agree bit-for-bit."""
    top = (1 << bits) - 1
    return (
        f"(CAST({col} AS BIGINT) - {mn}) * {top} {intdiv} "
        f"(CASE WHEN {mx} - {mn} < 1 THEN 1 ELSE {mx} - {mn} END)"
    )


def zorder_assign(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    n_buckets: int = 64,
) -> DataFrame:
    """Append ``zkey`` (the Morton key over ``cols``) and ``zbucket``
    (the key's top log2(n_buckets) bits — an equal-WIDTH grid cut, which
    needs no global sort or quantile sampling and is therefore fully
    deterministic; use more buckets than executors and let the write
    coalesce). ``n_buckets`` must be a power of two.

    Column values must be integral (bigint-castable); the per-column
    min/max used for grid scaling ride a broadcast 1-row aggregate.
    """
    if n_buckets & (n_buckets - 1):
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
    d = len(cols)
    stats = df.select(
        *[
            agg
            for c in cols
            for agg in (
                F.min(F.col(c).cast("bigint")).alias(f"__mn_{c}"),
                F.max(F.col(c).cast("bigint")).alias(f"__mx_{c}"),
            )
        ]
    )
    keyed = df.crossJoin(F.broadcast(stats))
    for c in cols:
        keyed = keyed.withColumn(
            f"__s_{c}",
            F.expr(_scaled_expr(c, f"__mn_{c}", f"__mx_{c}", bits, "div")),
        )
    zkey = F.expr(interleave_sql([f"__s_{c}" for c in cols], bits, "div"))
    shift = 1 << (bits * d - (n_buckets.bit_length() - 1))
    return (
        keyed.withColumn("zkey", zkey.cast("bigint"))
        .withColumn("zbucket", F.expr(f"zkey div {shift}").cast("int"))
        .drop(
            *[f"__mn_{c}" for c in cols],
            *[f"__mx_{c}" for c in cols],
            *[f"__s_{c}" for c in cols],
        )
    )


def zorder_oracle_sql(
    table: str, cols: Sequence[str], bits: int = 16, n_buckets: int = 64
) -> str:
    """DuckDB twin of :func:`zorder_assign`'s key/bucket arithmetic."""
    d = len(cols)
    mins = ", ".join(
        f"CAST(MIN(CAST({c} AS BIGINT)) AS BIGINT) AS __mn_{c}, "
        f"CAST(MAX(CAST({c} AS BIGINT)) AS BIGINT) AS __mx_{c}"
        for c in cols
    )
    scols = ", ".join(
        f"{_scaled_expr(c, f'__mn_{c}', f'__mx_{c}', bits, '//')} AS __s_{c}"
        for c in cols
    )
    zk = interleave_sql([f"__s_{c}" for c in cols], bits, "//")
    shift = 1 << (bits * d - (n_buckets.bit_length() - 1))
    return f"""
WITH stats AS (
  SELECT {mins} FROM {table}
), scaled AS (
  SELECT t.*, {scols} FROM {table} t CROSS JOIN stats
), keyed AS (
  SELECT *, CAST({zk} AS BIGINT) AS zkey FROM scaled
)
SELECT *, CAST(zkey // {shift} AS INTEGER) AS zbucket FROM keyed
"""


def write_zorder_layout(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 16,
    n_buckets: int = 64,
) -> None:
    """Materialize the clustered layout: one shuffle on zbucket, rows
    sorted by zkey within each bucket (tightening row-group stats), one
    parquet dir per bucket for partition pruning on the bucket column."""
    keyed = zorder_assign(df, cols, bits=bits, n_buckets=n_buckets)
    (
        keyed.repartition(F.col("zbucket"))
        .sortWithinPartitions("zkey")
        .write.partitionBy("zbucket")
        .mode("overwrite")
        .parquet(path)
    )


def bucket_tightness(keyed: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Diagnostic: per-bucket fraction of each dimension's global range
    covered (the pruning win is 1 - coverage). A random/hash layout
    covers ~1.0 of every dimension in every bucket; a Z-order layout
    covers ~n_buckets^(-1/d)."""
    aggs = []
    for c in cols:
        aggs += [
            F.min(F.col(c).cast("bigint")).alias(f"mn_{c}"),
            F.max(F.col(c).cast("bigint")).alias(f"mx_{c}"),
        ]
    per_bucket = keyed.groupBy("zbucket").agg(*aggs)
    glob = keyed.select(
        *[
            a
            for c in cols
            for a in (
                F.min(F.col(c).cast("bigint")).alias(f"gmn_{c}"),
                F.max(F.col(c).cast("bigint")).alias(f"gmx_{c}"),
            )
        ]
    )
    out = per_bucket.crossJoin(F.broadcast(glob))
    for c in cols:
        out = out.withColumn(
            f"coverage_{c}",
            (F.col(f"mx_{c}") - F.col(f"mn_{c}"))
            / F.greatest(F.col(f"gmx_{c}") - F.col(f"gmn_{c}"), F.lit(1)),
        )
    return out.select("zbucket", *[f"coverage_{c}" for c in cols])


# ---------------------------------------------------------------------------
# Small-files compaction.
#
# Streaming appends, per-trigger micro-batches, and over-parallel writes all
# leave fact tables as thousands of KB-scale parquet files; at 100 TB the
# resulting task-per-file scheduling and footer overhead dominate scan cost
# long before the bytes do. Compaction is the maintenance pass every lake
# engine runs (Delta OPTIMIZE, Iceberg rewrite_data_files); here it is a
# size-targeted rewrite with the same crash-safe swap discipline as
# streaming.sinks.upsert_latest.
# ---------------------------------------------------------------------------


def _parquet_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, bytes) of every data file under ``path``, via the Hadoop
    FileSystem API — identical code against local disk, HDFS, or s3a."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(jpath, True)
    out = []
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if not name.startswith(("_", ".")):
            out.append((str(f.getPath()), int(f.getLen())))
    return out


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_mb: int = 128,
    sort_by: Sequence[str] | None = None,
) -> dict:
    """Rewrite the parquet directory at ``path`` into ~``target_mb``-sized
    files; returns {files_before, bytes_before, files_after, bytes_after}.

    ``sort_by`` additionally CLUSTERS the rewrite (repartitionByRange +
    sortWithinPartitions on those columns), so every output file owns a
    disjoint key range and parquet min/max stats prune file-level reads —
    compaction and layout in one pass. Without it, a plain round-robin
    repartition sizes files uniformly.

    The rewrite reads lazily from the live directory while writing to a
    tmp sibling, then swaps (tmp -> aside -> rename): a crash at any step
    leaves the table live or recoverable at ``path.__old__``, never
    half-deleted. Single-writer discipline, as with upsert_latest. The
    swap here is os.rename (local paths, matching this engine's
    dependency-free sink tier); on HDFS/S3 swap via FileSystem.rename /
    a transactional table format instead — the census and rewrite are
    already FS-agnostic."""
    import math
    import os
    import shutil

    before = _parquet_files(spark, path)
    bytes_before = sum(b for _, b in before)
    n_out = max(1, math.ceil(bytes_before / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    if sort_by:
        df = df.repartitionByRange(n_out, *sort_by).sortWithinPartitions(*sort_by)
    else:
        df = df.repartition(n_out)
    tmp, old = path + ".__tmp__", path + ".__old__"
    df.write.mode("overwrite").parquet(tmp)
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    after = _parquet_files(spark, path)
    return {
        "files_before": len(before),
        "bytes_before": bytes_before,
        "files_after": len(after),
        "bytes_after": sum(b for _, b in after),
    }


def backfill_partitions(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
) -> None:
    """Idempotent partition backfill: (re)write exactly the hive
    partitions PRESENT IN ``df``, leaving every other partition of the
    table untouched — Spark's dynamic partition-overwrite mode, scoped
    here so the session-level setting can't leak (static mode would
    silently TRUNCATE the whole table; that mode flip is the classic
    backfill footgun). Re-running the same backfill is a no-op
    rewrite — the idempotence that makes retry-on-failure safe at a
    100 TB table where a full rewrite is not."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
