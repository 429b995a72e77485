"""Bucketed table layout — co-located joins with ZERO join-time shuffle.

The 100-TB join playbook has three tools: broadcast (small side), shuffle
(pay per query), and BUCKETING (pay once at write time). Writing both
fact tables bucketed on the join key with the same bucket count makes
every subsequent equi-join on that key exchange-free: each scan reports
``HashPartitioning(keys, n_buckets)``, Spark's EnsureRequirements sees
both sides already satisfy the join distribution, and the sort-merge join
runs directly on co-located buckets. For a fact-to-fact join queried
daily (orders x lineitem, events x sessions), one staging shuffle at
ingest replaces a full shuffle of BOTH tables on every query — at 100 TB
that is the difference between a join that costs what it scans and one
that re-clusters the warehouse nightly.

Spark-first notes:
- ``bucketBy`` works through the session catalog (``saveAsTable``) — a
  plain ``.parquet(path)`` write cannot carry bucket metadata. Tables
  here are EXTERNAL (explicit ``path``) so callers control the storage
  root; the in-memory catalog entry is session-scoped and re-registered
  per run (``register_existing_bucketed`` re-attaches after a restart —
  on a real deployment the Hive/Glue/Unity metastore persists it).
- ``sortBy`` on the bucket keys additionally lets the merge join skip
  its sorts when each bucket holds one file per side.
- Bucket counts must MATCH across the joined tables (Spark does not
  coalesce mismatched bucket counts into a shuffle-free plan until the
  bucketing-rescale rules apply; keep warehouse-wide conventions).

The exchange-free property is pinned by
tests/test_bucketing.py::test_cobucketed_join_plans_zero_exchanges and
the q93 driver gate checks join RESULTS against a plain DuckDB join.

Reference tie-in: the reference warehouse re-reads its gold parquet per
analysis (ais_analysis.py:477-486) with no layout control at all; this
is the Spark-idiomatic layout answer alongside Z-order
(``operators/layout.py``) and compaction.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    keys: Sequence[str],
    n_buckets: int,
    path: str,
    sort_keys: Sequence[str] | None = None,
) -> None:
    """Persist ``df`` as an external bucketed (optionally bucket-sorted)
    parquet table named ``name`` at ``path``. One shuffle now, none at
    every future join/aggregation on ``keys``."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *keys)
    )
    if sort_keys:
        w = w.sortBy(*sort_keys)
    w.saveAsTable(name)


def register_existing_bucketed(
    spark: SparkSession,
    name: str,
    path: str,
    schema_ddl: str,
    keys: Sequence[str],
    n_buckets: int,
    sort_keys: Sequence[str] | None = None,
) -> None:
    """Re-attach an already-written bucketed directory to a fresh session's
    catalog (the in-memory catalog forgets on restart; a metastore would
    not). The DDL must match what ``write_bucketed`` produced."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    sorted_clause = (
        f"SORTED BY ({', '.join(sort_keys)}) " if sort_keys else ""
    )
    spark.sql(
        f"CREATE TABLE {name} ({schema_ddl}) USING parquet "
        f"CLUSTERED BY ({', '.join(keys)}) {sorted_clause}"
        f"INTO {n_buckets} BUCKETS LOCATION '{path}'"
    )


def cobucketed_join(
    spark: SparkSession,
    left_name: str,
    right_name: str,
    on: Sequence[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket keys. The plan
    contains no Exchange on either side when both tables were bucketed on
    ``on`` with equal bucket counts (pinned by test_bucketing.py)."""
    on = [on] if isinstance(on, str) else list(on)
    return spark.table(left_name).join(spark.table(right_name), on, how)
