"""Scale utilities: skew-salted joins and bucketed co-located tables.

The reference runs single-process and never meets skew or shuffle cost; at
100 TB they dominate. Three mechanisms, in preference order:

1. **AQE skew-join** — enabled globally in ``pincspark.session`` (splits
   oversized partitions at runtime); zero code.
2. **Salted join** — when one side's key distribution is brutal (a handful
   of mmsi values carrying most of the traffic), explode the small side
   ``salt`` ways and spread the big side uniformly; removes the hot
   partition deterministically.
3. **Bucketed tables** — pre-shuffle fact tables on their join key at write
   time; subsequent joins/aggregations on that key plan ZERO exchanges.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to a skewed ``big`` side: ``big`` rows get a random
    salt in [0, salt); ``small`` rows are replicated once per salt value, so
    every (key, salt) bucket joins locally. Results are exactly the plain
    join's (salt columns are internal)."""
    big_s = big.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = big_s.join(small_s, [key, "__salt"], how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str | Sequence[str],
    buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table: joins and
    aggregations on ``key`` between tables bucketed the same way need no
    exchange and no sort."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode("overwrite").bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables — the physical plan is exchange-free
    (verified in tests/test_scale.py)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
