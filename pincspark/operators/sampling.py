"""Deterministic sampling operators for training-data curation: hash-based
fractional sampling and fixed-size stratified sampling.

Sampling for dataset curation must be REPRODUCIBLE (same corpus + salt =>
same sample, on any cluster size, any partitioning) and cheap at 100 TB.
Both operators key off the first 8 hex chars of md5(salt || ':' || id) —
the same portable integer the dedup shingle hashing uses, so the DuckDB
oracle replicates the exact sample:

- ``hash_sample``: keep rows whose normalized hash < fraction. A pure
  narrow filter — no shuffle, fully pushdown-friendly, and stable under
  corpus growth (a doc's membership never changes as neighbors arrive,
  unlike rand()-based sampling).
- ``stratified_fixed``: exactly ``n_per_stratum`` rows per stratum, chosen
  as the n smallest hashes (ties broken by id) — one shuffle on the strata
  key. This is the deterministic analog of per-stratum reservoir sampling:
  a uniform-without-replacement draw whose result is independent of row
  order and partitioning, which is what a distributed reservoir actually
  needs (a sequential reservoir's output depends on encounter order, so it
  cannot be both parallel and reproducible).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_SPACE = float(1 << 32)


def sample_hash(id_col: Column, salt: str = "s") -> Column:
    """Deterministic uniform-ish 32-bit hash of (salt, id): first 8 hex
    chars of md5, parsed base-16 — identical to the oracle's
    ``('0x' || substring(md5(...), 1, 8))::BIGINT``."""
    key = F.concat(F.lit(salt), F.lit(":"), id_col.cast("string"))
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint")


def sample_hash_sql(id_expr: str, salt: str = "s") -> str:
    """DuckDB mirror of :func:`sample_hash`."""
    return (
        f"CAST(('0x' || substring(md5('{salt}' || ':' || CAST({id_expr} AS VARCHAR)), 1, 8)) AS BIGINT)"
    )


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = "s"
) -> DataFrame:
    """Deterministic fractional sample: keep rows with
    hash/2^32 < fraction. Narrow (no shuffle); reproducible across runs,
    cluster sizes, and corpus growth."""
    return df.filter(sample_hash(F.col(id_col), salt) < F.lit(int(fraction * HASH_SPACE)))


def stratified_fixed(
    df: DataFrame,
    id_col: str,
    strata: Sequence[str],
    n_per_stratum: int,
    salt: str = "s",
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum is
    smaller): the n smallest (hash, id) per strata key. One shuffle on the
    strata columns; deterministic and partitioning-independent."""
    h = sample_hash(F.col(id_col), salt)
    w = Window.partitionBy(*strata).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= n_per_stratum)
    )


def deterministic_shards(
    df: DataFrame,
    id_col: str,
    num_shards: int,
    salt: str = "shuffle",
) -> DataFrame:
    """Reproducible global shuffle + sharding: assign every row a
    ``shard`` (uniform hash bucket) and a ``pos`` (0-based position within
    its shard, ordered by hash then id) — the "shuffle the corpus into N
    training shards in a random-but-reproducible order" step every
    pre-training data pipeline runs last.

    Same corpus + same salt => identical (shard, pos) for every document,
    on any cluster size, any input partitioning, any row order. Changing
    the salt reshuffles everything.

    Scale (100 TB): ONE shuffle on the shard key and a per-shard sort —
    there is never a global single-reducer total order; ``num_shards``
    scales with the corpus so each shard's sort fits an executor. (A
    window over partitionBy(shard) gives Spark exactly that plan.)
    """
    h = sample_hash(F.col(id_col), salt)
    shard = F.pmod(h, F.lit(num_shards)).cast("int")
    w = Window.partitionBy("shard").orderBy(F.col("__h").asc(), F.col(id_col).asc())
    return (
        df.withColumn("__h", h)
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w) - F.lit(1))
        .drop("__h")
    )
