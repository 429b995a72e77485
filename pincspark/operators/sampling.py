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
    presplit: int = 0,
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum is
    smaller): the n smallest (hash, id) per strata key. One shuffle on the
    strata columns; deterministic and partitioning-independent.

    ``presplit`` (skew armor, r10): a single window over a Zipf-skewed key
    (registrable domains, user ids) funnels the hottest stratum's rows
    through ONE task's sort — the classic 100-TB window-skew trap. With
    ``presplit=S`` the top-K runs in two exact phases: phase 1 ranks
    within (strata, hash-bucket-of-id mod S) and keeps K per bucket —
    bounding any task's sort to ~1/S of the hottest stratum — and phase 2
    re-ranks the <= S*K survivors per stratum. Output is IDENTICAL to the
    single-phase form: every global top-K row is within its own bucket's
    top-K, so phase 1 never discards a final survivor. Costs one extra
    (much smaller) shuffle; leave 0 for un-skewed strata."""
    h = sample_hash(F.col(id_col), salt)
    df_in = df
    if presplit > 1:
        bucket = F.pmod(sample_hash(F.col(id_col), salt + ":bkt"), F.lit(presplit))
        w1 = Window.partitionBy(*[F.col(c) for c in strata], bucket).orderBy(
            h.asc(), F.col(id_col).asc()
        )
        df_in = (
            df.withColumn("__pre_rank", F.row_number().over(w1))
            .filter(F.col("__pre_rank") <= n_per_stratum)
            .drop("__pre_rank")
        )
    w = Window.partitionBy(*strata).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df_in.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= n_per_stratum)
    )


def temperature_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    alpha: float = 0.5,
    budget_fraction: float = 0.5,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-weighted multi-source sampling (the XLM-R / mT5
    multilingual mixing rule, Conneau et al. 2020): the sampled corpus
    draws source s with probability q_s proportional to n_s^alpha, which
    up-weights small sources (alpha < 1 flattens the natural skew), under
    a total budget of ``budget_fraction * N`` rows in expectation.

    Per-source keep rate: r_s = min(1, budget * N * q_s / n_s), applied
    as the deterministic hash filter of :func:`hash_sample` — the draw is
    reproducible on any cluster size and stable under per-doc membership
    (a doc's fate depends only on (salt, id) and its source's rate).

    Returns every row with its sampling metadata: (id, source, n_source,
    keep_rate rounded to 6 dp, kept 0/1). Filter ``kept = 1`` for the
    sample; the full table is emitted so the rate computation itself is
    oracle-checkable.

    Scale shape: source counts are one tiny keyed agg (thousands of
    sources at most) broadcast back onto a narrow scan — the corpus is
    never shuffled; the filter composes with pushdown like hash_sample.
    The only floats (q_s, r_s) are per-source constants derived through
    pow/sum — rounded to 6 dp in the output, and the kept decision
    compares a 32-bit integer hash against r_s * 2^32, so a last-ulp rate
    difference cannot flip membership (it would need to land within
    2^-20 of an integer boundary).
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_source"))
    weights = counts.withColumn(
        "__w", F.pow(F.col("n_source").cast("double"), F.lit(float(alpha)))
    )
    totals = weights.select(
        F.sum("n_source").alias("__n"), F.sum("__w").alias("__wsum")
    )
    rates = (
        weights.crossJoin(F.broadcast(totals))
        .withColumn(
            "keep_rate",
            F.least(
                F.lit(1.0),
                F.lit(float(budget_fraction))
                * F.col("__n")
                * (F.col("__w") / F.col("__wsum"))
                / F.col("n_source"),
            ),
        )
        .select(source_col, "n_source", "keep_rate")
    )
    h = sample_hash(F.col(id_col), salt)
    return (
        df.join(F.broadcast(rates), source_col)
        .select(
            F.col(id_col),
            F.col(source_col),
            F.col("n_source").cast("bigint").alias("n_source"),
            F.round(F.col("keep_rate"), 6).alias("keep_rate"),
            (h < F.col("keep_rate") * F.lit(HASH_SPACE))
            .cast("int")
            .alias("kept"),
        )
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


def group_holdout_split(
    df: DataFrame,
    group_col: str,
    splits: Sequence[tuple[str, int]] = (("train", 8), ("val", 1), ("test", 1)),
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: every row of a GROUP (user,
    domain, session — whatever unit must not straddle an evaluation
    boundary) lands in the same split, because the assignment is a pure
    function of (salt, group key): bucket = md5-hash(salt:group) mod
    sum(weights), mapped to the first split whose cumulative weight
    exceeds it.

    Row-level random splits leak: near-duplicate rows (or a user's other
    events) from the training split sit in the test split and the eval
    measures memorization. Group-hash assignment is the standard guard,
    and the deterministic hash makes it reproducible across cluster
    sizes, partitionings, corpus growth (a group's split NEVER changes as
    rows arrive — append-friendly), and reruns.

    Scale (100 TB): a narrow projection — zero shuffle, no group table,
    no join; the split column computes per-row from the group key alone.
    Weights are integers (8/1/1, not 0.8/0.1/0.1) so the bucket math is
    exact modular arithmetic, mirrored verbatim by the DuckDB oracle via
    :func:`group_holdout_split_sql`.
    """
    # Every weight must be strictly positive (ADVICE r12): a zero-weight
    # split would silently never be assigned (and a zero-weight LAST split
    # makes the ELSE branch unreachable) — a config typo must fail loudly,
    # not degrade into an empty eval set.
    if not splits or any(w <= 0 for _, w in splits):
        raise ValueError(f"every split weight must be > 0: {splits}")
    total = sum(w for _, w in splits)
    bucket = F.pmod(sample_hash(F.col(group_col), salt), F.lit(total))
    expr: Column | None = None
    cum = 0
    for name, weight in splits[:-1]:
        cum += weight
        cond = bucket < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(splits[-1][0])
    assigned = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, assigned)


def group_holdout_split_sql(
    group_expr: str,
    splits: Sequence[tuple[str, int]] = (("train", 8), ("val", 1), ("test", 1)),
    salt: str = "split",
) -> str:
    """DuckDB mirror of :func:`group_holdout_split`'s split expression."""
    total = sum(w for _, w in splits)
    h = sample_hash_sql(group_expr, salt)
    lines = ["CASE"]
    cum = 0
    for name, weight in splits[:-1]:
        cum += weight
        lines.append(f"  WHEN ({h}) % {total} < {cum} THEN '{name}'")
    lines.append(f"  ELSE '{splits[-1][0]}'")
    lines.append("END")
    return "\n".join(lines)
