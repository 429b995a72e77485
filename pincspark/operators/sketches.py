"""KMV (k-minimum-values) distinct-count sketches — the mergeable
cardinality estimator a 100-TB pipeline keeps NEXT TO the data instead of
re-scanning it.

Why not `approx_count_distinct`? Spark's HLL++ is per-query: the sketch
never leaves the aggregation, so every new question rescans the corpus,
and its register encoding is not reproducible outside the JVM. A KMV
sketch is just the k smallest 60-bit md5-prefix hashes of the values —
a few KB per group that can be PERSISTED (daily), MERGED (k smallest of a
union of sketches = the sketch of the union, provided every input kept at
least k), and AUDITED byte-for-byte from any engine, which is what makes
exact DuckDB oracle parity possible where HLL would be JVM-private.

Estimator (Bar-Yossef et al. 2002): with h_k = the k-th smallest hash in
[0, 2^60), est = (k-1) * 2^60 / h_k; fewer than k distinct hashes means
the sketch IS the value set and the count is exact. The division here is
pure BIGINT — ((k-1) * 2^40) div (h_k div 2^20) — because (k-1) << 60
would overflow 64 bits: dropping h_k's low 20 bits adds relative error
<= 2^20 / h_k, and h_k >= ~k * 2^60 / n, so even at n = 2^40 distinct
values the rounding error is ~1/k — an order below KMV's inherent
1/sqrt(k) standard error (~6% at k = 256). No doubles, no libm, no
HUGEINT: the same expression evaluates identically in Spark and DuckDB.

Scale shape: one shuffle keyed on the group to rank hashes (count-distinct
class — unavoidable for exact k-mins); the sketch table that comes out is
k rows per group. Merging sketches touches only sketch rows — the
production steady state never rescans history, the same shape as
dedup_snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 60-bit hash domain (15 md5 hex chars), split for overflow-free division.
KMV_HASH_BITS = 60
_EST_NUM_SHIFT = 40  # (k-1) << 40 stays far under 2^63 for any sane k
_EST_DEN_SHIFT = 20  # h_k >> 20; 40 + 20 = 60 keeps the ratio unscaled


def _value_hash(col: F.Column) -> F.Column:
    """The shared 60-bit md5-prefix hash: identical to the oracle's
    ``('0x' || substring(md5(v), 1, 15))::BIGINT``."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 256,
    with_counts: bool = False,
) -> DataFrame:
    """Per-group KMV sketch: the k smallest distinct value hashes ->
    (group_cols..., h bigint, rn int). This is the table a pipeline
    persists; feed it to :func:`kmv_estimate` or :func:`kmv_merge`.

    ``with_counts=True`` additionally carries ``cnt`` = the number of
    rows holding each sampled value (the AKMV/counted variant), which is
    what :func:`kmv_join_size` needs for join-cardinality estimates."""
    # NULL values carry no cardinality; dropping them also sidesteps the
    # engines' opposite NULL-ordering defaults in the rank window.
    #
    # Hash AFTER value-level dedup/aggregation (r16, guide §2.3/§1.2):
    # md5 is the build's dominant per-row CPU, and hashing every
    # OCCURRENCE repeats it corpus-proportionally — dedup/count the raw
    # value first (map-side partial aggregation collapses occurrences
    # before the exchange), then hash each distinct value once. Costs one
    # extra exchange whose rows are bounded by the distinct-value count;
    # saves occurrences/distinct md5 evals at every scale. The 60-bit
    # collision contract (the oracle ranks DISTINCT h) is preserved by
    # re-deduping/re-summing on h after hashing.
    if with_counts:
        per_val = (
            df.select(
                *group_cols, F.col(value_col).cast("string").alias("__v")
            )
            .filter(F.col("__v").isNotNull())
            .groupBy(*group_cols, "__v")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )
        hashed = (
            per_val.select(*group_cols, _value_hash(F.col("__v")).alias("h"), "cnt")
            .groupBy(*group_cols, "h")
            .agg(F.sum("cnt").cast("bigint").alias("cnt"))
        )
    else:
        # Tradeoff (ADVICE r16): this shuffles distinct RAW values through
        # the first exchange, so shuffle bytes scale with value WIDTH, not
        # just row count — for very wide value columns (URLs, long text)
        # the old hash-first single-distinct form shuffles 8-byte hashes
        # instead and can win despite re-hashing every occurrence. The
        # engine's sketched columns are short keys (mmsi, zone, token), so
        # the occurrence-collapse form is kept; revisit per-column if a
        # wide-value sketch ever lands here.
        hashed = (
            df.select(*group_cols, F.col(value_col).cast("string").alias("__v"))
            .filter(F.col("__v").isNotNull())
            .distinct()
            .select(*group_cols, _value_hash(F.col("__v")).alias("h"))
            .distinct()
        )
    if not group_cols:
        # Global sketch: a partition-less rank window would funnel EVERY
        # distinct hash through one task (the data-sized single-partition
        # anti-pattern). sort+limit instead: Catalyst plans it as
        # TakeOrderedAndProject — per-partition top-k heaps merged once —
        # so only k candidate rows ever leave any partition. The final
        # rank window then runs over <= k rows (bounded by construction).
        hashed = hashed.orderBy("h").limit(k)
        w = Window.partitionBy(F.lit(1)).orderBy("h")
    else:
        w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashed.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
    )


def kmv_merge(
    sketch: DataFrame,
    group_cols: list[str],
    k: int = 256,
) -> DataFrame:
    """Re-sketch a union of sketches down to ``group_cols`` (e.g. drop a
    day column, or group by nothing for a global sketch): k smallest
    distinct hashes of the union — EXACTLY the sketch that would have
    been built from the union's raw values, because each input sketch
    already kept its k smallest. Touches only sketch rows."""
    hashed = sketch.select(*group_cols, "h").distinct()
    if group_cols:
        w = Window.partitionBy(*group_cols).orderBy("h")
    else:
        w = Window.partitionBy(F.lit(1)).orderBy("h")
    return (
        hashed.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
    )


def kmv_update(
    sketch: DataFrame,
    batch: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Incremental sketch maintenance — the foreachBatch steady state:
    fold a new micro-batch into a persisted sketch WITHOUT rescanning
    history. Sketch the batch, union with the prior sketch rows, keep the
    k smallest per group. By the merge identity (see :func:`kmv_merge`)
    the result is bit-identical to rebuilding from all raw values seen so
    far; the work is O(batch + sketch rows), never O(history)."""
    fresh = kmv_sketch(batch, group_cols, value_col, k=k)
    return kmv_merge(
        sketch.select(*group_cols, "h").unionByName(fresh.select(*group_cols, "h")),
        group_cols,
        k=k,
    )


def kmv_set_ops(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    group_cols: list[str],
    k: int = 256,
) -> DataFrame:
    """Set-operation estimates from two KMV sketches ALONE (Beyer et al.
    2007, "On Synopses for Distinct Value Estimation Under Multiset
    Operations"): per group, rank the union of the two sketch hash sets,
    keep the k smallest (= the union's own KMV sketch), and read the
    membership pattern of those kept hashes.

    With ``K`` = kept union hashes (``n_kept``), union cardinality is the
    usual KMV estimate; ``|A intersect B| ~= (inter_in_k / n_kept) * est_union``
    and symmetrically for the difference slices. Membership tests are valid
    because the union's k-th smallest hash is <= each side's own k-th
    smallest whenever that side kept k hashes, and a side that kept fewer
    than k IS its complete value set. Both inputs must be built by
    :func:`kmv_sketch`/:func:`kmv_merge` with the SAME ``k``.

    All arithmetic is BIGINT (inter_in_k <= k and est_union < 2^41, so the
    products stay far under 2^63); ``jaccard_ppm`` is parts-per-million to
    keep the output hash-stable across engines. When the union kept fewer
    than k hashes every column is exact, and the ratio estimates collapse
    to the exact counts (inter_in_k * n_kept div n_kept == inter_in_k).

    Returns (group_cols..., n_kept, kth_hash, est_union, inter_in_k,
    est_intersection, est_a_only, est_b_only, jaccard_ppm), one row per
    group present in either sketch.
    """
    ha = sketch_a.select(
        *group_cols, "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    )
    hb = sketch_b.select(
        *group_cols, "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
    )
    # Tag-and-aggregate instead of a full outer join: one hash-keyed
    # aggregation over sketch rows only (<= 2k per group).
    u = (
        ha.unionByName(hb)
        .groupBy(*group_cols, "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    if group_cols:
        w = Window.partitionBy(*group_cols).orderBy("h")
    else:
        w = Window.partitionBy(F.lit(1)).orderBy("h")
    kept = u.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    num = (k - 1) * (1 << _EST_NUM_SHIFT)
    agg = kept.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.max("h").alias("kth_hash"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("inter_in_k"),
        F.sum(F.col("in_a") * (1 - F.col("in_b"))).cast("bigint").alias("a_only_in_k"),
        F.sum((1 - F.col("in_a")) * F.col("in_b")).cast("bigint").alias("b_only_in_k"),
    )
    est_union = (
        F.when(F.col("n_kept") < k, F.col("n_kept"))
        .otherwise(
            F.expr(
                f"CAST({num} AS BIGINT) div "
                f"greatest(kth_hash div {1 << _EST_DEN_SHIFT}, CAST(1 AS BIGINT))"
            )
        )
        .cast("bigint")
    )
    scaled = agg.withColumn("est_union", est_union)
    return scaled.select(
        *group_cols,
        "n_kept",
        "kth_hash",
        "est_union",
        "inter_in_k",
        F.expr("inter_in_k * est_union div n_kept").cast("bigint").alias(
            "est_intersection"
        ),
        F.expr("a_only_in_k * est_union div n_kept").cast("bigint").alias(
            "est_a_only"
        ),
        F.expr("b_only_in_k * est_union div n_kept").cast("bigint").alias(
            "est_b_only"
        ),
        F.expr("inter_in_k * 1000000 div n_kept").cast("bigint").alias(
            "jaccard_ppm"
        ),
    )


def bottomk_row_sample(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    carry_cols: list[str],
    k: int = 128,
) -> DataFrame:
    """Per-group uniform row sample as a PERSISTABLE, MERGEABLE sketch:
    the k rows whose ``md5(id)`` 60-bit prefixes are smallest (bottom-k
    sampling). Merging two samples = re-ranking their union's k smallest
    row hashes — exactly the KMV merge identity, so daily samples fold
    without rescanning history. ``id_col`` must be row-unique; NULL ids
    are dropped. Returns (group_cols..., h, rn, carry_cols...)."""
    hashed = df.select(
        *group_cols, _value_hash(F.col(id_col)).alias("h"), *carry_cols
    ).filter(F.col("h").isNotNull())
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashed.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
    )


def sample_quantiles(
    sample: DataFrame,
    group_cols: list[str],
    value_col: str,
    probs: list[float],
) -> DataFrame:
    """Quantile estimates from a :func:`bottomk_row_sample`: for each
    probability p the sample element at rank max(1, ceil(p * n)) under
    the deterministic order (value, h) — the h tie-break makes the read
    reproducible in any engine, and the emitted number is a verbatim
    data value (no interpolation arithmetic to drift across engines).
    Rank error is O(1/sqrt(k)) of the population. Returns
    (group_cols..., prob double, q <value type>)."""
    w = Window.partitionBy(*group_cols).orderBy(value_col, "h")
    ranked = sample.withColumn("__r", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy(*group_cols))
    )
    picks = None
    for p in probs:
        sel = ranked.filter(
            F.col("__r") == F.greatest(F.lit(1), F.ceil(F.lit(p) * F.col("__n")))
        ).select(*group_cols, F.lit(p).alias("prob"), F.col(value_col).alias("q"))
        picks = sel if picks is None else picks.unionByName(sel)
    return picks


def kmv_join_size(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    group_cols: list[str],
    k: int = 256,
) -> DataFrame:
    """Equi-join CARDINALITY estimate from two counted KMV sketches alone
    (the optimizer-statistics use of AKMV synopses, Beyer et al. 2007):
    both inputs must come from :func:`kmv_sketch` with
    ``with_counts=True`` and the same ``k``. The union's k-mins are a
    uniform sample of the union's distinct keys with inclusion fraction
    n_kept / D_union, so

        |A JOIN B|  ~=  sum_{h in kept, in both} cnt_a(h) * cnt_b(h)
                        * est_union / n_kept

    — the same BIGINT scaling shape as q76's intersection estimate, and
    exact when the union kept fewer than k hashes. Returns
    (group_cols..., n_kept, kth_hash, est_union, pair_sum,
    est_join_size), one row per group present in either sketch.
    """
    ha = sketch_a.select(
        *group_cols, "h", F.col("cnt").alias("ca"), F.lit(0).cast("bigint").alias("cb")
    )
    hb = sketch_b.select(
        *group_cols, "h", F.lit(0).cast("bigint").alias("ca"), F.col("cnt").alias("cb")
    )
    u = (
        ha.unionByName(hb)
        .groupBy(*group_cols, "h")
        .agg(F.max("ca").alias("ca"), F.max("cb").alias("cb"))
    )
    if group_cols:
        w = Window.partitionBy(*group_cols).orderBy("h")
    else:
        w = Window.partitionBy(F.lit(1)).orderBy("h")
    kept = u.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    num = (k - 1) * (1 << _EST_NUM_SHIFT)
    agg = kept.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.max("h").alias("kth_hash"),
        F.sum(F.col("ca") * F.col("cb")).cast("bigint").alias("pair_sum"),
    )
    est_union = (
        F.when(F.col("n_kept") < k, F.col("n_kept"))
        .otherwise(
            F.expr(
                f"CAST({num} AS BIGINT) div "
                f"greatest(kth_hash div {1 << _EST_DEN_SHIFT}, CAST(1 AS BIGINT))"
            )
        )
        .cast("bigint")
    )
    return agg.withColumn("est_union", est_union).select(
        *group_cols,
        "n_kept",
        "kth_hash",
        "est_union",
        "pair_sum",
        F.expr("pair_sum * est_union div n_kept").cast("bigint").alias(
            "est_join_size"
        ),
    )


def kmv_estimate(
    sketch: DataFrame,
    group_cols: list[str],
    k: int = 256,
) -> DataFrame:
    """Sketch table -> (group_cols..., n_kept, kth_hash, est_distinct).

    n_kept < k means the sketch saw every distinct value: exact count.
    Otherwise the BIGINT-only estimator in the module docstring."""
    num = (k - 1) * (1 << _EST_NUM_SHIFT)
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.max("h").alias("kth_hash"),
    )
    return agg.select(
        *group_cols,
        "n_kept",
        "kth_hash",
        F.when(F.col("n_kept") < k, F.col("n_kept"))
        .otherwise(
            F.expr(
                f"CAST({num} AS BIGINT) div "
                f"greatest(kth_hash div {1 << _EST_DEN_SHIFT}, CAST(1 AS BIGINT))"
            )
        )
        .cast("bigint")
        .alias("est_distinct"),
    )


def frequent_items(
    df: DataFrame,
    col: str,
    support_num: int,
    support_den: int,
    capacity: int | None = None,
) -> DataFrame:
    """EXACT frequent items (heavy hitters) at corpus scale: every key
    whose count satisfies ``cnt * support_den >= support_num * N`` (i.e.
    frequency >= support_num/support_den of the N non-null rows), with
    its exact count — the frequency-sketch sibling of the KMV distinct
    tier (tokens for vocab pruning, domains for crawl policy, user/page
    keys for skew diagnosis).

    Why not one big groupBy? A plain groupBy(col).count() shuffles the
    FULL distinct-key set — at 100 TB of tokens that is a corpus-sized
    exchange to answer a question whose output is a handful of rows.
    This is the classic two-pass scheme instead (exact, no false
    negatives OR positives):

    1. **Candidates via per-partition Misra-Gries** (mapInPandas, Arrow
       batches): each task keeps at most ``capacity`` counters; a batch's
       exact value_counts merges in, then the summary is pruned by
       subtracting the (capacity+1)-th largest counter (the mergeable-
       summaries formulation, Agarwal et al. 2012) — bounded state, zero
       shuffle. Any key with partition count > n_p/(capacity+1) survives
       its partition; a key with global count >= (support_num/support_den)*N
       must exceed that bound in at least one partition whenever
       ``capacity >= support_den/support_num`` (else its global count
       would be <= N/(capacity+1) < s*N), so the union of partition
       survivors contains every globally frequent key.
    2. **Exact recount of candidates**: the candidate set (<= capacity
       per task — a broadcast-sized table by construction) semi-filters
       the corpus via a broadcast hash join; one groupBy over only the
       candidate keys, then the integer support filter. The threshold
       compare is pure BIGINT cross-multiplication — no float ceil, so
       any ANSI-SQL engine reproduces the cut bit-for-bit.

    Scans the input twice (MG pass + recount) plus a count(*) of the key
    column; shuffle volume is candidates-only. NULL keys are excluded
    from both N and the output. The collect here is the candidate set —
    the bounded sketch-sized driver op of the KMV/centroid class.

    Returns (``col``, cnt BIGINT), exact counts.
    """
    if capacity is None:
        capacity = -(-support_den // support_num)  # ceil
    if capacity * support_num < support_den:
        raise ValueError(
            f"capacity {capacity} breaks the no-false-negative guarantee: "
            f"need capacity >= support_den/support_num = "
            f"{support_den}/{support_num}"
        )
    keyed = df.select(F.col(col)).filter(F.col(col).isNotNull())
    out_schema = keyed.schema

    def mg(batches):
        import pandas as pd

        counts: dict = {}
        for pdf in batches:
            for k, c in pdf[col].value_counts().items():
                counts[k] = counts.get(k, 0) + int(c)
            if len(counts) > capacity:
                # Mergeable-summaries prune: subtract the (capacity+1)-th
                # largest counter from everything, drop the non-positive.
                thresh = sorted(counts.values(), reverse=True)[capacity]
                counts = {
                    k: c - thresh for k, c in counts.items() if c - thresh > 0
                }
        yield pd.DataFrame({col: list(counts.keys())})

    cands = keyed.mapInPandas(mg, schema=out_schema).distinct()
    n_total = keyed.count()
    return (
        keyed.join(F.broadcast(cands), col, "inner")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(
            F.col("cnt") * F.lit(int(support_den))
            >= F.lit(int(support_num)) * F.lit(int(n_total))
        )
    )


# --------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005): the mergeable FREQUENCY
# estimator completing the sketch family — Bloom answers membership, KMV
# answers cardinality, Misra-Gries + recount answers exact heavy hitters,
# CMS answers "about how often does X occur?" for ANY later probe without
# rescanning the corpus. depth x width counters (depth independent hashes;
# estimate = min over rows), always an OVERestimate, never under; two
# sketches merge by cell-wise SUM, so a per-day CMS table rolls up to any
# window. All arithmetic is BIGINT on md5-prefix hashes — byte-identical in
# any engine, which is what makes a DuckDB oracle possible where a native
# probabilistic agg would be JVM-private.
#
# Scale shape: the build explodes each value into `depth` (row, bucket)
# pairs and group-counts them — partial aggregation collapses every task to
# <= depth*width cells before the (tiny) shuffle, and the finished sketch is
# depth*width rows regardless of corpus size, so estimates are a BROADCAST
# join, never a corpus pass.
# --------------------------------------------------------------------------


def cms_bucket(col: F.Column, j: int, width: int, salt: str = "cms") -> F.Column:
    """Row-j bucket of a value: first 8 md5 hex chars of 'salt:j:value',
    base-16, mod width — the oracle's
    ``('0x' || substring(md5('salt:j:' || v), 1, 8))::BIGINT % width``."""
    key = F.concat(F.lit(f"{salt}:{j}:"), col.cast("string"))
    h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint")
    return F.pmod(h, F.lit(width))


def _cms_pairs(col: F.Column, width: int, depth: int, salt: str) -> F.Column:
    return F.array(
        *[
            F.struct(
                F.lit(j).cast("int").alias("j"),
                cms_bucket(col, j, width, salt).alias("bucket"),
            )
            for j in range(depth)
        ]
    )


def cms_sketch(
    df: DataFrame,
    value_col: str,
    width: int = 512,
    depth: int = 3,
    salt: str = "cms",
) -> DataFrame:
    """Build the sketch: (j int, bucket bigint, cnt bigint), one row per
    non-empty cell (absent cell == 0). Persist this table; it is the whole
    summary."""
    # Hash AFTER value-level aggregation (r16, guide §2.3/§1.2): count
    # occurrences per distinct value first (map-side combine collapses
    # the stream before the exchange), then explode each DISTINCT value
    # into its depth cells — depth x distinct-values md5 evals instead of
    # depth x occurrences. Cell counts are the sum of the value counts,
    # so the sketch is bit-identical; the second aggregation's input is
    # distinct-values x depth rows, combine-collapsed to <= depth*width
    # cells per task.
    pairs = _cms_pairs(F.col(value_col), width, depth, salt)
    if df.isStreaming:
        # The streaming (complete-mode) build keeps the direct
        # one-aggregate form: chaining the value dedup in front would be
        # two stateful operators (blocked by Spark's global-watermark
        # correctness check), and the dedup saves nothing there anyway —
        # the incremental aggregation state IS the sketch, so each row is
        # hashed once as it arrives. Stream == batch cell-for-cell is
        # pinned in tests/test_streaming.py.
        return (
            df.select(F.explode(pairs).alias("p"))
            .select("p.j", "p.bucket")
            .groupBy("j", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
    counts = df.groupBy(value_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__cnt")
    )
    return (
        counts.select(F.explode(pairs).alias("p"), F.col("__cnt"))
        .select("p.j", "p.bucket", "__cnt")
        .groupBy("j", "bucket")
        .agg(F.sum("__cnt").cast("bigint").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum: the sketch of a union of corpora (same width/depth/
    salt) — merge daily sketches instead of rescanning history."""
    from functools import reduce

    u = reduce(lambda a, b: a.unionByName(b), sketches)
    return u.groupBy("j", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    value_col: str,
    width: int = 512,
    depth: int = 3,
    salt: str = "cms",
    est_col: str = "est",
) -> DataFrame:
    """Point estimates for each probe value: min over the depth rows of the
    probe's cells (missing cell = 0). The sketch side is broadcast — it is
    depth*width rows by construction; the probe table can be any size."""
    pairs = _cms_pairs(F.col(value_col), width, depth, salt)
    pb = probes.select(F.col(value_col), F.explode(pairs).alias("p")).select(
        value_col, "p.j", "p.bucket"
    )
    joined = pb.join(F.broadcast(sketch), ["j", "bucket"], "left")
    return joined.groupBy(value_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias(est_col)
    )


# ---------------------------------------------------------------------------
# HDR histogram quantile sketch (log-binned, integer-exact, mergeable)
# ---------------------------------------------------------------------------
#
# The quantile member of the mergeable-sketch family (Bloom membership /
# KMV cardinality / Misra-Gries+recount heavy hitters / CMS frequency):
# a per-group log-binned histogram over non-negative BIGINT measures, in
# the HdrHistogram style — `precision` sub-bucket bits give a guaranteed
# relative error <= 2^-precision on every quantile, the bin index is pure
# integer arithmetic (floor-log2 via length(bin(v)), shifts, adds — no
# doubles, no libm), so the identical expression evaluates bit-for-bit in
# Spark and an ANSI-SQL oracle, and cells are CELL-WISE-SUM mergeable:
# merge(day sketches) == rebuild(union), never rescanning history.
#
# Bin mapping (v >= 0, shift = max(floor(log2 v) - p, 0)):
#   bin_id = shift * 2^p + (v >> shift)
# is monotone and contiguous in v (shift=0 covers bin_ids [0, 2^{p+1});
# each further shift level appends 2^p bins), and inverts to the bin's
# lower bound lo = (bin_id - shift*2^p) << shift with bin width 2^shift,
# hence the relative-error bound. Quantile q = the lower bound of the
# first bin whose cumulative count reaches ceil(q * total) — sketch-sized
# window work, identical CASE/cumsum in both engines.
#
# Why not percentile_approx? Same reason as KMV-vs-HLL: Spark's GK
# summary is per-query and JVM-private; this sketch is a small persisted
# TABLE (<= ~64 * 2^p cells/group) any engine can audit and fold.


def _hdr_bin(v: F.Column, precision: int) -> F.Column:
    """bin_id of non-negative BIGINT ``v`` (monotone, integer-exact)."""
    n = F.length(F.bin(v)) - F.lit(1)  # floor(log2 v); bin(0)='0' -> n=0
    shift = F.greatest(n - F.lit(precision), F.lit(0))
    # call_function: the SQL shiftright takes a column shift amount, the
    # Python F.shiftright wrapper only accepts an int literal
    sub = F.call_function("shiftright", v, shift)
    return (shift * F.lit(1 << precision) + sub).cast("bigint")


def _hdr_lo(bin_id: F.Column, precision: int) -> F.Column:
    """Lower bound of a bin_id: the sketch's representative value."""
    # bin_id < 64*2^p, so the double divide inside floor is exact
    shift = F.greatest(
        F.floor(bin_id / F.lit(1 << precision)).cast("bigint") - F.lit(1), F.lit(0)
    )
    return F.call_function(
        "shiftleft", bin_id - shift * F.lit(1 << precision), shift
    ).cast("bigint")


def hdr_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    precision: int = 5,
) -> DataFrame:
    """Build the sketch: (*group_cols, bin_id BIGINT, cnt BIGINT), one row
    per non-empty bin. ``value_col`` must be a non-negative BIGINT measure
    (scale money to cents etc. upstream). Persist this table; it is the
    whole summary. One group-keyed shuffle; output is histogram-sized.

    Negative inputs RAISE (VERDICT r13): a negative value would feed
    ``length(bin(v))`` a 64-char two's-complement string in Spark and
    something else entirely in DuckDB — silently wrong bins. The guard
    rides the same projection (zero extra passes)."""
    g = list(group_cols or [])
    v = F.col(value_col).cast("bigint")
    checked = F.when(
        v < 0,
        F.raise_error(
            F.concat(
                F.lit(f"hdr_sketch: negative {value_col} ("),
                v.cast("string"),
                F.lit("); the sketch bins non-negative BIGINTs only — "
                      "scale/offset the measure upstream"),
            )
        ).cast("bigint"),
    ).otherwise(v)
    return (
        df.select(*g, _hdr_bin(checked, precision).alias("bin_id"))
        .groupBy(*g, "bin_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hdr_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum: the sketch of the union of the inputs (same
    precision). Touches only sketch rows."""
    from functools import reduce

    u = reduce(lambda a, b: a.unionByName(b), sketches)
    keys = [c for c in u.columns if c != "cnt"]
    return u.groupBy(*keys).agg(F.sum("cnt").cast("bigint").alias("cnt"))


def hdr_quantiles(
    sketch: DataFrame,
    quantiles: list[float],
    group_cols: list[str] | None = None,
    precision: int = 5,
) -> DataFrame:
    """Quantile estimates from a (possibly merged) sketch: one row per
    (*group_cols, q) with the bin lower bound whose cumulative count
    first reaches ceil(q * total) — within 2^-precision relative error of
    the exact quantile by the bin-width bound. Window work over
    sketch-sized rows only. ``quantiles`` are exact decimals (e.g. 0.5,
    0.95) multiplied out in integer space (q * 100) so the rank threshold
    ceil(q*total) = (q100 * total + 99) div 100 is BIGINT-exact in both
    engines. (Both Spark's div and DuckDB's // TRUNCATE toward zero, so
    the add-then-divide form is the correct ceiling; the negated-division
    idiom -((-a) div b) is a floor no-op under truncation.)"""
    g = list(group_cols or [])
    w_tot = Window.partitionBy(*g) if g else Window.partitionBy()
    w_cum = w_tot.orderBy("bin_id").rowsBetween(Window.unboundedPreceding, 0)
    base = sketch.withColumn("total", F.sum("cnt").over(w_tot)).withColumn(
        "cum", F.sum("cnt").over(w_cum)
    )
    qs = F.array(*[F.lit(int(round(q * 100))) for q in quantiles])
    hit = (
        base.withColumn("q100", F.explode(qs))
        .withColumn("rank_needed", F.expr("(q100 * total + 99) div 100"))
        .filter(F.col("cum") >= F.col("rank_needed"))
        .filter(F.col("cum") - F.col("cnt") < F.col("rank_needed"))
    )
    return hit.select(
        *g,
        (F.col("q100").cast("double") / F.lit(100.0)).alias("q"),
        _hdr_lo(F.col("bin_id"), precision).alias("value_lo"),
    )
