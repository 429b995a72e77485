"""Sampling + decontamination operators: determinism, partitioning
invariance, stratum caps, and a planted-leak fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from pincspark.operators.dedup import contamination_pairs
from pincspark.operators.sampling import hash_sample, stratified_fixed
from pincspark.sources.tables import table
from tests.conftest import SF_DIR


def test_hash_sample_deterministic_and_partition_invariant(spark):
    docs = table(spark, SF_DIR, "documents")
    a = sorted(r["doc_id"] for r in hash_sample(docs, "doc_id", 0.2, "x").collect())
    b = sorted(
        r["doc_id"]
        for r in hash_sample(docs.repartition(7, "lang"), "doc_id", 0.2, "x").collect()
    )
    assert a == b and len(a) > 0
    n = docs.count()
    assert 0.1 * n < len(a) < 0.35 * n  # roughly the asked fraction
    # a different salt draws a different sample
    c = sorted(r["doc_id"] for r in hash_sample(docs, "doc_id", 0.2, "y").collect())
    assert a != c


def test_stratified_fixed_caps_and_invariance(spark):
    docs = table(spark, SF_DIR, "documents")
    out = stratified_fixed(docs, "doc_id", ("lang", "source"), 3, salt="s")
    per = out.groupBy("lang", "source").count().collect()
    assert per and all(r["count"] <= 3 for r in per)
    again = stratified_fixed(
        docs.repartition(11, "doc_id"), "doc_id", ("lang", "source"), 3, salt="s"
    )
    key = lambda df: sorted((r["lang"], r["source"], r["doc_id"]) for r in df.collect())
    assert key(out) == key(again)


def test_contamination_planted_leak(spark):
    """An eval doc fully contained in a train doc scores containment 1.0;
    an unrelated eval doc produces no pair."""
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river bank"),
            (2, "completely different content about spark shuffles and partitions"),
        ],
        "doc_id LONG, text STRING",
    )
    eval_df = spark.createDataFrame(
        [
            (100, "quick brown fox jumps over the lazy dog"),  # subset of doc 1
            (200, "nothing shared with anything at all here honestly"),
        ],
        "doc_id LONG, text STRING",
    )
    rows = contamination_pairs(
        train, eval_df, "doc_id", "text", n=3, threshold=0.5
    ).collect()
    got = {(r["eval_id"], r["train_id"]): r["containment"] for r in rows}
    assert got == {(100, 1): 1.0}


def test_temperature_sample_flattens_source_skew(spark):
    from pincspark.operators.sampling import temperature_sample

    # 900 docs from 'big', 100 from 'small': alpha=0.5 weights sqrt(n),
    # q_big = 30/40, q_small = 10/40; budget 0.5 -> expected rates
    # big: 0.5*1000*(30/40)/900 = 0.41666, small: 0.5*1000*(10/40)/100 = 1.25 -> 1.0
    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_sample(df, "doc_id", "source", alpha=0.5, budget_fraction=0.5)
    rates = {r["source"]: r["keep_rate"] for r in out.select("source", "keep_rate").distinct().collect()}
    assert rates["small"] == 1.0
    assert abs(rates["big"] - 0.416667) < 1e-6
    # the small source is kept in full; the big one near its rate
    kept = out.filter("kept = 1").groupBy("source").count().collect()
    kd = {r["source"]: r["count"] for r in kept}
    assert kd["small"] == 100
    assert 0.30 * 900 < kd["big"] < 0.55 * 900  # hash-uniform around 0.4167


def test_temperature_sample_alpha_one_is_plain_budget(spark):
    from pincspark.operators.sampling import temperature_sample

    rows = [(i, "a" if i % 3 else "b") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_sample(df, "doc_id", "source", alpha=1.0, budget_fraction=0.4)
    # alpha=1 -> q_s = n_s/N -> rate = budget for every source
    assert {r["keep_rate"] for r in out.select("keep_rate").distinct().collect()} == {0.4}


def test_temperature_sample_membership_is_stable_under_growth(spark):
    """A doc's kept flag depends only on (salt, id) and its source's rate:
    with rates pinned at 1.0 (budget >= 1), growing the corpus never
    changes membership — and at lower budgets, membership equals the
    hash_sample filter at the same per-source rate."""
    from pincspark.operators.sampling import HASH_SPACE, sample_hash, temperature_sample

    df = spark.createDataFrame([(i, "s") for i in range(500)], "doc_id long, source string")
    out = temperature_sample(df, "doc_id", "source", alpha=0.5, budget_fraction=0.3)
    from pyspark.sql import functions as F

    expect = df.select(
        "doc_id",
        (sample_hash(F.col("doc_id"), "temp") < F.lit(0.3 * HASH_SPACE)).cast("int").alias("e"),
    )
    joined = out.join(expect, "doc_id")
    assert joined.filter("kept <> e").count() == 0


def test_stratified_fixed_presplit_is_exact(spark):
    """The two-phase skew-safe top-K (presplit=S) must produce IDENTICAL
    rows and ranks to the single-phase form on a Zipf-skewed key: every
    global top-K row is inside its own bucket's top-K, so phase 1 never
    drops a final survivor."""
    from pincspark.operators.sampling import stratified_fixed

    # skewed strata: one hot key with 800 rows, tails with 40/7/1
    rows = (
        [(i, "hot") for i in range(800)]
        + [(1000 + i, "warm") for i in range(40)]
        + [(2000 + i, "cool") for i in range(7)]
        + [(3000, "cold")]
    )
    df = spark.createDataFrame(rows, "doc_id long, domain string")

    def result(presplit):
        out = stratified_fixed(
            df, "doc_id", ("domain",), 10, salt="x", presplit=presplit
        )
        return sorted(
            (r["domain"], r["sample_rank"], r["doc_id"]) for r in out.collect()
        )

    single = result(0)
    assert result(4) == single
    assert result(16) == single  # more buckets than some strata have rows
    # caps honored: 10 for big strata, full stratum when smaller
    per = {}
    for dom, _, _ in single:
        per[dom] = per.get(dom, 0) + 1
    assert per == {"hot": 10, "warm": 10, "cool": 7, "cold": 1}


def test_group_holdout_split_no_group_straddles_splits(spark):
    """The leakage guard itself: every group maps to exactly ONE split,
    regardless of how many rows it has or where they sit."""
    from pincspark.operators.sampling import group_holdout_split

    events = table(spark, SF_DIR, "events")
    out = group_holdout_split(events, "user_id", salt="t")
    per_user = out.groupBy("user_id").agg(
        F.countDistinct("split").alias("n_splits")
    )
    assert per_user.filter(F.col("n_splits") > 1).count() == 0
    # all three splits are populated at this corpus size
    assert out.select("split").distinct().count() == 3


def test_group_holdout_split_proportions_and_determinism(spark):
    from pincspark.operators.sampling import group_holdout_split

    events = table(spark, SF_DIR, "events")
    out = group_holdout_split(events, "user_id", salt="t")
    groups = out.select("user_id", "split").distinct()
    n = groups.count()
    frac = {
        r["split"]: r["cnt"] / n
        for r in groups.groupBy("split").agg(F.count("*").alias("cnt")).collect()
    }
    assert 0.65 < frac["train"] < 0.95 and frac["val"] < 0.25 and frac["test"] < 0.25
    # partitioning-invariant and rerun-stable
    a = sorted(map(tuple, groups.collect()))
    b = sorted(
        map(
            tuple,
            group_holdout_split(events.repartition(13, "event_type"), "user_id", salt="t")
            .select("user_id", "split")
            .distinct()
            .collect(),
        )
    )
    assert a == b
    # a different salt reassigns some groups
    c = sorted(
        map(
            tuple,
            group_holdout_split(events, "user_id", salt="u")
            .select("user_id", "split")
            .distinct()
            .collect(),
        )
    )
    assert a != c


def test_group_holdout_split_sql_mirror_matches(spark):
    """The DuckDB CASE mirror assigns the identical split to every group —
    the exact arithmetic the q100 oracle relies on."""
    import duckdb

    from pincspark.operators.sampling import (
        group_holdout_split,
        group_holdout_split_sql,
    )

    events = table(spark, SF_DIR, "events")
    got = {
        (r["user_id"], r["split"])
        for r in group_holdout_split(events, "user_id", salt="t")
        .select("user_id", "split")
        .distinct()
        .collect()
    }
    case = group_holdout_split_sql("user_id", salt="t")
    want = set(
        duckdb.sql(
            f"SELECT DISTINCT user_id, {case} AS split "
            f"FROM '{SF_DIR}/events.parquet'"
        ).fetchall()
    )
    assert got == want


def test_group_holdout_split_is_narrow(spark):
    """Scale contract: the assignment is a pure projection — no exchange,
    no join, no window anywhere in the plan."""
    from pincspark.operators.sampling import group_holdout_split

    events = table(spark, SF_DIR, "events")
    plan = (
        group_holdout_split(events, "user_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for op in ("Exchange", "Join", "Window"):
        assert op not in plan, plan


def test_group_holdout_split_custom_weights_and_validation(spark):
    import pytest

    from pincspark.operators.sampling import group_holdout_split

    events = table(spark, SF_DIR, "events").limit(200)
    out = group_holdout_split(
        events, "user_id", splits=(("fit", 1), ("hold", 1)), salt="t"
    )
    assert set(r["split"] for r in out.select("split").distinct().collect()) <= {
        "fit",
        "hold",
    }
    with pytest.raises(ValueError):
        group_holdout_split(events, "user_id", splits=(("a", 0), ("b", 0)))
    with pytest.raises(ValueError):
        group_holdout_split(events, "user_id", splits=(("a", -1), ("b", 2)))


def test_group_holdout_split_rejects_zero_weight(spark):
    """Zero-weight splits would silently never be assigned (ADVICE r12):
    they must raise instead of degrading into an empty eval set."""
    import pytest

    from pincspark.operators.sampling import group_holdout_split

    events = table(spark, SF_DIR, "events").limit(10)
    with pytest.raises(ValueError):
        group_holdout_split(
            events, "user_id", splits=(("train", 8), ("val", 0), ("test", 2))
        )
    with pytest.raises(ValueError):
        group_holdout_split(
            events, "user_id", splits=(("train", 8), ("test", 0))
        )
    with pytest.raises(ValueError):
        group_holdout_split(events, "user_id", splits=())


def test_cluster_holdout_never_splits_a_near_dup_pair(spark):
    """The q109 guarantee, checked pair-wise: every MinHash-LSH candidate
    pair lands in the SAME split (row- and user-level splits cannot give
    this), and split assignment is a pure function of the cluster root."""
    from pincspark.operators.dedup import dedup_clusters, minhash_lsh_pairs
    from pincspark.operators.sampling import group_holdout_split
    from pyspark.sql import functions as F

    rows = []
    for i in range(30):
        # distinct vocabulary per pair so clusters stay pairwise (a shared
        # template would LSH-merge the whole corpus into one cluster)
        base = " ".join(f"tok{i}x{j}" for j in range(12))
        rows.append((i, base))
        rows.append((100 + i, base + f" extra{i}"))  # near-dup of i
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")

    pairs = minhash_lsh_pairs(docs, "doc_id", "text", n=3, num_perms=16, bands=4)
    clusters = dedup_clusters(pairs)
    with_cluster = (
        docs.select("doc_id")
        .join(clusters, docs["doc_id"] == clusters["node"], "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
        )
    )
    split = group_holdout_split(with_cluster, "cluster_id", salt="clsplit")
    assign = {r["doc_id"]: r["split"] for r in split.collect()}
    got_pairs = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
    assert got_pairs  # the fixture really produced near-dup pairs
    for a, b in got_pairs:
        assert assign[a] == assign[b], (a, b, assign[a], assign[b])
    # and the corpus still spreads across all three splits
    assert {"train", "val", "test"} <= set(assign.values())
