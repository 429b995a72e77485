"""KMV sketches: estimator accuracy vs exact counts, the exact path under
k, merge == rebuild-from-raw identity, and NULL handling."""

from __future__ import annotations

from pyspark.sql import functions as F

from pincspark.operators.sketches import (
    kmv_estimate,
    kmv_merge,
    kmv_join_size,
    kmv_set_ops,
    kmv_sketch,
    kmv_update,
)


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


def _overlap_dfs(spark, n_a, n_b, n_shared):
    """Two value sets sharing exactly n_shared values: A = shared + a-only,
    B = shared + b-only."""
    a = [("g", f"s:{v}") for v in range(n_shared)] + [
        ("g", f"a:{v}") for v in range(n_a - n_shared)
    ]
    b = [("g", f"s:{v}") for v in range(n_shared)] + [
        ("g", f"b:{v}") for v in range(n_b - n_shared)
    ]
    schema = "grp string, val string"
    return spark.createDataFrame(a, schema), spark.createDataFrame(b, schema)


def test_set_ops_exact_under_k(spark):
    """Union kept < k: every output column is the exact count (the ratio
    estimates collapse to integers by construction)."""
    da, db = _overlap_dfs(spark, 30, 40, 10)
    out = kmv_set_ops(
        kmv_sketch(da, ["grp"], "val", k=256),
        kmv_sketch(db, ["grp"], "val", k=256),
        ["grp"],
        k=256,
    ).collect()[0]
    assert out["n_kept"] == 60 and out["est_union"] == 60
    assert out["inter_in_k"] == 10 and out["est_intersection"] == 10
    assert out["est_a_only"] == 20 and out["est_b_only"] == 30
    assert out["jaccard_ppm"] == 10 * 1_000_000 // 60


def test_set_ops_estimator_accuracy(spark):
    """10k-vs-10k with 5k shared, k=256: union/intersection/Jaccard all
    within a few standard errors (deterministic hashes, not flaky)."""
    da, db = _overlap_dfs(spark, 10000, 10000, 5000)
    out = kmv_set_ops(
        kmv_sketch(da, ["grp"], "val", k=256),
        kmv_sketch(db, ["grp"], "val", k=256),
        ["grp"],
        k=256,
    ).collect()[0]
    assert out["n_kept"] == 256
    assert abs(out["est_union"] - 15000) / 15000 < 0.2, out
    assert abs(out["est_intersection"] - 5000) / 5000 < 0.35, out
    assert abs(out["jaccard_ppm"] - 333_333) / 333_333 < 0.35, out


def test_set_ops_self_is_identity(spark):
    """A sketch against itself: every kept hash is in both sides."""
    df = _mkdf(spark, [("a", 5000)])
    sk = kmv_sketch(df, ["grp"], "val", k=128)
    out = kmv_set_ops(sk, sk, ["grp"], k=128).collect()[0]
    assert out["inter_in_k"] == out["n_kept"] == 128
    assert out["est_intersection"] == out["est_union"]
    assert out["jaccard_ppm"] == 1_000_000
    assert out["est_a_only"] == 0 and out["est_b_only"] == 0


def test_set_ops_group_missing_one_side(spark):
    """A group present in only one sketch still comes out (full union of
    groups), with an empty intersection."""
    da = _mkdf(spark, [("only_a", 20), ("both", 20)])
    db = _mkdf(spark, [("both", 20)])
    rows = {
        r["grp"]: r
        for r in kmv_set_ops(
            kmv_sketch(da, ["grp"], "val", k=64),
            kmv_sketch(db, ["grp"], "val", k=64),
            ["grp"],
            k=64,
        ).collect()
    }
    assert set(rows) == {"only_a", "both"}
    assert rows["only_a"]["inter_in_k"] == 0 and rows["only_a"]["est_b_only"] == 0
    assert rows["only_a"]["est_union"] == rows["only_a"]["est_a_only"] == 20
    # _mkdf values are grp-prefixed, so "both" shares ALL its values
    assert rows["both"]["jaccard_ppm"] == 1_000_000


def test_incremental_update_equals_rebuild(spark):
    """Folding micro-batches into a persisted sketch one at a time (the
    foreachBatch steady state) is bit-identical to sketching all raw
    values at once — history is never rescanned."""
    batches = [_mkdf(spark, [("a", 400)]), _mkdf2(spark, "a", 400, 800),
               _mkdf2(spark, "a", 600, 1200)]
    sk = kmv_sketch(batches[0], ["grp"], "val", k=64)
    for b in batches[1:]:
        sk = kmv_update(sk, b, ["grp"], "val", k=64)
    rebuilt = kmv_sketch(
        batches[0].unionByName(batches[1]).unionByName(batches[2]),
        ["grp"], "val", k=64,
    )
    assert sorted(r["h"] for r in sk.collect()) == sorted(
        r["h"] for r in rebuilt.collect()
    )


def _mkdf2(spark, grp, lo, hi):
    rows = [(grp, f"{grp}:{v}") for v in range(lo, hi)]
    return spark.createDataFrame(rows, "grp string, val string")


def test_duplicates_and_nulls_ignored(spark):
    rows = [("a", "x"), ("a", "x"), ("a", "y"), ("a", None)]
    df = spark.createDataFrame(rows, "grp string, val string")
    est = kmv_estimate(kmv_sketch(df, ["grp"], "val", k=8), ["grp"], k=8).collect()
    assert est[0]["n_kept"] == 2 and est[0]["est_distinct"] == 2


def test_counted_sketch_join_size_exact_under_k(spark):
    """Union kept < k: est_join_size is the exact join cardinality."""
    a = spark.createDataFrame(
        [("g", "x")] * 3 + [("g", "y")] * 2 + [("g", "a")], "grp string, val string"
    )
    b = spark.createDataFrame(
        [("g", "x")] * 4 + [("g", "y")] * 5 + [("g", "b")], "grp string, val string"
    )
    out = kmv_join_size(
        kmv_sketch(a, ["grp"], "val", k=64, with_counts=True),
        kmv_sketch(b, ["grp"], "val", k=64, with_counts=True),
        ["grp"],
        k=64,
    ).collect()[0]
    # exact: 3*4 (x) + 2*5 (y) = 22
    assert out["pair_sum"] == 22 and out["est_join_size"] == 22
    assert out["n_kept"] == 4  # x, y, a, b


def test_counted_sketch_join_size_estimator_accuracy(spark):
    """5000 shared keys with counts 2 and 3: true join size 30000;
    k=256 estimate within a few standard errors (deterministic)."""
    a_rows = [("g", f"s:{v}") for v in range(5000) for _ in range(2)]
    b_rows = [("g", f"s:{v}") for v in range(5000) for _ in range(3)] + [
        ("g", f"b:{v}") for v in range(5000)
    ]
    a = spark.createDataFrame(a_rows, "grp string, val string")
    b = spark.createDataFrame(b_rows, "grp string, val string")
    out = kmv_join_size(
        kmv_sketch(a, ["grp"], "val", k=256, with_counts=True),
        kmv_sketch(b, ["grp"], "val", k=256, with_counts=True),
        ["grp"],
        k=256,
    ).collect()[0]
    assert out["n_kept"] == 256
    assert abs(out["est_join_size"] - 30000) / 30000 < 0.35, out


def test_bottomk_sample_merge_equals_rebuild(spark):
    """Bottom-k row samples merge like KMV sketches: re-ranking the union
    of two samples == sampling the union of raw rows."""
    from pincspark.operators.sketches import bottomk_row_sample

    mk = lambda lo, hi: spark.createDataFrame(
        [("g", i, float(i % 97)) for i in range(lo, hi)],
        "grp string, id long, v double",
    )
    a, b = mk(0, 2000), mk(2000, 5000)
    sa = bottomk_row_sample(a, ["grp"], "id", ["v"], k=64)
    sb = bottomk_row_sample(b, ["grp"], "id", ["v"], k=64)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    merged = (
        sa.unionByName(sb)
        .withColumn(
            "rn2",
            F.row_number().over(Window.partitionBy("grp").orderBy("h")),
        )
        .filter(F.col("rn2") <= 64)
    )
    rebuilt = bottomk_row_sample(a.unionByName(b), ["grp"], "id", ["v"], k=64)
    assert sorted((r["h"], r["v"]) for r in merged.collect()) == sorted(
        (r["h"], r["v"]) for r in rebuilt.collect()
    )


def test_sample_quantiles_accuracy_and_determinism(spark):
    """On uniform data the k=128 sample's p50/p90 land within a few rank
    standard errors (1/sqrt(128) ~ 9%); emitted values are verbatim data
    points."""
    from pincspark.operators.sketches import bottomk_row_sample, sample_quantiles

    df = spark.createDataFrame(
        [("g", i, float(i)) for i in range(10000)], "grp string, id long, v double"
    )
    s = bottomk_row_sample(df, ["grp"], "id", ["v"], k=128)
    q = {r["prob"]: r["q"] for r in sample_quantiles(s, ["grp"], "v", [0.5, 0.9]).collect()}
    assert abs(q[0.5] - 5000) / 10000 < 0.15, q
    assert abs(q[0.9] - 9000) / 10000 < 0.15, q
    assert q[0.5] == float(int(q[0.5]))  # a verbatim data value


# ---------------------------------------------------------------------------
# frequent_items (q98): Misra-Gries candidates + exact recount
# ---------------------------------------------------------------------------

from pincspark.operators.sketches import frequent_items  # noqa: E402


def _exact_frequent(values, num, den):
    from collections import Counter

    c = Counter(v for v in values if v is not None)
    n = sum(c.values())
    return {k: v for k, v in c.items() if v * den >= num * n}


def _hh(spark, values, num, den, capacity=None, parts=7):
    df = spark.createDataFrame(
        [(v,) for v in values], ["k"]
    ).repartition(parts)
    rows = frequent_items(df, "k", num, den, capacity=capacity).collect()
    return {r["k"]: r["cnt"] for r in rows}


def test_frequent_items_exact_on_skewed_stream(spark):
    # Zipf-ish synthetic stream with MANY more distinct keys than the MG
    # capacity, spread over 7 partitions: the sketch must decrement, and
    # the recount must still produce EXACTLY the groupBy-HAVING answer —
    # no false positives, no false negatives.
    import random

    rng = random.Random(98)
    values = (
        ["hot"] * 400 + ["warm"] * 160 + ["edge"] * 100
        + [f"cold{i}" for i in range(300) for _ in range(rng.randint(1, 3))]
    )
    rng.shuffle(values)
    got = _hh(spark, values, 1, 10, capacity=10)
    assert got == _exact_frequent(values, 1, 10)
    assert "hot" in got and "cold0" not in got


def test_frequent_items_threshold_boundary_is_inclusive(spark):
    # 20 rows, support 1/4: a key with exactly 5 occurrences qualifies
    # (cnt * den >= num * N with no float ceil).
    values = ["a"] * 5 + ["b"] * 4 + [f"x{i}" for i in range(11)]
    got = _hh(spark, values, 1, 4, capacity=8, parts=3)
    assert got == {"a": 5}


def test_frequent_items_ignores_nulls(spark):
    values = ["a"] * 6 + [None] * 94 + ["b"] * 2
    got = _hh(spark, values, 1, 2, capacity=4, parts=2)
    # N counts only the 8 non-null rows: a (6/8) passes, b (2/8) fails.
    assert got == {"a": 6}


def test_frequent_items_rejects_undersized_capacity(spark):
    import pytest

    df = spark.createDataFrame([("a",)], ["k"])
    with pytest.raises(ValueError, match="no-false-negative"):
        frequent_items(df, "k", 1, 30, capacity=10)


def test_frequent_items_random_property_vs_exact(spark):
    # 5 seeded trials at adversarial capacity (exactly den/num): the
    # two-pass scheme must equal the exact answer on every draw.
    import random

    for seed in range(5):
        rng = random.Random(seed)
        values = [f"k{int(rng.expovariate(0.08))}" for _ in range(3000)]
        got = _hh(spark, values, 1, 25, capacity=25, parts=5)
        assert got == _exact_frequent(values, 1, 25), f"seed {seed}"


def test_frequent_items_bigint_keys(spark):
    values = [7] * 30 + [11] * 10 + list(range(100, 160))
    df = spark.createDataFrame([(v,) for v in values], ["k"]).repartition(4)
    got = {r["k"]: r["cnt"] for r in frequent_items(df, "k", 1, 5).collect()}
    assert got == {7: 30}


# --------------------------------------------------------------------------
# Count-min sketch
# --------------------------------------------------------------------------


def _cms_corpus(spark):
    # skewed corpus: 'a' x 300, 'b' x 50, 'c'..'l' x 5 each
    rows = (
        [("a",)] * 300 + [("b",)] * 50 + [(c,) for c in "cdefghij" for _ in range(5)]
    )
    return spark.createDataFrame(rows, "val string")


def test_cms_never_underestimates_and_is_tight_when_wide(spark):
    from pincspark.operators.sketches import cms_estimate, cms_sketch

    df = _cms_corpus(spark)
    sk = cms_sketch(df, "val", width=512, depth=3)
    probes = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("zzz",)], "val string"
    )
    est = {
        r["val"]: r["est"]
        for r in cms_estimate(sk, probes, "val", width=512, depth=3).collect()
    }
    exact = {"a": 300, "b": 50, "c": 5, "zzz": 0}
    for v, x in exact.items():
        assert est[v] >= x, (v, est[v], x)
    # 10 distinct values in 512 buckets x 3 rows: collisions are unlikely
    # enough that the min over rows is exact here (deterministic hashes —
    # a fixed assertion, not a flaky one)
    assert est == exact, est


def test_cms_merge_equals_rebuild(spark):
    from pincspark.operators.sketches import cms_merge, cms_sketch

    df = _cms_corpus(spark)
    a = df.limit(100)
    b = df.exceptAll(a)
    merged = cms_merge(
        cms_sketch(a, "val", width=64, depth=2),
        cms_sketch(b, "val", width=64, depth=2),
    )
    rebuilt = cms_sketch(df, "val", width=64, depth=2)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )


def test_cms_sketch_is_bounded_and_estimate_broadcasts(spark):
    """The sketch is <= depth*width rows however big the corpus, and the
    estimate path broadcasts the sketch (never shuffles the probe side
    against a corpus-sized table)."""
    from pincspark.operators.sketches import cms_estimate, cms_sketch

    df = _cms_corpus(spark)
    sk = cms_sketch(df, "val", width=16, depth=2)
    assert sk.count() <= 32
    probes = spark.createDataFrame([("a",)], "val string")
    plan = (
        cms_estimate(sk, probes, "val", width=16, depth=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan, plan


def test_global_sketch_two_phase_no_data_sized_window(spark):
    """kmv_sketch with NO group columns (a global sketch) must not plan a
    data-sized single-partition window (VERDICT r12 #2): the k-smallest
    selection goes through TakeOrderedAndProject (per-partition top-k
    heaps), and the only window left ranks <= k candidate rows. Results
    stay bit-identical to the grouped form on a constant key."""
    df = _mkdf(spark, [("a", 5000)])
    glob = kmv_sketch(df, [], "val", k=256)
    plan = glob._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    # the rank window must sit ABOVE the top-k limit, never directly on
    # the distinct-hash frame
    assert plan.find("Window") < plan.find("TakeOrderedAndProject"), plan

    via_const = kmv_sketch(
        df.withColumn("grp", F.lit("all")), ["grp"], "val", k=256
    )
    assert sorted((r["h"], r["rn"]) for r in glob.collect()) == sorted(
        (r["h"], r["rn"]) for r in via_const.collect()
    )

    # with_counts variant carries cnt through the same two-phase path
    dup = df.unionByName(df.limit(500))
    gc = kmv_sketch(dup, [], "val", k=64, with_counts=True)
    vc = kmv_sketch(
        dup.withColumn("grp", F.lit("all")), ["grp"], "val", k=64, with_counts=True
    )
    assert sorted((r["h"], r["cnt"], r["rn"]) for r in gc.collect()) == sorted(
        (r["h"], r["cnt"], r["rn"]) for r in vc.collect()
    )


# ---------------------------------------------------------------------------
# HDR histogram quantile sketch
# ---------------------------------------------------------------------------


def test_hdr_bin_monotone_and_invertible(spark):
    """Property: the bin mapping is monotone in v, contiguous, and every
    value lands in [lo(bin), lo(bin) + 2^shift) with relative width
    <= 2^-precision of the value."""
    from pincspark.operators.sketches import _hdr_bin, _hdr_lo
    from pyspark.sql import functions as F

    p = 5
    vals = (
        list(range(0, 200))
        + [2**i + d for i in range(6, 62) for d in (-1, 0, 1, 12345 % (2**i))]
    )
    df = spark.createDataFrame([(v,) for v in sorted(set(vals))], "v BIGINT")
    rows = (
        df.select("v", _hdr_bin(F.col("v"), p).alias("b"))
        .withColumn("lo", _hdr_lo(F.col("b"), p))
        .orderBy("v")
        .collect()
    )
    prev_b = -1
    for r in rows:
        assert r["b"] >= prev_b, (r, prev_b)  # monotone
        prev_b = r["b"]
        assert r["lo"] <= r["v"], r
        if r["v"] > (1 << p):  # relative-error regime
            width = r["lo"] // (1 << p) if r["lo"] else 1
            assert r["v"] - r["lo"] <= max(r["v"] >> p, 1), r
        else:  # exact regime: small values are their own bin
            assert r["lo"] == r["v"], r


def test_hdr_merge_equals_rebuild_and_quantile_error_bound(spark):
    """Cell-wise merge of per-part sketches == one-shot sketch of the
    union, and every extracted quantile is within 2^-precision relative
    error of the exact quantile (lower side: value_lo <= exact)."""
    import random

    from pincspark.operators.sketches import hdr_merge, hdr_quantiles, hdr_sketch

    rng = random.Random(1303)
    rows = [
        ("a", int(rng.lognormvariate(10, 2)) + 1) for _ in range(4000)
    ] + [("b", rng.randrange(0, 50)) for _ in range(1000)]
    df = spark.createDataFrame(rows, "g STRING, v BIGINT")

    whole = hdr_sketch(df, "v", ["g"])
    parts = [
        hdr_sketch(df.filter(F.abs(F.hash("v")) % 3 == i), "v", ["g"])
        for i in range(3)
    ]
    merged = hdr_merge(*parts)
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))

    got = {
        (r["g"], r["q"]): r["value_lo"]
        for r in hdr_quantiles(merged, [0.5, 0.95, 0.99], ["g"]).collect()
    }
    by_g = {"a": sorted(v for g, v in rows if g == "a"),
            "b": sorted(v for g, v in rows if g == "b")}
    for (g, q), lo in got.items():
        exact = by_g[g][max(0, -(-int(q * 100) * len(by_g[g]) // 100) - 1)]
        assert lo <= exact, (g, q, lo, exact)
        assert exact - lo <= max(exact >> 5, 1), (g, q, lo, exact)


def test_hdr_global_sketch_no_group_cols(spark):
    """Empty group_cols builds ONE global histogram; the quantile window
    runs over sketch-sized rows only (the kmv empty-group lesson — here
    the input to the window IS the histogram, so no data-sized funnel)."""
    from pincspark.operators.sketches import hdr_quantiles, hdr_sketch

    df = spark.range(10000).selectExpr("id AS v")
    sk = hdr_sketch(df, "v")
    assert sk.count() < 400  # histogram-sized, not data-sized
    got = {r["q"]: r["value_lo"] for r in hdr_quantiles(sk, [0.5, 1.0]).collect()}
    assert got[1.0] <= 9999 and 9999 - got[1.0] <= 9999 >> 5
    assert got[0.5] <= 4999 and 4999 - got[0.5] <= 4999 >> 5


def test_hdr_bin_random_int64_matches_python_reference(spark):
    """5000 seeded random values across the full non-negative int64 range:
    the column expression equals the bit-exact Python formula (floor-log2
    via bit_length, truncating shifts), and lo <= v < lo + 2^shift."""
    import random

    from pincspark.operators.sketches import _hdr_bin, _hdr_lo
    from pyspark.sql import functions as F

    p = 5
    rng = random.Random(1321)
    vals = sorted(
        {rng.randrange(0, 1 << b) for b in range(1, 63) for _ in range(85)}
    )

    def py_bin(v):
        shift = max(v.bit_length() - 1 - p, 0)
        return shift * (1 << p) + (v >> shift)

    def py_lo(b):
        shift = max(b // (1 << p) - 1, 0)
        return (b - shift * (1 << p)) << shift

    df = spark.createDataFrame([(v,) for v in vals], "v BIGINT")
    rows = (
        df.select("v", _hdr_bin(F.col("v"), p).alias("b"))
        .withColumn("lo", _hdr_lo(F.col("b"), p))
        .collect()
    )
    assert len(rows) == len(vals)
    for r in rows:
        assert r["b"] == py_bin(r["v"]), r
        assert r["lo"] == py_lo(r["b"]), r
        shift = max(r["b"] // (1 << p) - 1, 0)
        assert r["lo"] <= r["v"] < r["lo"] + (1 << shift), r


def test_hdr_sketch_rejects_negative_values(spark):
    """VERDICT r13 hardening: a negative measure would feed length(bin(v))
    a 64-char two's-complement string (silently wrong bins); the sketch
    now raises instead of mis-binning."""
    import pytest

    from pincspark.operators.sketches import hdr_sketch

    ok = spark.createDataFrame([(0,), (5,), (1 << 40,)], "v BIGINT")
    assert hdr_sketch(ok, "v").count() == 3  # zero stays legal (bin 0)
    bad = spark.createDataFrame([(5,), (-3,)], "v BIGINT")
    with pytest.raises(Exception, match="non-negative"):
        hdr_sketch(bad, "v").collect()
