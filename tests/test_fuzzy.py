"""Edit-distance fuzzy pair join: verify semantics, blocking contract,
degenerate-block cap, and threshold behavior."""

from __future__ import annotations

from pincspark.operators.dedup import fuzzy_dup_pairs


def _df(spark, rows):
    return spark.createDataFrame(rows, "id int, k string")


def test_fuzzy_pairs_within_threshold(spark):
    df = _df(
        spark,
        [
            (1, "introduction to spark"),
            (2, "introduction to sparks"),  # dist 1
            (3, "introduction to flink"),  # dist 5 from #1 -> out at max 2
            (4, "zzz unrelated title"),
        ],
    )
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_dup_pairs(df, "id", "k", max_dist=2, prefix_len=4).collect()
    }
    assert got == {(1, 2): 1}


def test_fuzzy_pairs_prefix_blocking_contract(spark):
    """Pairs differing inside the blocking prefix are NOT proposed even if
    the edit distance qualifies (the documented recall trade-off); a pair
    differing only PAST the prefix is."""
    df = _df(spark, [(1, "abcdef hello"), (2, "xbcdef hello"), (3, "abcdef hxllo")])
    got = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_dup_pairs(df, "id", "k", max_dist=2, prefix_len=4).collect()
    }
    assert got == {(1, 3)}  # (1,2) is dist 1 but blocked apart


def test_fuzzy_pairs_case_and_trim_fold(spark):
    df = _df(spark, [(1, "  Hello World "), (2, "hello world")])
    got = fuzzy_dup_pairs(df, "id", "k", max_dist=0, prefix_len=4).collect()
    assert [(r["id_a"], r["id_b"], r["dist"]) for r in got] == [(1, 2, 0)]


def test_fuzzy_pairs_block_cap_excludes_degenerate_prefix(spark):
    rows = [(i, f"same prefix variant {i}") for i in range(12)]
    df = _df(spark, rows)
    assert fuzzy_dup_pairs(df, "id", "k", max_dist=3, prefix_len=4, max_block_size=10).count() == 0
    assert fuzzy_dup_pairs(df, "id", "k", max_dist=3, prefix_len=4, max_block_size=100).count() > 0
