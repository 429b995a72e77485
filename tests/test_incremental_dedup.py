"""Cross-snapshot incremental dedup (incremental_dedup / dedup_snapshot):
planted exact duplicates, near duplicates, and novel documents — including
the branches the synthetic catalog split never fires (exact_dup=1, and the
persisted-snapshot prior path)."""

from __future__ import annotations

from pyspark.sql import functions as F


_LONG = (
    "spark shuffles partition data across executors during wide stages and "
    "the adaptive planner coalesces small partitions while broadcast joins "
    "skip the exchange entirely for dimension tables under the size"
)
PRIOR = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, _LONG + " threshold"),
    (3, "completely unrelated prior text about maritime navigation beacons"),
]
# 101: byte-exact copy of prior 1 (exact + near).
# 102: prior 2 with ONLY the final word changed (high-Jaccard near-dup,
#      not exact).
# 103: novel text (kept).
# 104: exact copy modulo normalization (case/punct) of prior 3 -> exact dup
#      because the fingerprint is over normalized text.
NEW = [
    (101, "the quick brown fox jumps over the lazy dog near the river bank"),
    (102, _LONG + " ceiling"),
    (103, "a totally fresh document with nothing in common whatsoever here"),
    (104, "Completely UNRELATED prior text, about maritime navigation beacons!"),
]


def _flags(spark, prior_is_snapshot):
    from pincspark.operators.dedup import dedup_snapshot, incremental_dedup

    prior = spark.createDataFrame(PRIOR, ["doc_id", "text"])
    new = spark.createDataFrame(NEW, ["doc_id", "text"])
    if prior_is_snapshot:
        prior = dedup_snapshot(prior, "doc_id", "text", n=3, num_perms=16)
    out = incremental_dedup(
        new, prior, "doc_id", "text", tau=0.5, prior_is_snapshot=prior_is_snapshot
    ).collect()
    return {r["doc_id"]: r for r in out}


def test_exact_near_and_novel_flags(spark):
    got = _flags(spark, prior_is_snapshot=False)
    assert set(got) == {101, 102, 103, 104}
    assert (got[101]["exact_dup"], got[101]["near_dup"], got[101]["kept"]) == (1, 1, 0)
    assert got[101]["best_est"] == 1.0
    # one-word edit: not exact, but high estimated Jaccard
    assert got[102]["exact_dup"] == 0
    assert got[102]["near_dup"] == 1 and got[102]["kept"] == 0
    assert 0.5 <= got[102]["best_est"] <= 1.0
    # novel doc survives
    assert (got[103]["exact_dup"], got[103]["near_dup"], got[103]["kept"]) == (0, 0, 1)
    # normalization-equal text IS an exact dup (fingerprint over normalized)
    assert got[104]["exact_dup"] == 1 and got[104]["kept"] == 0


def test_snapshot_path_matches_corpus_path(spark):
    direct = _flags(spark, prior_is_snapshot=False)
    snap = _flags(spark, prior_is_snapshot=True)
    as_tuples = lambda d: {
        k: (v["exact_dup"], v["near_dup"], v["best_est"], v["kept"])
        for k, v in d.items()
    }
    assert as_tuples(direct) == as_tuples(snap)


def test_oversized_prior_buckets_are_excluded(spark):
    from pincspark.operators.dedup import incremental_dedup

    # 5 identical prior docs = every band bucket has 5 members; cap at 4
    # excludes them all, so the near path goes dark while exact still fires.
    prior = spark.createDataFrame(
        [(i, "same boilerplate text repeated everywhere") for i in range(5)],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [(100, "same boilerplate text repeated everywhere")], ["doc_id", "text"]
    )
    out = incremental_dedup(
        new, prior, "doc_id", "text", tau=0.5, max_bucket_size=4
    ).collect()[0]
    assert out["exact_dup"] == 1
    assert out["near_dup"] == 0 and out["best_est"] is None


def test_within_crawl_duplicates_are_not_flagged(spark):
    from pincspark.operators.dedup import incremental_dedup

    prior = spark.createDataFrame([(1, "prior corpus text")], ["doc_id", "text"])
    new = spark.createDataFrame(
        [(10, "duplicate inside the crawl only"), (11, "duplicate inside the crawl only")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in
           incremental_dedup(new, prior, "doc_id", "text").collect()}
    # both kept: the operator screens against the snapshot only
    assert out[10]["kept"] == 1 and out[11]["kept"] == 1


def test_narrow_form_matches_batch_operator(spark):
    """incremental_dedup_narrow (the zero-new-side-aggregation, stream-
    ready form) returns the IDENTICAL rows as incremental_dedup on the
    same corpus — including on a larger random corpus where buckets hold
    multiple candidates and the per-row HOF max must reproduce the
    groupBy max exactly."""
    import random

    from pincspark.operators.dedup import (
        dedup_snapshot,
        incremental_dedup,
        incremental_dedup_narrow,
    )

    prior = spark.createDataFrame(PRIOR, ["doc_id", "text"])
    new = spark.createDataFrame(NEW, ["doc_id", "text"])
    snap = dedup_snapshot(prior, "doc_id", "text", n=3, num_perms=16)
    want = sorted(
        map(
            tuple,
            incremental_dedup(
                new, snap, "doc_id", "text", tau=0.5, prior_is_snapshot=True
            ).collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            incremental_dedup_narrow(new, snap, "doc_id", "text", tau=0.5).collect(),
        )
    )
    assert got == want

    rng = random.Random(1307)
    vocab = [f"tok{i}" for i in range(60)]

    def doc():
        return " ".join(rng.choice(vocab) for _ in range(rng.randrange(6, 30)))

    prior_rows = [(i, doc()) for i in range(60)]
    new_rows = [(100 + i, doc()) for i in range(40)] + [
        (200 + i, prior_rows[i][1] + " extra") for i in range(10)  # near dups
    ] + [(300 + i, prior_rows[i][1]) for i in range(5)]  # exact dups
    pr = spark.createDataFrame(prior_rows, ["doc_id", "text"])
    nw = spark.createDataFrame(new_rows, ["doc_id", "text"])
    snap2 = dedup_snapshot(pr, "doc_id", "text", n=3, num_perms=16)
    want2 = sorted(
        map(
            tuple,
            incremental_dedup(
                nw, snap2, "doc_id", "text", tau=0.5, prior_is_snapshot=True
            ).collect(),
        )
    )
    got2 = sorted(
        map(tuple, incremental_dedup_narrow(nw, snap2, "doc_id", "text", tau=0.5).collect())
    )
    assert got2 == want2


def test_minhash_signature_cols_match_grouped_signatures(spark):
    """The per-row HOF signature equals the explode+groupBy signature
    bit-for-bit on every doc (including the empty-normalized edge)."""
    from pincspark.operators.dedup import minhash_signature_cols, minhash_signatures

    rows = PRIOR + NEW + [(999, ""), (998, "!!!")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    grouped = {
        r["doc_id"]: tuple(r[f"mh{i}"] for i in range(16))
        for r in minhash_signatures(df, "doc_id", "text", 3, 16).collect()
    }
    narrow = {
        r["doc_id"]: tuple(r[f"mh{i}"] for i in range(16))
        for r in df.select("doc_id", *minhash_signature_cols("text", 3, 16)).collect()
    }
    assert narrow == grouped


def test_narrow_form_with_empty_snapshot_keeps_everything(spark):
    """Cold-start edge: an empty prior snapshot (day zero of a crawl)
    must keep every new document — no null-bucket join surprises."""
    from pincspark.operators.dedup import dedup_snapshot, incremental_dedup_narrow

    prior = spark.createDataFrame([], "doc_id BIGINT, text STRING")
    snap = dedup_snapshot(prior, "doc_id", "text", n=3, num_perms=16)
    new = spark.createDataFrame(NEW, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in incremental_dedup_narrow(new, snap).collect()}
    assert set(out) == {101, 102, 103, 104}
    for r in out.values():
        assert (r["exact_dup"], r["near_dup"], r["kept"]) == (0, 0, 1)
        assert r["best_est"] is None
