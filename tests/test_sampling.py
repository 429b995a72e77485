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
