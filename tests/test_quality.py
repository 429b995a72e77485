"""Repetition quality rules (operators/quality.py): planted fixtures for the
run-length HOF and the per-doc metrics, plus the zero-shuffle plan property.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pincspark.operators.quality import repetition_stats, run_length_stats


def _stats(spark, arr):
    row = (
        spark.createDataFrame([(arr,)], "a ARRAY<STRING>")
        .select(run_length_stats(F.array_sort("a")).alias("s"))
        .collect()[0]["s"]
    )
    return (row["dup"], row["best_c"], row["best_g"])


def test_run_length_stats_basic(spark):
    # b appears 3x, a 2x, c 1x -> dup = 3+2 = 5, best run = b(3)
    assert _stats(spark, ["b", "a", "b", "c", "a", "b"]) == (5, 3, "b")


def test_run_length_stats_tie_breaks_to_larger_value(spark):
    # a and b both appear twice: tie -> lexicographically larger value wins
    assert _stats(spark, ["a", "b", "a", "b"]) == (4, 2, "b")


def test_run_length_stats_all_unique_and_empty(spark):
    assert _stats(spark, ["x", "y", "z"]) == (0, 1, "z")
    assert _stats(spark, []) == (0, 0, "")


def test_repetition_stats_planted(spark):
    docs = spark.createDataFrame(
        [
            # 6 tokens, 4 distinct; 2-grams: "a b" twice out of 5 -> 0.4;
            # 3-grams: all 4 distinct -> dup 0.0
            (1, "a b c a b d"),
            # pathological repetition: "x x x x" -> dup_word 0.75,
            # top 2-gram "x x" 3/3, 3-grams "x x x" 2/2 duplicated
            (2, "x x x x"),
            # shorter than n: collapses to one whole-doc gram
            (3, "solo"),
        ],
        "doc_id INT, text STRING",
    )
    rows = {
        r["doc_id"]: r
        for r in repetition_stats(docs, "doc_id", "text", 2, 3).collect()
    }
    r1 = rows[1]
    assert r1["n_tokens"] == 6
    assert r1["dup_word_frac"] == pytest.approx(1 - 4 / 6, abs=1e-6)
    assert (r1["top_ngram"], r1["top_ngram_frac"]) == ("a b", 0.4)
    assert r1["dup_ngram_frac"] == 0.0
    r2 = rows[2]
    assert r2["dup_word_frac"] == 0.75
    assert (r2["top_ngram"], r2["top_ngram_frac"]) == ("x x", 1.0)
    assert r2["dup_ngram_frac"] == 1.0
    r3 = rows[3]
    assert (r3["top_ngram"], r3["top_ngram_frac"]) == ("solo", 1.0)
    assert r3["dup_word_frac"] == 0.0


def test_repetition_stats_zero_shuffle_plan(spark):
    """The whole metric set must stay a narrow map stage: scan -> project,
    no Exchange, no explode/generate — per-doc independence is what makes
    this hold at 100 TB."""
    docs = spark.createDataFrame([(1, "a b c a b")], "doc_id INT, text STRING")
    plan = repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Generate" not in plan  # no explode path
