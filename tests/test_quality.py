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


def test_repetition_stats_kernel_matches_hof_twin(spark):
    """r16: gram counting moved from the interpreted HOF chain into an
    Arrow kernel — pin the kernel against the original ngram_array +
    array_sort + run_length_stats construction on adversarial docs:
    multi-space runs, empty/whitespace-only text, null text, sub-n docs,
    unicode grams around the tie-break (UTF8String binary order), and
    exact count ties."""
    from pincspark.operators.dedup import ngram_array

    docs = spark.createDataFrame(
        [
            (1, "a b c a b"),
            (2, "x x x x"),
            (3, "solo"),
            (4, ""),
            (5, "   "),
            (6, None),
            (7, "b a b a b a"),           # 2-gram tie 'a b' vs 'b a'
            (8, "é a é a É a"),           # unicode + case already lowered
            (9, "ab cd ab cd ef"),
            (10, "zé zé zé"),  # NFC vs NFD grams
        ],
        "doc_id INT, text STRING",
    )

    def hof_twin(df):
        from pincspark.functions.text import ws_tokens
        from pincspark.operators.quality import run_length_stats

        toks = ws_tokens(F.lower(F.col("text")))
        base = df.select(F.col("doc_id"), toks.alias("__toks"))
        arrs = base.select(
            "doc_id",
            F.size("__toks").alias("n_tokens"),
            F.size(F.array_distinct("__toks")).alias("__n_distinct"),
            ngram_array(F.col("__toks"), 2).alias("__gt"),
            ngram_array(F.col("__toks"), 3).alias("__gd"),
        )
        stats = arrs.select(
            "doc_id",
            "n_tokens",
            "__n_distinct",
            F.size("__gt").alias("__nt"),
            run_length_stats(F.array_sort("__gt")).alias("__st"),
            F.size("__gd").alias("__nd"),
            run_length_stats(F.array_sort("__gd")).alias("__sd"),
        )
        frac = lambda num, den: F.round(  # noqa: E731
            num.cast("double") / den.cast("double"), 6
        )
        return stats.select(
            "doc_id",
            "n_tokens",
            F.when(
                F.col("n_tokens") > 0,
                F.round(
                    1.0
                    - F.col("__n_distinct").cast("double") / F.col("n_tokens"),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_word_frac"),
            F.col("__st")["best_g"].alias("top_ngram"),
            frac(F.col("__st")["best_c"], F.col("__nt")).alias("top_ngram_frac"),
            frac(F.col("__sd")["dup"], F.col("__nd")).alias("dup_ngram_frac"),
        )

    got = {
        r["doc_id"]: tuple(r)
        for r in repetition_stats(docs, "doc_id", "text", 2, 3).collect()
    }
    want = {r["doc_id"]: tuple(r) for r in hof_twin(docs).collect()}
    assert got == want
