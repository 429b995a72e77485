"""Vocab builder (operators/vocab.py): planted tf/df, deterministic
tie-breaks, and the top-k-without-full-sort plan property."""

from __future__ import annotations

from pincspark.operators.vocab import vocab_topk


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "red blue red green"),
            (2, "red blue blue"),
            (3, "green green yellow"),
        ],
        "doc_id INT, text STRING",
    )


def test_unigram_tf_df_and_ties(spark):
    rows = vocab_topk(_docs(spark), n=1, k=10).collect()
    by_token = {r["token"]: r for r in rows}
    # red: tf 3 (2+1), df 2; blue: tf 3 (1+2), df 2 -> tie on (tf, df),
    # token asc breaks it: blue before red
    assert (by_token["red"]["tf"], by_token["red"]["df"]) == (3, 2)
    assert (by_token["blue"]["tf"], by_token["blue"]["df"]) == (3, 2)
    assert (by_token["green"]["tf"], by_token["green"]["df"]) == (3, 2)
    assert [r["token"] for r in sorted(rows, key=lambda r: r["token_id"])] == [
        "blue",
        "green",
        "red",
        "yellow",
    ]
    assert by_token["yellow"]["token_id"] == 4


def test_k_truncates(spark):
    rows = vocab_topk(_docs(spark), n=1, k=2).collect()
    assert [r["token"] for r in sorted(rows, key=lambda r: r["token_id"])] == [
        "blue",
        "green",
    ]


def test_topk_plan_has_no_full_sort(spark):
    """The global top-k must compile to TakeOrderedAndProject — a full
    vocabulary sort would shuffle the entire gram table to order it."""
    plan = (
        vocab_topk(_docs(spark), n=2, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
