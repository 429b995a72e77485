"""SCD2 history building + incremental merge: run-length collapse,
null-safe attr comparison, the merge==rebuild identity (incl. late
events landing inside old intervals and ts-collision supersedence), and
the untouched-keys pass-through."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from pincspark.operators.scd import scd2_from_events, scd2_merge


def _ev(spark, rows):
    return spark.createDataFrame(
        [(k, datetime(2024, 1, d), s) for k, d, s in rows],
        "k string, ts timestamp, state string",
    )


def _vers(df):
    rows = [
        (r["k"], r["state"], r["eff_from"].day, r["eff_to"].day if r["eff_to"] else None)
        for r in df.collect()
    ]
    return sorted(rows, key=lambda t: (t[0], t[2]))


def test_from_events_collapses_runs(spark):
    ev = _ev(spark, [("a", 1, "x"), ("a", 2, "x"), ("a", 3, "y"), ("a", 4, "x")])
    got = _vers(scd2_from_events(ev, ["k"], "ts", ["state"]))
    assert got == [("a", "x", 1, 3), ("a", "y", 3, 4), ("a", "x", 4, None)]


def test_from_events_null_attrs_compare_null_safely(spark):
    ev = _ev(spark, [("a", 1, None), ("a", 2, None), ("a", 3, "x")])
    got = _vers(scd2_from_events(ev, ["k"], "ts", ["state"]))
    assert got == [("a", None, 1, 3), ("a", "x", 3, None)]


def test_merge_equals_rebuild_with_late_and_boundary_events(spark):
    """Batch includes a LATE event inside an old interval and an event at
    exactly an existing version's eff_from (supersedence)."""
    prefix = _ev(spark, [("a", 1, "x"), ("a", 5, "y"), ("b", 2, "p")])
    batch = _ev(
        spark,
        [
            ("a", 3, "z"),  # late: splits the old x-interval
            ("a", 5, "w"),  # collides with version eff_from day 5 -> wins
            ("a", 8, "w"),  # collapses into the w run
            ("b", 9, "q"),
        ],
    )
    dim = scd2_from_events(prefix, ["k"], "ts", ["state"])
    merged = scd2_merge(dim, batch, ["k"], "ts", ["state"])
    rebuilt = scd2_from_events(
        # supersedence rule applied to the full stream: day-5 'y' is
        # replaced by the batch's day-5 'w'
        _ev(
            spark,
            [("a", 1, "x"), ("a", 3, "z"), ("a", 5, "w"), ("a", 8, "w"),
             ("b", 2, "p"), ("b", 9, "q")],
        ),
        ["k"],
        "ts",
        ["state"],
    )
    assert _vers(merged) == _vers(rebuilt)


def test_merge_passes_untouched_keys_through(spark):
    prefix = _ev(spark, [("a", 1, "x"), ("b", 1, "p"), ("b", 4, "q")])
    batch = _ev(spark, [("a", 6, "y")])
    dim = scd2_from_events(prefix, ["k"], "ts", ["state"])
    merged = scd2_merge(dim, batch, ["k"], "ts", ["state"])
    got = _vers(merged)
    assert ("b", "p", 1, 4) in got and ("b", "q", 4, None) in got
    assert ("a", "x", 1, 6) in got and ("a", "y", 6, None) in got
    # and the plan actually anti-joins b through: no b rows in the replay
    # (cheap structural check — replay output only holds affected keys)
    assert [g for g in got if g[0] == "b"] == [("b", "p", 1, 4), ("b", "q", 4, None)]
