"""Funnel ordering semantics and cohort retention on planted timelines."""

from __future__ import annotations

from datetime import datetime

from pincspark.operators.behavior import cohort_retention, funnel_steps

STEPS = ["view", "click", "purchase"]


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, datetime(2024, 1, d, h), s) for u, d, h, s in rows],
        "u string, ts timestamp, step string",
    )


def test_funnel_order_matters(spark):
    ev = _ev(
        spark,
        [
            # u1: full ordered funnel
            ("u1", 1, 1, "view"), ("u1", 1, 2, "click"), ("u1", 1, 3, "purchase"),
            # u2: click BEFORE view -> only step 1 counts
            ("u2", 1, 2, "click"), ("u2", 1, 3, "view"),
            # u3: view then purchase (skipped click) -> 1
            ("u3", 1, 1, "view"), ("u3", 1, 2, "purchase"),
            # u4: purchase only -> 0
            ("u4", 1, 1, "purchase"),
            # u5: later re-click after view counts even though an earlier
            # click preceded the view (earliest QUALIFYING = earliest overall
            # here fails; min(click) < min(view) -> stops at 1)
            ("u5", 1, 3, "click"), ("u5", 1, 4, "view"), ("u5", 1, 5, "purchase"),
        ],
    )
    got = {r["u"]: r["reached"] for r in funnel_steps(ev, "u", "ts", "step", STEPS).collect()}
    assert got == {"u1": 3, "u2": 1, "u3": 1, "u4": 0, "u5": 1}


def test_funnel_simultaneous_steps_not_counted(spark):
    # strict ordering: a click at the same instant as the view doesn't count
    ev = _ev(spark, [("u", 1, 1, "view"), ("u", 1, 1, "click")])
    got = funnel_steps(ev, "u", "ts", "step", STEPS).collect()[0]["reached"]
    assert got == 1


def test_cohort_retention_counts(spark):
    ev = _ev(
        spark,
        [
            # cohort week of Jan 1 (Mon): a active weeks 0 and 1; b week 0 only
            ("a", 1, 1, "view"), ("a", 2, 1, "view"), ("a", 8, 1, "view"),
            ("b", 3, 1, "view"),
            # cohort week of Jan 8: c active weeks 0 and 2
            ("c", 9, 1, "view"), ("c", 22, 1, "view"),
        ],
    )
    rows = cohort_retention(ev, "u", "ts", period="week").collect()
    got = {(str(r["cohort_period"])[:10], r["periods_since"]): r["active"] for r in rows}
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 2): 1,
    }
