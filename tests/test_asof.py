"""As-of join equivalence: the window implementation (default) and the
cogrouped applyInPandas merge_asof variant must agree exactly on the events
split — and both match pandas semantics on edge fixtures (FIXTURES.md B3:
position before any static -> nulls, equal-ts tie -> inclusive, multiple
statics between positions -> latest wins)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pincspark.operators.asof import asof_join, asof_join_grouped
from pincspark.sources.tables import table
from tests.conftest import SF_DIR


def _norm(rows, cols):
    return sorted(tuple(r[c] for c in cols) for r in rows)


def test_window_and_grouped_variants_agree(spark):
    ev = table(spark, SF_DIR, "events")
    obs = ev.filter(F.col("event_type") != "signup").select("event_id", "user_id", "ts")
    sig = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("event_id").alias("signup_event_id")
    )
    cols = ["event_id", "user_id", "ts", "signup_event_id", "ts_right"]
    a = asof_join(obs, sig, on="ts", by="user_id", right_cols=["signup_event_id"])
    b = asof_join_grouped(obs, sig, on="ts", by="user_id", right_cols=["signup_event_id"])
    assert _norm(a.collect(), cols) == _norm(b.collect(), cols)


@pytest.mark.parametrize("impl", [asof_join, asof_join_grouped], ids=["window", "grouped"])
def test_edge_semantics(spark, impl):
    left = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 30), (2, 10)], "k BIGINT, t INT"
    ).withColumn("t", F.timestamp_seconds("t"))
    right = spark.createDataFrame(
        [(1, 15, "a"), (1, 20, "b"), (1, 25, "c")], "k BIGINT, t INT, v STRING"
    ).withColumn("t", F.timestamp_seconds("t"))
    got = {
        (r["k"], r["t"].second + 60 * r["t"].minute): r["v"]
        for r in impl(left, right, on="t", by="k", right_cols=["v"]).collect()
    }
    assert got[(1, 10)] is None      # before any right row
    assert got[(1, 20)] == "b"       # equal ts -> inclusive
    assert got[(1, 30)] == "c"       # latest of multiple wins
    assert got[(2, 10)] is None      # key with no right rows at all


@pytest.mark.parametrize("impl", [asof_join, asof_join_grouped], ids=["window", "grouped"])
def test_null_bearing_right_rows_attach_as_one_row(spark, impl):
    """merge_asof semantics: the single matched right row attaches WHOLE,
    nulls included — never a per-column coalesce across different right
    rows. Fixture mirrors type-24 statics where part A (name, null type)
    and part B (type, null name) alternate: at t=30 the match is the B row,
    so its null name must NOT be backfilled from the earlier A row."""
    left = spark.createDataFrame(
        [(1, 15), (1, 30)], "k BIGINT, t INT"
    ).withColumn("t", F.timestamp_seconds("t"))
    right = spark.createDataFrame(
        [(1, 10, "ANNA", None), (1, 20, None, 60)],
        "k BIGINT, t INT, name STRING, stype INT",
    ).withColumn("t", F.timestamp_seconds("t"))
    rows = {
        r["t"].second + 60 * r["t"].minute: (r["name"], r["stype"])
        for r in impl(left, right, on="t", by="k", right_cols=["name", "stype"]).collect()
    }
    assert rows[15] == ("ANNA", None)   # matched row = part A
    assert rows[30] == (None, 60)       # matched row = part B, name stays null
