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


def test_random_frames_match_backward_inclusive_model(spark):
    """Property coverage for J1 beyond the fixed fixtures: random
    left/right frames (duplicate left timestamps, keys with no right
    rows, dense ties) must match the documented backward-inclusive
    contract — for each left (k, t), attach the right row with the
    largest rt <= t, whole-row, else nulls. Right (k, rt) pairs are
    unique by construction: with duplicate right timestamps the winner
    is unspecified (pandas merge_asof shares that caveat)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(
        st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)),
                 min_size=1, max_size=25),
        st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)),
                 min_size=0, max_size=25),
    )
    def inner(left_rows, right_rows):
        right_uniq = {}
        for i, (k, t) in enumerate(right_rows):
            right_uniq[(k, t)] = f"v{i}"
        left = spark.createDataFrame(
            [(k, t) for k, t in left_rows], "k BIGINT, t INT"
        ).withColumn("t", F.timestamp_seconds("t"))
        if right_uniq:
            right = spark.createDataFrame(
                [(k, t, v) for (k, t), v in right_uniq.items()],
                "k BIGINT, t INT, v STRING",
            ).withColumn("t", F.timestamp_seconds("t"))
        else:
            right = spark.createDataFrame(
                [], "k BIGINT, t TIMESTAMP, v STRING"
            )
        got = sorted(
            (r["k"], int(r["t"].timestamp()), r["v"])
            for r in asof_join(left, right, on="t", by="k",
                               right_cols=["v"]).collect()
        )
        expect = []
        for k, t in left_rows:
            cands = [(rt, v) for (rk, rt), v in right_uniq.items()
                     if rk == k and rt <= t]
            expect.append((k, t, max(cands)[1] if cands else None))
        assert got == sorted(expect)

    inner()
