"""Slowly-changing-dimension (SCD Type 2) history building and
incremental merge.

The engine's latest-state upsert (`streaming/sinks.py::upsert_latest`,
the reference's ais_ivef.py:286-312 track-state analog) keeps only the
NEWEST row per key; a warehouse dimension usually needs the full version
history — every state a key passed through, with validity intervals.
`scd2_from_events` builds that history from an event stream;
`scd2_merge` folds a new batch into an EXISTING history by replaying
only the affected keys' timelines — untouched keys pass through with an
anti-join and are never recomputed, which at 100 TB is the difference
between touching a day's churn and rewriting the whole dimension.

Merge correctness is an identity, not a heuristic: a version row is an
event at its own ``eff_from``, so replaying {existing versions of
affected keys} ∪ {batch events} through the same run-length collapse
reproduces exactly the rebuild-from-all-events result for IN-ORDER
feeds (every batch event at-or-after the key's last seen event — the
normal CDC case; q78 driver-gates merge(prefix) == rebuild(all) against
a single-pass SQL oracle). Late batch events are still merged
correctly against the VERSION history: one that lands inside an old
interval splits it at every retained change point. The one inherent
difference from a raw-log rebuild: an observation that collapsed as a
same-state no-op is not retained, so it cannot re-split an interval
after a late different-state event lands before it (pinned in
tests/test_streaming.py). Retain the raw event log if that
distinction matters.

Shape: one shuffle per call keyed on the dimension key; the change
detector (lag) and interval close (lead) share that single sort. No
UDFs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_events(
    events: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
) -> DataFrame:
    """Event stream -> SCD2 version table (key..., attrs..., eff_from,
    eff_to with NULL = current version): per key in ``ts_col`` order,
    consecutive events whose ``attr_cols`` are all unchanged collapse
    into one version. ``(key, ts)`` must be unique (pre-dedupe ties with
    a deterministic rule — see q78). NULL attrs compare null-safely."""
    keys = list(key_cols)
    attrs = list(attr_cols)
    w = Window.partitionBy(*keys).orderBy(ts_col)
    unchanged = F.lit(True)
    for a in attrs:
        unchanged = unchanged & F.col(a).eqNullSafe(F.lag(a).over(w))
    is_first = F.lag(ts_col).over(w).isNull()
    changed = events.withColumn("__chg", is_first | ~unchanged).filter(
        F.col("__chg")
    )
    return (
        changed.withColumn("eff_from", F.col(ts_col))
        .withColumn("eff_to", F.lead("eff_from").over(w))
        .select(*keys, *attrs, "eff_from", "eff_to")
    )


def scd2_merge(
    dim: DataFrame,
    batch: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
) -> DataFrame:
    """Fold ``batch`` events into an existing SCD2 ``dim``: keys absent
    from the batch pass through untouched (anti-join — no recompute, no
    rewrite); affected keys replay {their existing versions as events at
    eff_from} ∪ {their batch events} through
    :func:`scd2_from_events`. Identical to rebuilding from all events
    ever seen for in-order feeds (pinned in tests and driver-gated by
    q78); see the module docstring for the late-event contract."""
    keys = list(key_cols)
    attrs = list(attr_cols)
    affected = batch.select(*keys).distinct()
    untouched = dim.join(affected, keys, "left_anti")
    dim_events = dim.join(affected, keys, "left_semi").select(
        *keys, F.col("eff_from").alias(ts_col), *attrs
    )
    # a batch event at exactly an existing version's eff_from supersedes
    # that version event (the batch is the newer statement of the state
    # at that instant) — keeps (key, ts) unique in the replay
    dim_events = dim_events.join(
        batch.select(*keys, ts_col).distinct(), keys + [ts_col], "left_anti"
    )
    replay = dim_events.unionByName(batch.select(*keys, ts_col, *attrs))
    rebuilt = scd2_from_events(replay, keys, ts_col, attrs)
    return untouched.unionByName(rebuilt)
