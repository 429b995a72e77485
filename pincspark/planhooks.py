"""Staged-plan capture: make plan audits see through ``localCheckpoint``.

``localCheckpoint`` (the lineage-truncation idiom every iterative/staged
operator here uses — dedup CC, BPE, PageRank, the q54 pipeline stages)
replaces the upstream plan with a ``Scan ExistingRDD`` leaf, so any audit of
the FINAL DataFrame (``scripts/plan_audit.py``, the ``tests/test_plans.py``
hard invariants) is blind to exactly the per-iteration joins where scale
bugs live — VERDICT r10 "What's wrong" #2: q90's per-iteration edge shuffle
survived the "no wasted shuffle" audit because PLANS.md showed q90 as
0 exchanges / 0 scans.

The fix is a zero-cost-when-off hook: operators call
``record_staged_plan(df, label)`` immediately BEFORE each
``localCheckpoint``; when a capture is active (``capture_staged_plans()``),
the pre-checkpoint physical plan string is appended to the active sink.
Capturing forces Catalyst planning (not execution) of the pre-checkpoint
plan — cheap, and identical to what the final action would have planned.

This module deliberately lives outside ``pincspark.plans`` (whose
``__init__`` imports the query catalog, which imports the operators —
importing lint from an operator would cycle).
"""

from __future__ import annotations

import contextlib
import contextvars

from pyspark.sql import DataFrame

_STAGED_SINK: contextvars.ContextVar[list | None] = contextvars.ContextVar(
    "pincspark_staged_plan_sink", default=None
)


def record_staged_plan(df: DataFrame, label: str) -> DataFrame:
    """Append ``(label, physical-plan-string)`` of ``df`` to the active
    capture sink, if any. No-op (and no planning cost) when no capture is
    active. Returns ``df`` so call sites can wrap inline:

        staged = record_staged_plan(frame, "q90:iter").localCheckpoint()
    """
    sink = _STAGED_SINK.get()
    if sink is not None:
        sink.append((label, df._jdf.queryExecution().executedPlan().toString()))
    return df


@contextlib.contextmanager
def capture_staged_plans():
    """Context manager: activate staged-plan capture and yield the sink, a
    list of ``(label, plan_string)`` tuples in call order."""
    sink: list[tuple[str, str]] = []
    token = _STAGED_SINK.set(sink)
    try:
        yield sink
    finally:
        _STAGED_SINK.reset(token)
