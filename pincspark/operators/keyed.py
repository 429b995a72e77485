"""Per-key windowed operators: latest-row-per-key (W2), validity-interval
construction via lead (W1), and gap-based sessionization (ST1 batch analog).

Reference parity:
- W2 latest-per-key: the IVEF upsert keeps the most recent track state per
  ``Id`` (ais_ivef.py:286-312) — batch equivalent is row_number()==1 over
  ``partitionBy(key).orderBy(desc(ts))``.
- W1 lead intervals: next static-report ts per mmsi, fillna with own ts
  (ais_analysis.py:445-453, declared-intent window logic).
- ST1 sessionization: multi-part message grouping (ais_ingressServer.py:84-106)
  generalized to time-gap sessions.

All three are single-shuffle window operators: they scale by partitioning on
the key, the dominant cost at 100 TB is one exchange + in-partition sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    keys: str | Sequence[str],
    order_by: Sequence = (),
) -> DataFrame:
    """Keep exactly one row per key: the greatest under ``order_by``.

    ``order_by`` entries are Column objects or names; pass explicit
    tie-breakers to make the result deterministic.
    """
    key_cols = [keys] if isinstance(keys, str) else list(keys)
    cols = [F.col(c).desc() if isinstance(c, str) else c for c in order_by]
    w = Window.partitionBy(*key_cols).orderBy(*cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def validity_intervals(
    df: DataFrame,
    key: str | Sequence[str],
    ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Attach [valid_from, valid_to) per key: valid_to = next row's ts, or the
    row's own ts for the last row (the reference's fillna-with-own-ts
    semantics, ais_analysis.py:447-449)."""
    key_cols = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts).asc())
    return df.withColumn(valid_from, F.col(ts)).withColumn(
        valid_to, F.coalesce(F.lead(ts).over(w), F.col(ts))
    )


def sessionize(
    df: DataFrame,
    key: str | Sequence[str],
    ts: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign gap-based session ids per key: a new session starts when the
    time since the previous event exceeds ``gap_seconds``. Session ids are
    0-based per key (cumulative sum of boundary flags over one keyed
    window — single shuffle)."""
    key_cols = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts).asc())
    # Microsecond integer arithmetic: exact and portable (fractional-second
    # epoch floats are not).
    gap = F.unix_micros(F.col(ts)) - F.unix_micros(F.lag(ts).over(w))
    boundary = (
        F.when(gap.isNull() | (gap <= F.lit(gap_seconds * 1_000_000)), F.lit(0))
        .otherwise(F.lit(1))
    )
    return df.withColumn(
        session_col,
        F.sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
