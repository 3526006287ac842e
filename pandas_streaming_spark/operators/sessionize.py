"""Per-event session labeling (SURVEY.md §2.5 session family — the
feature-engineering form of sessionization: q45 aggregates sessions,
this labels every event with its session index).

Semantics match the session-window contract pinned by
tests/test_session_property.py: a gap STRICTLY greater than ``gap``
between consecutive events of one key starts a new session (the first
event always does) — a gap of exactly ``gap`` merges, because Spark's
``session_window`` coalesces touching windows ([t, t+gap) and an event
at t+gap form one session).

Plan: one window over (key, time-ordered events) — lag for the gap flag,
running sum for the label; a single hash shuffle on the key, the same
cost as any per-key ordered pass. The label is deterministic because the
order includes the unique ``ord_col`` tiebreaker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    key_col: str = "user_id",
    ts_col: str = "ts",
    ord_col: str = "event_id",
) -> DataFrame:
    """Append ``session_idx`` (1-based per key, in time order) to every
    event row."""
    w = Window.partitionBy(key_col).orderBy(ts_col, ord_col)
    prev = F.lag(ts_col).over(w)
    # unix_micros rejects TIMESTAMP_NTZ; the session timezone is pinned
    # to UTC (session.py), so the cast is a pure type adjustment.
    gap_us = F.unix_micros(F.col(ts_col).cast("timestamp")) - F.unix_micros(
        prev.cast("timestamp")
    )
    flag = F.when(
        prev.isNull() | (gap_us > gap_minutes * 60 * 1_000_000), 1
    ).otherwise(0)
    run = Window.partitionBy(key_col).orderBy(ts_col, ord_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn(
        "session_idx", F.sum(flag).over(run).cast("long")
    )
