"""Sessionization over an event stream (batch formulation).

Gap-based session assignment: a new session starts when the time since
the user's previous event exceeds ``gap_seconds``.  Classic lag + running
sum of session-start markers — one shuffle on the user key, sort within
partition, no stateful driver logic.  (The streaming twin lives in
``streaming/``; this batch shape is what backfills at 100 TB.)

Portability note: epochs are floored to whole seconds (Spark's
timestamp->long cast truncates; oracles use FLOOR(epoch(ts))) so session
arithmetic is exact integer math in every engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_sessions(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 21600,
) -> DataFrame:
    """Add ``session_seq`` (1-based per user) to each event.

    Events with a NULL timestamp are dropped: they cannot be placed on
    the session timeline, and letting them through would give each one
    ``gap IS NULL`` -> its own spurious session AND shift every real
    event's ``session_seq`` for that user (nulls sort first in the
    ascending window).
    """
    epoch = F.col(ts_col).cast("long")
    w_user = Window.partitionBy(user_col).orderBy(epoch)
    gap = epoch - F.lag(epoch).over(w_user)
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return events.filter(F.col(ts_col).isNotNull()).withColumn(
        "session_seq",
        F.sum(is_new).over(w_user.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_summary(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 21600,
) -> DataFrame:
    """One row per (user, session): event count, start, duration in whole
    seconds."""
    with_sessions = assign_sessions(
        events, user_col=user_col, ts_col=ts_col, gap_seconds=gap_seconds
    )
    epoch = F.col(ts_col).cast("long")
    return with_sessions.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        (F.max(epoch) - F.min(epoch)).alias("duration_secs"),
    )
