"""Sessionization — gap-based session windows over an event stream.

The classic training-data-pipeline operator the reference lacks
(GDS has no streaming/time semantics — SURVEY.md §2.4): split each
user's event sequence into sessions wherever the inter-event gap
exceeds ``gap``; aggregate per-session stats.

Batch plan: one window (lag + running sum of gap-breaks) keyed by
user_id — a single skew-free shuffle; the session aggregate reuses
the same partitioning, so AQE plans it without a second exchange.
The same logic runs incrementally under Structured Streaming via
``F.session_window`` (see streaming notes in SURVEY.md §2.4) — the
batch form here is the deterministic, oracle-checkable core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str | None = "event_id",
) -> DataFrame:
    """Events + (session_idx) — 0-based per-user session number.

    A new session starts when the gap to the previous event is
    strictly greater than ``gap_seconds``. ``tiebreak_col`` breaks
    equal-timestamp ordering deterministically; it is ignored when
    absent from the input (ordering then falls back to ``ts_col``
    alone).
    """
    order = [ts_col]
    if tiebreak_col and tiebreak_col in events.columns:
        order.append(tiebreak_col)
    w = Window.partitionBy(user_col).orderBy(*order)
    gap = F.unix_micros(F.col(ts_col).cast("timestamp")) - F.unix_micros(F.lag(ts_col).over(w).cast("timestamp"))
    is_break = F.when(
        gap.isNull() | (gap <= gap_seconds * 1_000_000), F.lit(0)
    ).otherwise(F.lit(1))
    return events.withColumn(
        "session_idx",
        F.sum(is_break).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(user_id, session_idx, n_events, duration_sec, total_value)."""
    s = sessionize(events, gap_seconds, user_col, ts_col)
    return s.groupBy(user_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            (F.unix_micros(F.max(ts_col).cast("timestamp")) - F.unix_micros(F.min(ts_col).cast("timestamp")))
            / F.lit(1_000_000.0),
            6,
        ).alias("duration_sec"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )
