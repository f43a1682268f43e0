"""Structured Streaming forms of the pipeline operators.

The reference has NO streaming surface (SURVEY §2.4 — "streaming" in
GDS is lazy result iteration), so these are engine extensions for the
operational reality of the transcript corpus: the events table IS an
unbounded stream at 10^12-turn scale, and the batch operators in
pipeline/sessions.py and sources/events.py need incremental
counterparts. Each transformation below accepts either a batch or a
streaming DataFrame (tests pin batch/stream equivalence by running
the same input through both with trigger(availableNow)):

* session stats — gap-based sessions via ``F.session_window`` +
  watermark (late events beyond the watermark are dropped instead of
  reopening old sessions — the documented streaming trade-off).
* windowed edge counts — per-rel-type edge rates over tumbling
  windows, the streaming health metric for the graph projection.
* turn counter — ``applyInPandasWithState``: per-user running turn
  index, the incremental form of sources.events.event_turns (state =
  next turn_idx per user; Arrow-batched, no per-row Python).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def streaming_session_stats(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(user_id, session_start, n_events, duration_sec, total_value).

    Streaming analog of pipeline.sessions.session_stats: sessions
    close ``gap_seconds`` after their last event (session_window
    merge semantics; a gap of EXACTLY gap_seconds splits here but not
    in the batch operator — microsecond-resolution inputs never hit
    the boundary). Duration comes from min/max event time, not the
    (gap-padded) window bounds.
    """
    ts = F.col(ts_col).cast("timestamp")
    src = events.withColumn("_ts", ts)
    if src.isStreaming:
        src = src.withWatermark("_ts", watermark)
    return (
        src.groupBy(
            F.col(user_col),
            F.session_window("_ts", f"{gap_seconds} seconds").alias("_w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                (F.unix_micros(F.max("_ts")) - F.unix_micros(F.min("_ts")))
                / F.lit(1_000_000.0),
                6,
            ).alias("duration_sec"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            user_col,
            F.col("_w.start").alias("session_start"),
            "n_events",
            "duration_sec",
            "total_value",
        )
    )


def streaming_edge_counts(
    edges: DataFrame,
    ts_col: str = "ts",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """(window_start, rel_type, n_edges) — tumbling-window edge rates."""
    src = edges.withColumn("_ts", F.col(ts_col).cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark("_ts", watermark)
    return (
        src.groupBy(F.window("_ts", window).alias("_w"), "rel_type")
        .agg(F.count(F.lit(1)).alias("n_edges"))
        .select(F.col("_w.start").alias("window_start"), "rel_type", "n_edges")
    )


_TURN_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("turn_idx", IntegerType()),
    ]
)
_TURN_STATE = StructType([StructField("next_idx", IntegerType())])


def _turn_counter_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    start = state.get[0] if state.exists else 0
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        idx = pd.RangeIndex(start, start + len(pdf))
        start += len(pdf)
        yield pd.DataFrame(
            {
                "user_id": pdf["user_id"].astype("int64"),
                "event_id": pdf["event_id"].astype("int64"),
                "ts": pdf["ts"],
                "turn_idx": idx.astype("int32"),
            }
        )
    state.update((start,))


def streaming_turn_counter(events: DataFrame) -> DataFrame:
    """(user_id, event_id, ts, turn_idx) — per-user running turn
    index via ``applyInPandasWithState`` (incremental
    sources.events.event_turns; within a micro-batch events sort by
    (ts, event_id), across batches the per-user counter persists in
    the state store). Equals the batch turn_idx whenever events
    arrive in event-time order across micro-batches.
    """
    return (
        events.select("user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _turn_counter_fn,
            outputStructType=_TURN_OUT,
            stateStructType=_TURN_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Incremental exact dedup for a document STREAM: keep the first
    arrival of each distinct text (by md5), drop later copies.

    Uses ``dropDuplicatesWithinWatermark`` so the dedup state is
    bounded: two copies of a text are deduped when they arrive within
    the watermark of each other, and state for hashes older than the
    watermark is evicted — the only semantics with finite state on an
    unbounded corpus (the batch operator `dedup.exact_duplicates`
    stays the exact-global form). Works on batch DataFrames too
    (falls back to plain dropDuplicates semantics with the same
    column set).
    """
    src = docs.withColumn("_h", F.md5(F.col(text_col)))
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
        return src.dropDuplicatesWithinWatermark(["_h"]).drop("_h")
    return src.dropDuplicates(["_h"]).drop("_h")
