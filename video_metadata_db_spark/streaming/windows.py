"""Windowed event-time transformations, batch/stream polymorphic.

Each function takes the ``events`` DataFrame (batch OR streaming — the
unified API is the point of Structured Streaming) and returns an
aggregated DataFrame.  Batch runs are oracle-checked against DuckDB
(plans/streaming_queries.py); stream runs are covered by
tests/test_streaming.py with file sources + AvailableNow triggers.

Scale notes: event-time windowed aggregation shuffles on (window, key)
— at 100 TB the state store (RocksDB in prod) holds one entry per open
window×key, bounded by the watermark, so the delay budget directly
sizes state.  Session windows additionally merge adjacent state
entries; their key space is (user, session), bounded by gap × event
rate per user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TUMBLE = "10 minutes"
SLIDE_WINDOW = "10 minutes"
SLIDE_STEP = "5 minutes"
SESSION_GAP = "30 minutes"


def tumbling_counts(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """Per-(10-minute tumbling window, event_type) count + mean value."""
    if watermark:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", TUMBLE).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.avg("value").alias("avg_value"))
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n_events",
            F.round("avg_value", 6).alias("avg_value"),
        )
    )


def sliding_avg(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """10-minute windows sliding every 5 — each event lands in exactly
    two windows (window % slide == 0, so no partial-window edge cases)."""
    if watermark:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", SLIDE_WINDOW, SLIDE_STEP).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.avg("value").alias("avg_value"))
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n_events",
            F.round("avg_value", 6).alias("avg_value"),
        )
    )


def session_stats(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """Per-user sessions: a new session starts when the gap since the
    previous event is >= 30 minutes (Spark session windows are
    half-open — an event exactly at the previous window's end opens a
    new one).  Output start = first event ts, plus count and value sum.
    """
    if watermark:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.session_window("ts", SESSION_GAP).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            F.round("sum_value", 6).alias("sum_value"),
        )
    )


def stream_dedup(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """Stateful exact dedup on event_id — the streaming analogue of the
    reference's update-mode membership check (video_metadata_db.py:
    427-452): rows whose key was already seen are dropped, state is
    bounded by the watermark."""
    if watermark:
        events = events.withWatermark("ts", watermark)
        return events.dropDuplicatesWithinWatermark(["event_id"])
    return events.dropDuplicates(["event_id"])


def chained_daily_peak(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """WINDOW-ON-WINDOW (Spark 3.4+ chained time-window aggregation):
    hourly event counts re-aggregated into per-day peak/total — the
    "max QPS per day" dashboard query, end-to-end streaming.  The
    second groupBy windows over ``window_time(w)`` (the first window's
    event-time column), which is what makes chaining legal in append
    mode: each closed hourly window carries its own event time, so the
    daily window has a watermark to close against.

    State: hours × event_types entries in the first operator, days ×
    event_types in the second — both bounded by the watermark delay,
    independent of row count."""
    if watermark:
        events = events.withWatermark("ts", watermark)
    hourly = events.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return (
        hourly.groupBy(
            F.window(F.window_time("w"), "1 day").alias("d"), "event_type"
        )
        .agg(
            F.max("n_events").alias("peak_hourly_events"),
            F.sum("n_events").alias("n_events_day"),
            F.count(F.lit(1)).alias("n_active_hours"),
        )
        .select(
            F.col("d.start").alias("day_start"),
            "event_type",
            "peak_hourly_events",
            F.col("n_events_day").cast("long").alias("n_events_day"),
            F.col("n_active_hours").cast("long").alias("n_active_hours"),
        )
    )
