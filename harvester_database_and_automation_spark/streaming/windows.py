"""Watermarked event-time windowed aggregation.

The reference handles late/dirty data by full-file reprocessing
(SURVEY.md §2.11); at 100TB-stream scale the Spark-native answer is an
event-time window plus a watermark bounding state. This is the building
block for the weekly counting queries (gisaid.sql:47-87) run continuously.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
    value_col: str | None = "value",
) -> DataFrame:
    """Counts (and, when ``value_col`` names a column, value sums) per
    (event-time window, key), tolerating late arrivals up to
    ``watermark``. Works on both a streaming and a batch DataFrame (batch
    ignores the watermark) — handy for oracle testing."""
    df = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("total_value"))
    return (
        df.groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(*aggs)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
            *(["total_value"] if value_col is not None else []),
        )
    )


def session_windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    value_col: str | None = "value",
) -> DataFrame:
    """Gap-based session windows per key (``F.session_window``): a session
    closes after ``gap`` of inactivity, and the watermark lets the engine
    finalize and evict closed sessions — the streaming twin of the batch
    ``event_sessionization`` query (lag + cumulative-sum). Works on both a
    streaming and a batch DataFrame."""
    df = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("total_value"))
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("win"), F.col(key_col))
        .agg(*aggs)
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            key_col,
            "n_events",
            *(["total_value"] if value_col is not None else []),
        )
    )
