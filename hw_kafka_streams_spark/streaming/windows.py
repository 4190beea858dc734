"""Event-time windowing, watermarks, and streaming dedup.

The reference has NO event-time semantics (SURVEY.md §1.3) — these are
engine extensions on the north-star surface, built entirely on
Structured Streaming built-ins: ``withWatermark`` + ``F.window`` /
``F.session_window`` / ``dropDuplicatesWithinWatermark``. All are
source-agnostic (batch DataFrames run the same plan, minus state).

State sizing at scale: each open window holds one aggregate row per
(key, window) in the state store; the watermark bounds state growth —
windows older than (max event time − delay) are finalized and evicted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Watermarked tumbling-window aggregation per key."""
    aggs = aggs or [F.count(F.lit(1)).alias("n_events")]
    src = df.withWatermark(ts_col, watermark) if df.isStreaming else df
    out = src.groupBy(F.window(ts_col, window).alias("win"), F.col(key_col)).agg(*aggs)
    agg_cols = [c for c in out.columns if c not in ("win", key_col)]
    return out.select(
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
        key_col,
        *agg_cols,
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked sliding-window count per key (overlapping windows)."""
    src = df.withWatermark(ts_col, watermark) if df.isStreaming else df
    return (
        src.groupBy(F.window(ts_col, window, slide).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            key_col,
            "n_events",
        )
    )


def session_windows(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge.

    Built on ``F.session_window`` (dynamic merging windows; state holds
    one open session per key, closed by the watermark).
    """
    src = df.withWatermark(ts_col, watermark) if df.isStreaming else df
    return (
        src.groupBy(F.session_window(ts_col, gap).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )


def dedup_stream(
    df: DataFrame,
    id_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup with bounded state.

    ``dropDuplicatesWithinWatermark``: duplicate ids arriving within
    the watermark window are dropped; state for an id is evicted once
    the watermark passes it — so state is O(arrival-rate × watermark),
    not O(stream length). Batch fallback: plain dropDuplicates.
    """
    if not df.isStreaming:
        return df.dropDuplicates(id_cols)
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(id_cols)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts_r",
    watermark: str = "10 minutes",
    interval_s: int = 300,
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: equi-key + event-time interval.

    Matches right rows within ``interval_s`` seconds AFTER the left row
    (left.ts <= right.ts <= left.ts + interval). Both sides buffer in
    the state store; the watermark + time bound let Spark evict state —
    without the interval condition a stream-stream join would hold
    state forever. The reference has nothing like this (its only join
    is stream⋈static); this is the engine-extension surface for
    correlating two live streams (e.g. impressions⋈clicks).

    Batch DataFrames run the identical condition (no watermark needed).
    """
    from pyspark.sql import functions as F

    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    cond = (
        (F.col(f"l.{key_col}") == F.col(f"r.{key_col}_r"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {interval_s} SECONDS")
        )
    )
    return lw.alias("l").join(
        rw.withColumnRenamed(key_col, f"{key_col}_r").alias("r"), cond, how
    )


def late_data_policy(
    df: DataFrame, ts_col: str = "ts", watermark: str = "10 minutes"
) -> DataFrame:
    """Declare the late-data policy: rows later than the watermark are
    dropped from stateful ops downstream (Spark's documented default)."""
    return df.withWatermark(ts_col, watermark) if df.isStreaming else df
