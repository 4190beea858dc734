"""Streaming-surface operators exercised on their batch path, so the
DuckDB oracle can verify the window/compaction SEMANTICS. The
streaming execution of the same plans (state, watermarks, microbatch)
is covered by tests/test_streaming.py (rows-only by nature).

Window-start timestamps are emitted as epoch seconds (long) on both
sides — sidestepping DuckDB TIMESTAMPTZ vs Spark session-TZ drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hw_kafka_streams_spark.queries import register
from hw_kafka_streams_spark.sources.catalog import load_table
from hw_kafka_streams_spark.streaming import serde, windows


@register(
    "q_stream_tumbling",
    oracle="""
        SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS win_start_s,
               user_id, count(*) AS n_events,
               round(sum("value"), 2) AS sum_value
        FROM events WHERE user_id <= 100
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="Tumbling 5-minute window agg (F.window) — the watermarked "
    "streaming agg's exact batch semantics. One shuffle on (window,key); "
    "partial agg map-side.",
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir).filter(F.col("user_id") <= 100)
    out = windows.tumbling_counts(
        e,
        ts_col="ts",
        key_col="user_id",
        window="5 minutes",
        aggs=[
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        ],
    )
    return out.select(
        F.col("win_start").cast("long").alias("win_start_s"),
        "user_id",
        "n_events",
        "sum_value",
    ).orderBy("win_start_s", "user_id")


@register(
    "q_stream_sliding",
    oracle="""
        WITH e AS (
          SELECT user_id, CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS b
          FROM events WHERE user_id <= 100
        ), assigned AS (
          SELECT user_id, b AS win_start_s FROM e
          UNION ALL
          SELECT user_id, b - 300 AS win_start_s FROM e
        )
        SELECT win_start_s, user_id, count(*) AS n_events
        FROM assigned GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="Sliding window (10 min / 5 min slide): each event lands in 2 "
    "overlapping windows. Oracle assigns both window-starts explicitly.",
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir).filter(F.col("user_id") <= 100)
    out = windows.sliding_counts(
        e, ts_col="ts", key_col="user_id", window="10 minutes", slide="5 minutes"
    )
    return out.select(
        F.col("win_start").cast("long").alias("win_start_s"), "user_id", "n_events"
    ).orderBy("win_start_s", "user_id")


@register(
    "q_stream_session",
    oracle="""
        WITH gaps AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR date_diff('second', lag(ts) OVER w, ts) >= 600
                      THEN 1 ELSE 0 END AS new_session
          FROM events WHERE user_id <= 50
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), sess AS (
          SELECT user_id, ts,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING) AS sid
          FROM gaps
        )
        SELECT user_id,
               CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start_s,
               CAST(floor(epoch(max(ts))) + 600 AS BIGINT) AS session_end_s,
               count(*) AS n_events
        FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start_s
    """,
    doc="F.session_window (10-min gap) vs gaps-and-islands oracle. "
    "Session end = last event + gap, per session_window semantics.",
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir).filter(F.col("user_id") <= 50)
    out = windows.session_windows(e, ts_col="ts", key_col="user_id", gap="10 minutes")
    return out.select(
        "user_id",
        F.col("session_start").cast("long").alias("session_start_s"),
        F.col("session_end").cast("long").alias("session_end_s"),
        "n_events",
    ).orderBy("user_id", "session_start_s")


@register(
    "q_changelog_compact",
    oracle="""
        SELECT user_id AS key,
               arg_max(event_type, event_id) AS event_type,
               max(event_id) AS last_event_id
        FROM events WHERE user_id <= 200
        GROUP BY user_id ORDER BY key
    """,
    doc="GlobalKTable materialization semantics (latest value per key) "
    "over a changelog — max_by aggregate, one shuffle, no window sort.",
)
def q_changelog_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("user_id") <= 200)
        .select(F.col("user_id").alias("key"), "event_type", "event_id")
    )
    out = serde.latest_per_key(e, key_col="key", order_col="event_id")
    return out.select(
        "key",
        "event_type",
        F.col("event_id").alias("last_event_id"),
    ).orderBy("key")


@register(
    "q_cdc_apply",
    oracle="""
        WITH latest AS (
            SELECT user_id AS key,
                   arg_max(event_type, event_id) AS last_op,
                   arg_max(value, event_id) AS value,
                   max(event_id) AS last_event_id
            FROM events WHERE user_id <= 200
            GROUP BY user_id
        )
        SELECT key, last_op,
               CAST(round(value, 6) AS VARCHAR) AS value,
               last_event_id
        FROM latest WHERE last_op <> 'error'
        ORDER BY key
    """,
    doc="CDC changelog apply with tombstones: latest record per key "
    "wins (arg_max on the monotone changelog offset), and a key whose "
    "latest op is a tombstone ('error' here) is DELETED from the "
    "materialized state — Kafka compacted-topic / GlobalKTable "
    "null-value semantics (KafkaStreamApp.java:140-152 keeps global "
    "stores current the same way). One shuffle on the key, no window "
    "sort; the tombstone filter runs AFTER the argmax so a delete "
    "followed by re-insert correctly resurrects the key.",
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("user_id") <= 200)
        .select(F.col("user_id").alias("key"), "event_type", "value", "event_id")
    )
    latest = e.groupBy("key").agg(
        F.max_by("event_type", "event_id").alias("last_op"),
        F.max_by("value", "event_id").alias("value"),
        F.max("event_id").alias("last_event_id"),
    )
    return (
        latest.filter(F.col("last_op") != "error")
        .select(
            "key",
            "last_op",
            F.round("value", 6).cast("string").alias("value"),
            "last_event_id",
        )
        .orderBy("key")
    )


@register(
    "q_watermark_audit",
    oracle="""
        WITH e AS (
          SELECT event_id, event_type, epoch(ts) AS t
          FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        ),
        scored AS (
          SELECT event_type, t,
                 max(t) OVER (ORDER BY event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS hwm
          FROM e
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN hwm - t > 600 THEN 1 ELSE 0 END)
                    AS BIGINT) AS late_10m,
               CAST(sum(CASE WHEN hwm - t > 3600 THEN 1 ELSE 0 END)
                    AS BIGINT) AS late_1h,
               CAST(max(CASE WHEN hwm > t THEN hwm - t ELSE 0 END)
                    AS BIGINT) AS max_disorder_s
        FROM scored GROUP BY event_type ORDER BY event_type
    """,
    doc="Watermark audit: for every event, the high-water mark of "
    "event time over STRICTLY EARLIER ARRIVALS (arrival order = "
    "event_id) - exactly Structured Streaming's watermark state - "
    "then per-type counts of rows a 10-minute / 1-hour watermark "
    "would drop as too-late, plus the max observed disorder. THE "
    "tuning query for `withWatermark` delays at 100 TB/day: run it "
    "on a day of history, read off the late-drop curve. The global "
    "running max never becomes a single-partition window: arrival "
    "ids bucket into blocks (monotone with the order), per-block "
    "maxes form a tiny broadcast table whose exclusive prefix-max "
    "seeds each block, and the within-block running max is a "
    "parallel keyed window (the q_window_rank block-prefix "
    "pattern, here with MAX instead of SUM).",
)
def q_watermark_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from hw_kafka_streams_spark.operators.winutil import tiny_table_partition

    e = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .select(
            "event_id",
            "event_type",
            F.unix_timestamp("ts").alias("t"),
            (F.col("event_id") / 10000).cast("long").alias("blk"),
        )
    )
    bmax = e.groupBy("blk").agg(F.max("t").alias("bm"))
    w_blk = (
        Window.partitionBy(tiny_table_partition("blk"))
        .orderBy("blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bprev = bmax.select("blk", F.max("bm").over(w_blk).alias("blk_prev"))
    w_in = (
        Window.partitionBy("blk")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored = e.join(F.broadcast(bprev), "blk").select(
        "event_type",
        "t",
        F.greatest(F.max("t").over(w_in), F.col("blk_prev")).alias("hwm"),
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(
                F.when(F.col("hwm") - F.col("t") > 600, 1).otherwise(0)
            )
            .cast("long")
            .alias("late_10m"),
            F.sum(
                F.when(F.col("hwm") - F.col("t") > 3600, 1).otherwise(0)
            )
            .cast("long")
            .alias("late_1h"),
            F.max(
                F.when(
                    F.col("hwm") > F.col("t"), F.col("hwm") - F.col("t")
                ).otherwise(0)
            )
            .cast("long")
            .alias("max_disorder_s"),
        )
        .orderBy("event_type")
    )
