"""Window functions: ranking, analytic (lag/lead), frames, sessionization,
and the as-of join pattern (Spark has no native as-of — composed from an
equi-join + ranked window, which scales as a hash join + one shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hw_kafka_streams_spark.operators.winutil import tiny_table_partition
from hw_kafka_streams_spark.queries import register
from hw_kafka_streams_spark.sources.catalog import load_table


@register(
    "q_window_rank",
    oracle="""
        SELECT s_suppkey, s_name, s_nationkey,
               round(s_acctbal, 2) AS s_acctbal,
               row_number() OVER w AS rn,
               rank()       OVER w AS rnk,
               dense_rank() OVER w AS drnk,
               CAST(ntile(4) OVER (ORDER BY s_acctbal DESC, s_suppkey) AS INT) AS quartile
        FROM supplier
        WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
        ORDER BY s_suppkey
    """,
    doc="Ranking window battery: row_number / rank / dense_rank / ntile.",
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, "supplier", sf_dir)
    w = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))

    # The quartile is SQL ntile(4) over the GLOBAL ordering
    # (s_acctbal DESC, s_suppkey) — but a global window would move the
    # whole table into one partition.  Instead: block-prefix-sum (the
    # rank_auc / sequence_pack pattern).  Blocks = floor(s_acctbal)
    # (monotone with the sort key, so blocks ordered DESC nest the
    # global order); per-block row counts form a tiny table whose
    # running sum is the only "global" window (rows = #distinct
    # integer balances, driver-bounded); the global rank of a row is
    # its block offset + its rank within the block [windows
    # partitioned by block — parallel].  ntile(k) then has a closed
    # form in (rank, N): the first N%k buckets take ceil(N/k) rows.
    # NULL balances (never in TPC-H, but don't rely on it) get a
    # sentinel block below all real floors, matching DESC NULLS LAST
    sb = s.withColumn(
        "blk", F.coalesce(F.floor("s_acctbal"), F.lit(-(1 << 62)))
    )
    w_in_blk = Window.partitionBy("blk").orderBy(
        F.desc("s_acctbal"), F.asc("s_suppkey")
    )
    bcounts = sb.groupBy("blk").agg(F.count(F.lit(1)).alias("bc"))
    # tiny block table: intentionally single-partition (see winutil)
    w_blk = (
        Window.partitionBy(tiny_table_partition("blk"))
        .orderBy(F.desc("blk"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boff = bcounts.select(
        "blk", F.coalesce(F.sum("bc").over(w_blk), F.lit(0)).alias("blk_off")
    )
    total = bcounts.agg(F.sum("bc").alias("n_total"))

    grn = F.col("blk_off") + F.row_number().over(w_in_blk)
    ranked = (
        sb.join(F.broadcast(boff), "blk")
        .withColumn("grn", grn)
        .crossJoin(F.broadcast(total))
    )
    # ntile(4): q = N div 4 rows per bucket, first r = N mod 4 buckets
    # take one extra row.  greatest(q,1) guards the (never-taken at
    # N>=4) divide; all ranks <= r*(q+1) fall in the "big" buckets.
    qsz = F.floor(F.col("n_total") / 4)
    rem = F.col("n_total") % 4
    cut = rem * (qsz + 1)
    quartile = F.when(
        F.col("grn") <= cut, F.floor((F.col("grn") - 1) / (qsz + 1)) + 1
    ).otherwise(
        rem + F.floor((F.col("grn") - cut - 1) / F.greatest(qsz, F.lit(1))) + 1
    )

    return ranked.select(
        "s_suppkey",
        "s_name",
        "s_nationkey",
        F.round("s_acctbal", 2).alias("s_acctbal"),
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        quartile.cast("int").alias("quartile"),
    ).orderBy("s_suppkey")


@register(
    "q_window_running",
    oracle="""
        SELECT o_custkey, o_orderkey, o_orderdate,
               round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                             ORDER BY o_orderdate, o_orderkey
                                             ROWS BETWEEN UNBOUNDED PRECEDING
                                                      AND CURRENT ROW), 2)  AS running_total,
               round(avg(o_totalprice) OVER (PARTITION BY o_custkey
                                             ORDER BY o_orderdate, o_orderkey
                                             ROWS BETWEEN 2 PRECEDING
                                                      AND CURRENT ROW) + 0.000001, 2)
                                                                            AS moving_avg3
        FROM orders
        WHERE o_custkey <= 100
        ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
    doc="Frame-based analytics: running total + 3-row moving average.",
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_custkey") <= 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).alias(
            "running_total"
        ),
        # +1e-6 nudges cents/2 and cents/3 off the exact .005 rounding
        # boundary, where Spark's sliding-frame accumulator and a full
        # recompute (DuckDB) differ by ulps and would flip the cent.
        F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)) + 0.000001, 2).alias(
            "moving_avg3"
        ),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


@register(
    "q_window_lag_lead",
    oracle="""
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(date_diff('day',
                    lag(o_orderdate) OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderdate, o_orderkey),
                    o_orderdate) AS INT)                                  AS days_since_prev,
               lead(o_orderkey) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey)   AS next_orderkey,
               first_value(o_orderkey) OVER (PARTITION BY o_custkey
                                             ORDER BY o_orderdate, o_orderkey) AS first_orderkey
        FROM orders
        WHERE o_custkey <= 100
        ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
    doc="lag/lead/first_value analytics (inter-order gaps per customer).",
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_custkey") <= 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("days_since_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.first("o_orderkey").over(w).alias("first_orderkey"),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


@register(
    "q_session_funnel",
    oracle="""
        WITH gaps AS (
          SELECT user_id, ts, event_id, event_type,
                 CASE WHEN date_diff('second',
                        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                        ts) > 1800
                      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events WHERE user_id <= 50
        ), sess AS (
          SELECT user_id, ts, event_id, event_type,
                 sum(new_session) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS session_id
          FROM gaps
        ), per AS (
          SELECT user_id, session_id,
                 min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                 min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                 min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
          FROM sess GROUP BY user_id, session_id
        )
        SELECT count(*) AS n_sessions,
               CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_view,
               CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
               CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                              AND t_purchase > t_click
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
        FROM per
    """,
    doc="SESSION-scoped conversion funnel: view → click → purchase "
    "strictly ordered WITHIN one 30-min session — attribution the "
    "user-lifetime funnel (q_event_funnel) can't express (a purchase "
    "in a later session no longer converts the earlier view). "
    "Sessionize (lag gap → running-sum id) feeds one conditional-min "
    "agg per stage and a single global roll-up; the user_id shuffle is "
    "reused by the window and the session agg — no self-joins, no "
    "extra exchanges over plain sessionization.",
)
def q_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir).filter(F.col("user_id") <= 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_session = (
        prev_ts.isNull()
        | (F.col("ts").cast("long") - prev_ts.cast("long") > 1800)
    ).cast("long")
    sess = e.select("user_id", "ts", "event_id", "event_type").withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )

    def stage_min(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    per = sess.groupBy("user_id", "session_id").agg(
        stage_min("view").alias("t_view"),
        stage_min("click").alias("t_click"),
        stage_min("purchase").alias("t_purchase"),
    )
    saw_view = F.col("t_view").isNotNull()
    clicked = saw_view & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return per.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(saw_view.cast("long")).alias("n_view"),
        F.sum(clicked.cast("long")).alias("n_view_click"),
        F.sum(purchased.cast("long")).alias("n_full_funnel"),
    )


@register(
    "q_sessionize",
    oracle="""
        WITH gaps AS (
          SELECT user_id, ts,
                 CASE WHEN date_diff('second',
                        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                        ts) > 1800
                      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      THEN 1 ELSE 0 END AS new_session,
                 event_id
          FROM events WHERE user_id <= 50
        ), sessions AS (
          SELECT user_id, ts, event_id,
                 sum(new_session) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS session_id
          FROM gaps
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               count(*) AS n_events,
               CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS duration_s
        FROM sessions
        GROUP BY user_id, session_id
        ORDER BY user_id, session_id
    """,
    doc="Batch sessionization (30-min gap): lag → gap flag → cumulative sum "
    "session id → per-session agg. One shuffle on user_id reused by both "
    "the window and the final agg.",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir).filter(F.col("user_id") <= 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_session = (
        prev_ts.isNull()
        | (F.col("ts").cast("long") - prev_ts.cast("long") > 1800)
    ).cast("long")
    sessions = e.select("user_id", "ts", "event_id").withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias(
                "duration_s"
            ),
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "q_asof_join",
    oracle="""
        SELECT event_id, user_id, ts, o_orderkey AS last_orderkey
        FROM (
          SELECT e.event_id, e.user_id, e.ts, o.o_orderkey,
                 row_number() OVER (PARTITION BY e.event_id
                                    ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
          FROM events e JOIN orders o
            ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
          WHERE e.event_id <= 500
        )
        WHERE rn = 1
        ORDER BY event_id
    """,
    doc="As-of join (latest order at-or-before each event): equi-join on the "
    "entity key + ranked window, the scalable composition Spark lacks a "
    "native operator for (SURVEY §7 risk b).",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir).filter(F.col("event_id") <= 500)
    o = load_table(spark, "orders", sf_dir)
    joined = e.join(
        o, (o.o_custkey == e.user_id) & (o.o_orderdate <= e.ts), "inner"
    )
    w = Window.partitionBy("event_id").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "ts", F.col("o_orderkey").alias("last_orderkey"))
        .orderBy("event_id")
    )


@register(
    "q_window_share",
    oracle="""
        SELECT n_name,
               round(nation_rev, 2) AS nation_rev,
               round(nation_rev / sum(nation_rev) OVER (), 6) AS rev_share
        FROM (
          SELECT n_name, sum(o_totalprice) AS nation_rev
          FROM nation
            JOIN customer ON c_nationkey = n_nationkey
            JOIN orders   ON o_custkey = c_custkey
          GROUP BY n_name
        )
        ORDER BY n_name
    """,
    doc="Share-of-total via empty-frame window over an aggregated input.",
)
def q_window_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, "nation", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    per_nation = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum("o_totalprice").alias("nation_rev"))
    )
    # 25-row aggregate (one per nation): intentionally single-partition
    # (see winutil)
    w = Window.partitionBy(tiny_table_partition("n_name"))
    return per_nation.select(
        "n_name",
        F.round("nation_rev", 2).alias("nation_rev"),
        F.round(F.col("nation_rev") / F.sum("nation_rev").over(w), 6).alias("rev_share"),
    ).orderBy("n_name")


@register(
    "q_window_distribution",
    oracle="""
        SELECT s_suppkey,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume,
               round(first_value(s_acctbal) OVER w, 2) AS min_bal,
               round(nth_value(s_acctbal, 2) OVER w, 2) AS second_bal
        FROM supplier
        WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY s_suppkey
    """,
    doc="Distribution window battery: percent_rank / cume_dist / "
    "first_value / nth_value over an unbounded frame.",
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, "supplier", sf_dir)
    # rank functions need the default growing frame; value functions get
    # the full-partition frame — same partitioning, so still one shuffle
    w_rank = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    w_full = w_rank.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return s.select(
        "s_suppkey",
        F.round(F.percent_rank().over(w_rank), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w_rank), 6).alias("cume"),
        F.round(F.first("s_acctbal").over(w_full), 2).alias("min_bal"),
        F.round(F.nth_value("s_acctbal", 2).over(w_full), 2).alias("second_bal"),
    ).orderBy("s_suppkey")


@register(
    "q_mode_per_group",
    oracle="""
        SELECT c_nationkey, c_mktsegment AS mode_segment, seg_count
        FROM (
          SELECT c_nationkey, c_mktsegment, count(*) AS seg_count,
                 row_number() OVER (PARTITION BY c_nationkey
                                    ORDER BY count(*) DESC, c_mktsegment) AS rn
          FROM customer GROUP BY c_nationkey, c_mktsegment
        )
        WHERE rn = 1 ORDER BY c_nationkey
    """,
    doc="Mode (most frequent value) per group: count-then-rank argmax "
    "pattern with a deterministic tie-break. The window partitions on "
    "the same key the aggregation grouped by, so the rank reuses the "
    "aggregation's shuffle (one exchange total).",
)
def q_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    cnt = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("seg_count")
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("seg_count"), "c_mktsegment"
    )
    return (
        cnt.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "c_nationkey",
            F.col("c_mktsegment").alias("mode_segment"),
            "seg_count",
        )
        .orderBy("c_nationkey")
    )


@register(
    "q_window_range_frame",
    oracle="""
        SELECT event_id, user_id,
               CAST(count(*) OVER w AS BIGINT) AS n_last_10m,
               round(CAST(sum(CAST(round(value, 4) AS DECIMAL(14,4))) OVER w
                          AS DOUBLE), 4) AS sum_last_10m
        FROM events
        WHERE user_id <= 100
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, event_id
    """,
    doc="Time-interval RANGE window frame: per user, rolling count/sum "
    "over the trailing 10 minutes of events — the sliding-metric shape "
    "(rate limiting, rolling spend). RANGE frames differ from ROWS: "
    "same-timestamp rows enter the frame together, so the frame is a "
    "deterministic SET and the DECIMAL-cast sum is order-proof. One "
    "shuffle on user_id; frames evaluate in one pass per partition.",
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(F.col("user_id") <= 100)
    # Exact integer microseconds on both sides (unix_micros <-> DuckDB
    # epoch_us): events carry sub-second precision, so second-floored
    # epochs would put boundary rows in different frames per engine.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-600_000_000, Window.currentRow)
    )
    dec = F.round(F.col("value"), 4).cast("decimal(14,4)")
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_last_10m"),
        F.round(F.sum(dec).over(w).cast("double"), 4).alias("sum_last_10m"),
    ).orderBy("user_id", "event_id")


@register(
    "q_window_first_last",
    oracle="""
        SELECT s_suppkey,
               first_value(s_name) OVER w AS richest,
               last_value(s_name)  OVER w AS poorest,
               nth_value(s_name, 2) OVER w AS runner_up
        FROM supplier
        WINDOW w AS (PARTITION BY s_nationkey
                     ORDER BY s_acctbal DESC, s_suppkey
                     ROWS BETWEEN UNBOUNDED PRECEDING
                              AND UNBOUNDED FOLLOWING)
        ORDER BY s_suppkey
    """,
    doc="Value-navigation window battery: first_value / last_value / "
    "nth_value over the full partition frame (deterministic tie-broken "
    "order). last_value needs the explicit UNBOUNDED FOLLOWING frame — "
    "the default frame ends at CURRENT ROW, the classic silent-wrong-"
    "answer; pinned here in both engines.",
)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, "supplier", sf_dir)
    w = (
        Window.partitionBy("s_nationkey")
        .orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return s.select(
        "s_suppkey",
        F.first("s_name").over(w).alias("richest"),
        F.last("s_name").over(w).alias("poorest"),
        F.nth_value("s_name", 2).over(w).alias("runner_up"),
    ).orderBy("s_suppkey")
