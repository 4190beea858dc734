"""Relational core queries over the TPC-H-ish test tables.

Every query is pure DataFrame API (Catalyst-optimized: pushdown,
pruning, broadcast selection) with a DuckDB oracle. Conventions for
oracle-hash stability:
- doubles rounded at the output edge, identically on both sides;
- every ORDER BY / top-k carries a unique tie-break column;
- aggregate/computed columns aliased to the same name on both sides.

Scale notes (100 TB design): fact-fact joins (orders⋈lineitem) are
shuffle hash/sort-merge on the join key — Catalyst + AQE decide;
dim joins (region/nation/supplier/part vs facts) broadcast. Filters
are expressed on scan columns so parquet pushdown applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hw_kafka_streams_spark.queries import register
from hw_kafka_streams_spark.sources.catalog import load_table


# --------------------------------------------------------------------------
# Aggregation pipeline (scan → filter → partial/final hash agg)
# --------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)                                        AS sum_qty,
               round(sum(l_extendedprice), 2)                                   AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
               round(avg(l_quantity), 4)                                        AS avg_qty,
               round(avg(l_extendedprice), 4)                                   AS avg_price,
               round(avg(l_discount), 4)                                        AS avg_disc,
               count(*)                                                         AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 style pricing summary: scan → filter → hash agg (partial+final).",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q6_revenue_delta",
    oracle="""
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
    doc="TPC-H Q6 style: tight scan filter (pushdown) → single global sum.",
)
def q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


@register(
    "q_agg_stats",
    oracle="""
        SELECT o_orderpriority,
               count(*)                              AS n_orders,
               count(DISTINCT o_custkey)             AS n_customers,
               round(min(o_totalprice), 2)           AS min_price,
               round(max(o_totalprice), 2)           AS max_price,
               round(stddev_samp(o_totalprice), 2)   AS sd_price,
               round(median(o_totalprice), 2)        AS median_price
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    doc="Aggregate function battery: count/countDistinct/min/max/stddev/median.",
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.round(F.stddev_samp("o_totalprice"), 2).alias("sd_price"),
            F.round(F.median("o_totalprice"), 2).alias("median_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q_having_conditional_agg",
    oracle="""
        SELECT c_mktsegment,
               round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2)
                   AS finished_value,
               count(CASE WHEN o_totalprice > 100000 THEN 1 END) AS n_big,
               count(*) AS n
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY c_mktsegment
        HAVING count(*) > 10
        ORDER BY c_mktsegment
    """,
    doc="Conditional aggregation (sum-case / count-if) + HAVING.",
)
def q_having_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.round(
                F.sum(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).otherwise(0.0)),
                2,
            ).alias("finished_value"),
            F.count(F.when(F.col("o_totalprice") > 100000, 1)).alias("n_big"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") > 10)
        .orderBy("c_mktsegment")
    )


@register(
    "q_rollup",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="Hierarchical subtotals via ROLLUP (multi-dim agg in one pass).",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


@register(
    "q_cube",
    oracle="""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    doc="Full cross-dimensional subtotals via CUBE.",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@register(
    "q_pivot",
    oracle="""
        SELECT l_returnflag,
               round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O,
               round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    doc="Pivot (wide conditional agg); explicit pivot values keep the plan one-pass.",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .orderBy("l_returnflag")
    )


@register(
    "q_unpivot",
    oracle="""
        SELECT c_custkey, metric, round(value, 2) AS value
        FROM (
          SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer
          UNION ALL
          SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
        )
        WHERE c_custkey <= 50
        ORDER BY c_custkey, metric
    """,
    doc="Unpivot (long form) via built-in unpivot / stack.",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    return (
        c.filter(F.col("c_custkey") <= 50)
        .select(
            "c_custkey",
            F.col("c_acctbal").alias("acctbal"),
            F.col("c_nationkey").cast("double").alias("nationkey"),
        )
        .unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "value")
        .select("c_custkey", "metric", F.round("value", 2).alias("value"))
        .orderBy("c_custkey", "metric")
    )


# --------------------------------------------------------------------------
# Joins (every type; broadcast for dims)
# --------------------------------------------------------------------------

@register(
    "q3_shipping_priority",
    oracle="""
        SELECT l_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               o_orderdate, o_orderpriority
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    doc="TPC-H Q3 style: selective dim filter → 3-way join → agg → top-10.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir).filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_supplier_volume",
    oracle="""
        SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
          JOIN orders   ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          JOIN nation   ON s_nationkey = n_nationkey
          JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H Q5 style 6-way join: facts shuffle-join on keys, dims broadcast.",
)
def q5_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "q_semi_join",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        ORDER BY c_custkey
    """,
    doc="LEFT SEMI join = EXISTS (customers with at least one finished order).",
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderstatus") == "F")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "q_anti_join",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey
    """,
    doc="LEFT ANTI join = NOT EXISTS (customers with no orders) — the same "
    "primitive that implements the reference's blocking (SURVEY §4 rewrite 1).",
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "q_outer_join",
    oracle="""
        WITH cn AS (SELECT c_nationkey AS nk, count(*) AS n_cust
                    FROM customer GROUP BY c_nationkey),
             sn AS (SELECT s_nationkey AS nk, count(*) AS n_supp
                    FROM supplier GROUP BY s_nationkey)
        SELECT coalesce(cn.nk, sn.nk) AS nationkey,
               coalesce(n_cust, 0) AS n_cust,
               coalesce(n_supp, 0) AS n_supp
        FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
        ORDER BY nationkey
    """,
    doc="FULL OUTER join of per-nation customer vs supplier counts.",
)
def q_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, "customer", sf_dir)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load_table(spark, "supplier", sf_dir)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        c.join(s, c.nk == s.nk, "full_outer")
        .select(
            F.coalesce(c.nk, s.nk).alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )


@register(
    "q_cross_join",
    oracle="""
        SELECT r.r_name AS region_a, r2.r_name AS region_b
        FROM region r CROSS JOIN region r2
        ORDER BY region_a, region_b
    """,
    doc="Cross join (tiny × tiny — broadcast nested loop).",
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, "region", sf_dir)
    r2 = r.select(F.col("r_name").alias("region_b"))
    return (
        r.select(F.col("r_name").alias("region_a"))
        .crossJoin(F.broadcast(r2))
        .orderBy("region_a", "region_b")
    )


@register(
    "q_range_join",
    oracle="""
        SELECT o_orderkey, count(*) AS n_shipped_within_90d
        FROM orders JOIN lineitem
          ON l_orderkey = o_orderkey
         AND l_shipdate >= o_orderdate
         AND l_shipdate <  o_orderdate + INTERVAL 90 DAY
        WHERE o_orderkey <= 3000
        GROUP BY o_orderkey
        ORDER BY o_orderkey
    """,
    doc="Equi+range join: equi key carries the shuffle, range is a post-filter "
    "(stays a hash join, not a nested loop — scales).",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderkey") <= 3000)
    li = load_table(spark, "lineitem", sf_dir)
    return (
        o.join(
            li,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate >= o.o_orderdate)
            & (li.l_shipdate < o.o_orderdate + F.expr("INTERVAL 90 DAY")),
        )
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n_shipped_within_90d"))
        .orderBy("o_orderkey")
    )


@register(
    "q_scalar_subquery",
    oracle="""
        SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
        FROM orders
        WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
        ORDER BY o_orderkey
    """,
    doc="Scalar subquery in a predicate (orders above 2× the mean).",
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
        FROM orders_v
        WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders_v)
        ORDER BY o_orderkey
        """
    )


# --------------------------------------------------------------------------
# Set ops / distinct / sort / top-k
# --------------------------------------------------------------------------

@register(
    "q_set_ops",
    oracle="""
        WITH cn AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
             sn AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
        SELECT 'union' AS op, nk FROM (SELECT nk FROM cn UNION SELECT nk FROM sn)
        UNION ALL
        SELECT 'intersect', nk FROM (SELECT nk FROM cn INTERSECT SELECT nk FROM sn)
        UNION ALL
        SELECT 'except', nk FROM (SELECT nk FROM cn EXCEPT SELECT nk FROM sn)
        ORDER BY op, nk
    """,
    doc="UNION / INTERSECT / EXCEPT over nation-key sets.",
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = load_table(spark, "customer", sf_dir).select(F.col("c_nationkey").alias("nk")).distinct()
    sn = load_table(spark, "supplier", sf_dir).select(F.col("s_nationkey").alias("nk")).distinct()
    u = cn.union(sn).distinct().select(F.lit("union").alias("op"), "nk")
    i = cn.intersect(sn).select(F.lit("intersect").alias("op"), "nk")
    e = cn.exceptAll(sn).select(F.lit("except").alias("op"), "nk")
    return u.unionByName(i).unionByName(e).orderBy("op", "nk")


@register(
    "q_distinct",
    oracle="""
        SELECT DISTINCT c_mktsegment, o_orderstatus
        FROM customer JOIN orders ON c_custkey = o_custkey
        ORDER BY c_mktsegment, o_orderstatus
    """,
    doc="DISTINCT over a join result (shuffle-dedup).",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .select("c_mktsegment", "o_orderstatus")
        .distinct()
        .orderBy("c_mktsegment", "o_orderstatus")
    )


@register(
    "q_sort_limit",
    oracle="""
        SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice, o_orderdate
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 25
    """,
    doc="Global top-N: TakeOrderedAndProject (no full sort at scale).",
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return (
        o.select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), "o_orderdate")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
    )


@register(
    "q_topk_per_group",
    oracle="""
        SELECT c_mktsegment, o_orderkey, round(o_totalprice, 2) AS o_totalprice
        FROM (
          SELECT c_mktsegment, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY c_mktsegment
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM customer JOIN orders ON c_custkey = o_custkey
        )
        WHERE rn <= 3
        ORDER BY c_mktsegment, o_totalprice DESC, o_orderkey
    """,
    doc="Top-K per group via ranked window (partial top-k pushed by AQE at scale).",
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
        .orderBy("c_mktsegment", F.desc("o_totalprice"), "o_orderkey")
    )


@register(
    "q_min_per_group_subquery",
    oracle="""
        SELECT s.s_suppkey, s.s_name, n.n_name, round(s.s_acctbal, 2) AS s_acctbal
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE s.s_acctbal = (SELECT min(s2.s_acctbal) FROM supplier s2
                             WHERE s2.s_nationkey = s.s_nationkey)
        ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q2 shape: correlated scalar subquery (min per group). "
    "Authored as a ranked window instead of a re-scan self-join — one "
    "shuffle on the group key, no second pass over supplier.",
)
def q_min_per_group_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    w = Window.partitionBy("s_nationkey")
    return (
        s.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "s_suppkey", "s_name", "n_name", F.round("s_acctbal", 2).alias("s_acctbal")
        )
        .orderBy("s_suppkey")
    )


@register(
    "q_having_in_subquery",
    oracle="""
        SELECT c.c_custkey, o.o_orderkey, round(o.o_totalprice, 2) AS o_totalprice,
               CAST(sum(l.l_quantity) AS DOUBLE) AS total_qty
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
          SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
          HAVING sum(l_quantity) > 150)
        GROUP BY c.c_custkey, o.o_orderkey, o.o_totalprice
        ORDER BY o_totalprice DESC, o.o_orderkey
        LIMIT 100
    """,
    doc="TPC-H Q18 shape: IN-subquery over a grouped HAVING — planned as "
    "an agg + semi join on the fact key, then the 3-way join; the "
    "orderBy+limit collapses to TakeOrdered.",
)
def q_having_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("tq"))
        .filter(F.col("tq") > 150)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(li.select("l_orderkey", "l_quantity"), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_custkey", "o_orderkey", "o_totalprice")
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
        .select(
            "c_custkey", "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"), "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@register(
    "q_right_join",
    oracle="""
        SELECT n.n_nationkey, n.n_name, c.c_custkey
        FROM customer c RIGHT JOIN nation n
          ON c.c_nationkey = n.n_nationkey AND c.c_acctbal > 9000
        ORDER BY n.n_nationkey, c.c_custkey NULLS FIRST
    """,
    doc="RIGHT OUTER join with an extra join-side predicate: nations kept "
    "even when no rich customer matches (NULL c_custkey).",
)
def q_right_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    return (
        c.join(
            n,
            (c.c_nationkey == n.n_nationkey) & (c.c_acctbal > 9000),
            "right",
        )
        .select("n_nationkey", "n_name", "c_custkey")
        .orderBy("n_nationkey", F.asc_nulls_first("c_custkey"))
    )


@register(
    "q4_order_priority",
    oracle="""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 shape (adapted: the synthetic schema has no "
    "commit/receipt dates, so 'late' = shipped >90 days after the order "
    "date): date-window filter -> EXISTS semi-join against the fact "
    "table -> priority counts. The semi-join deduplicates at the join, "
    "never materializing the multi-match blowup.",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q7_nation_volume",
    oracle="""
        SELECT supp_nation, cust_nation, l_year,
               round(sum(volume), 2) AS revenue
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(year(l_shipdate) AS INT) AS l_year,
                 l_extendedprice * (1 - l_discount) AS volume
          FROM supplier
            JOIN lineitem ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        )
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 style: bidirectional nation-pair trade volume by year. "
    "Two broadcast joins against the SAME dim (nation) under different "
    "aliases; the disjunctive pair predicate is applied post-join where "
    "Catalyst can still prune each nation side to the two named keys.",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    c = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    s = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    n1 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q10_returned_items",
    oracle="""
        SELECT c_custkey, c_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               round(c_acctbal, 2) AS c_acctbal, n_name
        FROM customer
          JOIN orders   ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
          JOIN nation   ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    doc="TPC-H Q10 style: lost-revenue ranking of customers who returned "
    "items in a quarter. Fact-fact shuffle join + broadcast dims, agg on "
    "a wide composite key, top-20 via TakeOrderedAndProject.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_returnflag") == "R")
    n = load_table(spark, "nation", sf_dir)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "c_custkey", "c_name", "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"), "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q14_promo_share",
    oracle="""
        SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
    doc="TPC-H Q14 style: promo revenue share for one month — conditional "
    "aggregation over a fact-dim join reduced to a single scalar. The "
    "date filter is pushed to the lineitem scan; part joins on its key.",
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = load_table(spark, "part", sf_dir).select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.join(p, li.l_partkey == p.p_partkey).agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
            / F.sum(rev),
            4,
        ).alias("promo_share")
    )


@register(
    "q19_disjunctive",
    oracle="""
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity >= 1 AND l_quantity <= 21)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
               AND l_quantity >= 10 AND l_quantity <= 30)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
               AND l_quantity >= 20 AND l_quantity <= 40)
    """,
    doc="TPC-H Q19 style: OR-of-ANDs predicate spanning both join sides. "
    "Catalyst factors the common p_partkey equi-condition out of the "
    "disjunction so the join stays a hash join (not a nested loop), and "
    "pushes the per-side residuals (brand/size, quantity) to each scan.",
)
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        li.join(p, (li.l_partkey == p.p_partkey) & cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "q9_profit_by_nation_year",
    oracle="""
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS INT) AS o_year,
               round(sum(l_extendedprice * (1 - l_discount)
                         - 0.5 * p_retailprice * l_quantity), 2) AS profit_proxy
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN orders   ON o_orderkey = l_orderkey
        WHERE p_name LIKE '%5%'
        GROUP BY 1, 2
        ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape: profit by supplier nation and order year over a "
    "5-way join (no partsupp table — supply cost proxied from "
    "p_retailprice). Dims broadcast; facts shuffle on orderkey; the "
    "LIKE filter prunes part before the join.",
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).filter(F.col("p_name").like("%5%"))
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.5 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("profit_proxy"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "q12_priority_by_linestatus",
    oracle="""
        SELECT l_linestatus,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_linestatus
        ORDER BY l_linestatus
    """,
    doc="TPC-H Q12 shape: priority-class line counts per linestatus "
    "(ship-mode column absent — linestatus is the grouping analog). "
    "Conditional aggregation over the orders⋈lineitem fact join.",
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    o = load_table(spark, "orders", sf_dir)
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(is_high.cast("int")).alias("high_line_count"),
            F.sum((~is_high).cast("int")).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q_skew_salted_join",
    oracle="""
        SELECT o_orderpriority,
               count(*) AS n_lines,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS VARCHAR)
                   AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="Salted skew join through the correctness gate: the fact side "
    "gets a deterministic per-row salt, the dim side is exploded "
    "x salt_factor, the join keys on (key, salt) so a hot key spreads "
    "over salt_factor reducers instead of one (operators/skew.py — the "
    "explicit fallback when AQE skew-split can't help, e.g. replicated "
    "hash joins). The oracle is the PLAIN join: salting must be "
    "result-invariant, and the value-hash check proves it. Revenue "
    "sums as exact DECIMAL so reducer order can't drift the hash.",
)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.skew import salted_join

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_extendedprice"
    )
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderpriority")
    joined = salted_join(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), o, on="o_orderkey",
        salt_factor=4,
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast("decimal(14,2)"))
            .cast("string")
            .alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q_null_safe_join",
    oracle="""
        WITH a AS (
          SELECT CASE WHEN value < 0.1 THEN NULL ELSE event_type END AS k,
                 count(*) AS n_a
          FROM events GROUP BY 1
        ),
        b AS (
          SELECT CASE WHEN value > 0.9 THEN NULL ELSE event_type END AS k,
                 count(*) AS n_b
          FROM events GROUP BY 1
        )
        SELECT coalesce(a.k, '<NULL>') AS k, a.n_a, b.n_b
        FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
        ORDER BY k
    """,
    doc="Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys "
    "match each other instead of vanishing — the semantics corner that "
    "silently drops rows when a changelog or sessionless key is NULL "
    "under plain equality. Still hash-joinable (the null bucket is one "
    "key), unlike an OR-based null workaround which degrades the plan.",
)
def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    a = (
        e.select(
            F.when(F.col("value") < 0.1, F.lit(None))
            .otherwise(F.col("event_type"))
            .alias("k")
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_a"))
    )
    b = (
        e.select(
            F.when(F.col("value") > 0.9, F.lit(None))
            .otherwise(F.col("event_type"))
            .alias("k")
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_b"))
    )
    return (
        a.join(b, a["k"].eqNullSafe(b["k"]))
        .select(
            F.coalesce(a["k"], F.lit("<NULL>")).alias("k"), "n_a", "n_b"
        )
        .orderBy("k")
    )
