"""Subquery-shaped relational battery (TPC-H Q2/Q8/Q13/Q15/Q16/Q17/Q18/Q21/Q22).

The reference engine's surface is topology-level (KafkaStreamApp.java),
but a complete analytics engine must cover the classic subquery shapes:
correlated EXISTS / NOT EXISTS, scalar subqueries over aggregates,
IN + HAVING, correlated MIN, and two-level aggregation. The test tables
lack ``partsupp`` and ship-mode/commit-date columns, so each query keeps
the canonical TPC-H *shape* while binding to the columns that exist.

Spark-first design: every correlated subquery is written in its
DECORRELATED form — the plan Catalyst would produce anyway — so the
intent is visible and the physical strategy is a join, never a per-row
re-scan:

- scalar subquery  -> 1-row aggregate, broadcast cross join
- EXISTS           -> LEFT SEMI join on the correlation key
- NOT EXISTS/NOT IN-> LEFT ANTI join on the correlation key
- correlated MIN   -> groupBy-min + equi-join back (no window shuffle
                      when the agg side is small enough to broadcast)

At 100 TB: the correlation keys here are the fact-table join keys
(orderkey/partkey/custkey), so the semi/anti joins shuffle once on the
same key the main join uses; AQE can reuse the exchange. The 1-row
scalar aggregates are broadcast — no driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hw_kafka_streams_spark.queries import register
from hw_kafka_streams_spark.sources.catalog import load_table


# --------------------------------------------------------------------------
# Q2 shape: correlated MIN subquery
# --------------------------------------------------------------------------

@register(
    "q2_min_price_supplier",
    oracle="""
        SELECT DISTINCT s_name, p_partkey, p_name,
               round(l_extendedprice, 2) AS min_price
        FROM lineitem, part, supplier
        WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
          AND p_size < 10
          AND l_extendedprice = (SELECT min(l2.l_extendedprice)
                                 FROM lineitem l2
                                 WHERE l2.l_partkey = p_partkey)
        ORDER BY p_partkey, s_name
    """,
    doc="TPC-H Q2 shape: correlated MIN subquery (cheapest supplier per "
    "part). Decorrelated to groupBy-min + equi-join back on "
    "(partkey, price) — one shuffle on l_partkey, reused by the join.",
)
def q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).filter(F.col("p_size") < 10)
    s = load_table(spark, "supplier", sf_dir)
    min_price = li.groupBy("l_partkey").agg(F.min("l_extendedprice").alias("_minp"))
    return (
        li.join(min_price, "l_partkey")
        .filter(F.col("l_extendedprice") == F.col("_minp"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_name",
            "p_partkey",
            "p_name",
            F.round("l_extendedprice", 2).alias("min_price"),
        )
        .distinct()
        .orderBy("p_partkey", "s_name")
    )


# --------------------------------------------------------------------------
# Q8 shape: market share via conditional aggregation over a 6-way join
# --------------------------------------------------------------------------

@register(
    "q8_market_share",
    oracle="""
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               round(sum(CASE WHEN ns.n_name = 'NATION_7'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 4) AS mkt_share
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation nc ON c_nationkey = nc.n_nationkey
        JOIN region   ON nc.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ns ON s_nationkey = ns.n_nationkey
        WHERE r_name = 'ASIA'
        GROUP BY 1
        ORDER BY o_year
    """,
    doc="TPC-H Q8 shape: supplier-nation market share within the ASIA "
    "customer region, by order year. 6-way join with two aliases of the "
    "nation dim; all dims broadcast, facts shuffle once on orderkey.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    nc = n.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
    )
    ns = n.select(F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("ns_name"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(r), F.col("nc_region") == F.col("r_regionkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("ns_name") == "NATION_7", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# Q13 shape: two-level aggregation over a filtered LEFT OUTER join
# --------------------------------------------------------------------------

@register(
    "q13_cust_order_dist",
    oracle="""
        SELECT c_count, count(*) AS custdist
        FROM (SELECT c_custkey, count(o_orderkey) AS c_count
              FROM customer LEFT JOIN orders
                ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
              GROUP BY c_custkey)
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape: orders-per-customer distribution. LEFT OUTER "
    "join with a join-side predicate (kept, not pushed to WHERE — outer "
    "semantics), count(col) ignoring nulls, then re-aggregate. Two "
    "shuffles: custkey, then the tiny c_count key.",
)
def q13_cust_order_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --------------------------------------------------------------------------
# Q15 shape: scalar subquery over a derived aggregate (top supplier)
# --------------------------------------------------------------------------

@register(
    "q15_top_supplier",
    oracle="""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier, revenue
        WHERE s_suppkey = supplier_no
          AND total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s_suppkey
    """,
    doc="TPC-H Q15 shape: supplier(s) with max quarterly revenue. The "
    "scalar MAX subquery is a 1-row aggregate broadcast-cross-joined "
    "into the filter — no driver collect, no second scan of lineitem.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "total_revenue"
            )
        )
    )
    max_rev = rev.agg(F.max("total_revenue").alias("_maxrev"))
    return (
        rev.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("_maxrev"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q16 shape: count-distinct with a NOT IN subquery
# --------------------------------------------------------------------------

@register(
    "q16_supplier_count",
    oracle="""
        SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_size IN (1, 2, 3, 4, 5, 10, 15, 20)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type
        ORDER BY supplier_cnt DESC, p_brand, p_type
    """,
    doc="TPC-H Q16 shape: distinct suppliers per (brand, type), excluding "
    "negative-balance suppliers. NOT IN on a never-null key -> LEFT ANTI "
    "against a broadcast dim; count(DISTINCT) expands to a two-phase "
    "agg (partial distinct map-side).",
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).filter(
        F.col("p_size").isin(1, 2, 3, 4, 5, 10, 15, 20)
    )
    bad = load_table(spark, "supplier", sf_dir).filter(F.col("s_acctbal") < 0)
    return (
        li.join(
            F.broadcast(bad.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type")
    )


# --------------------------------------------------------------------------
# Q17 shape: correlated AVG scalar subquery
# --------------------------------------------------------------------------

@register(
    "q17_small_qty_revenue",
    oracle="""
        SELECT round(sum(l1.l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
        WHERE p_brand = 'Brand#4'
          AND l1.l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                               FROM lineitem l2
                               WHERE l2.l_partkey = l1.l_partkey)
    """,
    doc="TPC-H Q17 shape: lines below half the part's average quantity. "
    "The correlated AVG decorrelates to a per-part aggregate joined back "
    "on partkey — one extra shuffle on the same key, not a per-row "
    "rescan of lineitem.",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).filter(F.col("p_brand") == "Brand#4")
    avg_qty = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (F.avg("l_quantity") * 0.5).alias("_half_avg")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_qty, F.col("l_partkey") == F.col("_pk"))
        .filter(F.col("l_quantity") < F.col("_half_avg"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# --------------------------------------------------------------------------
# Q18 shape: IN subquery with HAVING (large-volume orders)
# --------------------------------------------------------------------------

@register(
    "q18_large_volume_customer",
    oracle="""
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               round(sum(l_quantity), 2) AS total_qty
        FROM customer, orders, lineitem
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey
                             HAVING sum(l_quantity) > 250)
          AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    doc="TPC-H Q18 shape: customers with orders totalling > 250 units. "
    "IN + HAVING -> LEFT SEMI against the aggregated key set; both the "
    "semi join and the main join shuffle on l_orderkey, so AQE reuses "
    "the exchange. Top-100 via TakeOrderedAndProject.",
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_sq"))
        .filter(F.col("_sq") > 250)
        .select(F.col("l_orderkey").alias("_bigkey"))
    )
    return (
        o.join(big, F.col("o_orderkey") == F.col("_bigkey"), "left_semi")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q21 shape: correlated EXISTS + NOT EXISTS
# --------------------------------------------------------------------------

@register(
    "q21_sole_return_supplier",
    oracle="""
        SELECT s_name, count(*) AS numwait
        FROM supplier, lineitem l1, orders
        WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
    """,
    doc="TPC-H Q21 shape: suppliers on multi-supplier 'F' orders where no "
    "OTHER supplier's line was returned. EXISTS -> LEFT SEMI, NOT EXISTS "
    "-> LEFT ANTI, both equi on l_orderkey with the <> correlate as a "
    "residual join condition — three shuffles on the same orderkey.",
)
def q21_sole_return_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, "supplier", sf_dir)
    l1 = li.select("l_orderkey", "l_suppkey")
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l3_orderkey"), F.col("l_suppkey").alias("l3_suppkey")
    )
    return (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("l2_orderkey"))
            & (F.col("l_suppkey") != F.col("l2_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("l3_orderkey"))
            & (F.col("l_suppkey") != F.col("l3_suppkey")),
            "left_anti",
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q22 shape: scalar AVG subquery + NOT EXISTS (idle wealthy customers)
# --------------------------------------------------------------------------

@register(
    "q22_idle_customers",
    oracle="""
        SELECT CAST(c_nationkey % 10 AS INT) AS cntrycode,
               count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                           WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY 1
        ORDER BY cntrycode
    """,
    doc="TPC-H Q22 shape: above-average-balance customers with no orders, "
    "grouped by a derived country code. Scalar AVG -> 1-row broadcast "
    "cross join; NOT EXISTS -> LEFT ANTI on custkey.",
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("_avgbal")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avgbal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy((F.col("c_nationkey") % 10).cast("int").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


# --------------------------------------------------------------------------
# Q11 shape: group share vs a global scalar aggregate
# --------------------------------------------------------------------------

@register(
    "q11_important_parts",
    oracle="""
        WITH nat AS (
            SELECT l_partkey, l_extendedprice * (1 - l_discount) AS val
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name IN ('NATION_3', 'NATION_7')
        )
        SELECT l_partkey AS partkey, round(sum(val), 2) AS part_value
        FROM nat
        GROUP BY l_partkey
        HAVING sum(val) > (SELECT sum(val) * 0.002 FROM nat)
        ORDER BY part_value DESC, partkey
    """,
    doc="TPC-H Q11 shape (KafkaStreamApp.java has no aggregation surface; "
    "this is north-star relational coverage): per-part value share vs a "
    "global scalar subquery threshold. Decorrelated: the 1-row global "
    "sum is broadcast cross-joined — no per-group re-scan. Both "
    "aggregates shuffle once on l_partkey / reduce to 1 row; at 100 TB "
    "AQE reuses the filtered-scan exchange for the two branches.",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir).filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    nat = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "l_partkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("val"),
        )
    )
    per_part = nat.groupBy("l_partkey").agg(F.sum("val").alias("_pv"))
    total = nat.agg((F.sum("val") * F.lit(0.002)).alias("_threshold"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("_pv") > F.col("_threshold"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.round("_pv", 2).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "partkey")
    )


# --------------------------------------------------------------------------
# Q20 shape: nested IN subqueries (suppliers shipping an outsized share)
# --------------------------------------------------------------------------

@register(
    "q20_excess_suppliers",
    oracle="""
        SELECT s_name, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name LIKE 'NATION_1%'
          AND s_suppkey IN (
            SELECT ps.l_suppkey
            FROM (SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
                  FROM lineitem
                  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
                  GROUP BY l_partkey, l_suppkey) ps
            JOIN (SELECT l_partkey, sum(l_quantity) AS part_qty
                  FROM lineitem
                  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
                  GROUP BY l_partkey) pt USING (l_partkey)
            WHERE ps.supp_qty > 0.3 * pt.part_qty
              AND ps.l_partkey IN (SELECT p_partkey FROM part
                                   WHERE p_name LIKE '%3%')
          )
        ORDER BY s_name
    """,
    doc="TPC-H Q20 shape: nested IN subqueries — suppliers who shipped "
    ">30% of a filtered part's 1996 volume. Decorrelated: both "
    "quantity aggregates group the SAME filtered scan on l_partkey "
    "(+l_suppkey), so the finer agg's shuffle is reused by the join; "
    "the part filter is a broadcast SEMI join; the final supplier "
    "membership is a SEMI join on s_suppkey. Quantities are integral "
    "doubles — the 0.3× threshold compare is drift-free.",
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li_96 = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, "part", sf_dir).filter(F.col("p_name").like("%3%"))
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir).filter(F.col("n_name").like("NATION_1%"))
    per_ps = li_96.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("supp_qty")
    )
    per_part = li_96.groupBy("l_partkey").agg(F.sum("l_quantity").alias("part_qty"))
    excess = (
        per_ps.join(per_part, "l_partkey")
        .filter(F.col("supp_qty") > 0.3 * F.col("part_qty"))
        .join(
            F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
        )
        .select("l_suppkey")
    )
    return (
        s.join(excess, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )
