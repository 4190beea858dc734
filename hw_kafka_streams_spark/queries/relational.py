"""Relational core queries over the TPC-H-ish test tables.

Every query here is pure DataFrame API (Catalyst-optimized: pushdown,
pruning, broadcast selection) with a DuckDB oracle. Doubles are rounded
at the output edge (both sides identically) so the driver's value-hash
compare is stable across summation orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hw_kafka_streams_spark.queries import register
from hw_kafka_streams_spark.sources.catalog import load_table


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
    "q_censor_documents",
    oracle="""
        SELECT doc_id,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(text, 'data', '****', 'gi'),
                   'model', '*****', 'gi'),
                 'the', '***', 'gi')                                            AS text,
               lang
        FROM documents
        ORDER BY doc_id
    """,
    doc="Reference censor operator (O6) at scale over documents: fold of "
    "case-insensitive literal regexp_replace, length-preserving mask. "
    "MessageFilterProcessor.java:31-44 re-expressed as codegen'd column ops.",
)
def q_censor_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hw_kafka_streams_spark.operators.censor import censor_column

    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select(
            "doc_id",
            censor_column("text", ["data", "model", "the"]).alias("text"),
            "lang",
        ).orderBy("doc_id")
    )
