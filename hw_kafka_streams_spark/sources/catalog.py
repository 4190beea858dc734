"""Batch parquet catalog over the driver-generated test tables.

The reference's only sources are Kafka topics (KafkaStreamApp.java:140,
147,154); the batch analog here is a parquet scan per table. Reading
through ``spark.read.parquet`` keeps predicate pushdown / column
pruning / partition pruning available to Catalyst — at 100 TB the scan
is the dominant cost and pruning is the main lever.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# Table name -> small-dimension flag. Small dims should be broadcast in
# joins (the Spark analog of the reference's GlobalKTable replication,
# KafkaStreamApp.java:140-152). At sf1000, region/nation stay tiny;
# customer/supplier/part grow but remain << fact tables.
TABLES: dict[str, bool] = {
    "region": True,
    "nation": True,
    "customer": False,
    "supplier": True,
    "part": False,
    "orders": False,
    "lineitem": False,
    "events": False,
    "documents": False,
    "embeddings": False,
}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Load one test table as a DataFrame (lazy parquet scan).

    Session-config-independent by design: any config a table read needs
    is set (idempotently, runtime-settable) right here rather than only
    in ``session.get_spark()``, so the catalog works on a vanilla
    ``SparkSession.builder.getOrCreate()`` session too.
    """
    sf_dir = sf_dir or DEFAULT_SF_DIR
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {sorted(TABLES)}")
    if name == "events":
        # events.parquet stores ts as INT64 TIMESTAMP(NANOS); without this
        # flag a vanilla session fails the read with PARQUET_TYPE_ILLEGAL.
        # Guarded set: conf.set invalidates cached plan state, so only
        # touch it when the session actually lacks the flag.
        key = "spark.sql.legacy.parquet.nanosAsLong"
        if spark.conf.get(key, "false") != "true":
            spark.conf.set(key, "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # ts is TIMESTAMP(NANOS) on disk, surfaced as nano-epoch long
        # (spark.sql.legacy.parquet.nanosAsLong). Convert to Spark's µs
        # timestamp by integer floor-division — same truncation DuckDB
        # applies when casting ns → µs, keeping oracles comparable.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str | None = None, register_views: bool = False
) -> dict[str, DataFrame]:
    """Load all tables; optionally register them as temp views for SQL."""
    dfs = {name: load_table(spark, name, sf_dir) for name in TABLES}
    if register_views:
        for name, df in dfs.items():
            df.createOrReplaceTempView(name)
    return dfs
