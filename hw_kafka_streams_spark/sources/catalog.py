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
        # Older driver-generated events.parquet stored ts as INT64
        # TIMESTAMP(NANOS); without this flag a vanilla session fails that
        # read with PARQUET_TYPE_ILLEGAL. Harmless for µs-encoded data.
        # Guarded set: conf.set invalidates cached plan state, so only
        # touch it when the session actually lacks the flag.
        key = "spark.sql.legacy.parquet.nanosAsLong"
        if spark.conf.get(key, "false") != "true":
            spark.conf.set(key, "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = _canonicalize_events_ts(df)
    return df


def _canonicalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to Spark's TIMESTAMP regardless of encoding.

    The driver owns the testdata and has already changed the on-disk
    encoding between rounds (r1: INT64 TIMESTAMP(NANOS); r2+:
    ``timestamp[us]``). The contract here is therefore on the *surfaced*
    Spark type, never the file format:

    - ``LongType``  -> nano-epoch long from the nanosAsLong legacy read;
      floor-divide to µs (same truncation DuckDB applies for ns -> µs).
    - ``TimestampNTZType`` -> µs parquet timestamp without UTC adjustment;
      reinterpret the wall-clock instant as UTC (session tz is UTC, so
      a plain cast matches DuckDB's ``epoch()`` on its TIMESTAMP type).
    - ``TimestampType`` -> already canonical, pass through.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

    dtype = df.schema["ts"].dataType
    if isinstance(dtype, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(dtype, TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast(TimestampType()))
    if isinstance(dtype, TimestampType):
        return df
    raise TypeError(f"events.ts surfaced as unsupported type {dtype}")


def load_tables(
    spark: SparkSession, sf_dir: str | None = None, register_views: bool = False
) -> dict[str, DataFrame]:
    """Load all tables; optionally register them as temp views for SQL."""
    dfs = {name: load_table(spark, name, sf_dir) for name in TABLES}
    if register_views:
        for name, df in dfs.items():
            df.createOrReplaceTempView(name)
    return dfs
