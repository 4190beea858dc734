"""SQL entry point: run ANSI SQL directly against the test catalog.

The DataFrame API and SQL compile to the same Catalyst plans; this is
the thin convenience layer so an engine user can write either. Views
are session-scoped temp views over the parquet scans (zero copy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hw_kafka_streams_spark.sources.catalog import load_tables


def run_sql(spark: SparkSession, query: str, sf_dir: str | None = None) -> DataFrame:
    """Register all catalog tables as temp views and run ``query``."""
    load_tables(spark, sf_dir, register_views=True)
    return spark.sql(query)
