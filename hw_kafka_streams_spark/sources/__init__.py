"""Sources & sinks: parquet catalog over the test tables, Kafka wrappers."""

from hw_kafka_streams_spark.sources.catalog import TABLES, load_table, load_tables

__all__ = ["TABLES", "load_table", "load_tables"]
