"""Engine operators: the reference's pipeline ops plus scale extensions."""

from hw_kafka_streams_spark.operators.censor import (
    block_messages,
    censor_column,
    filter_pipeline,
)

__all__ = ["block_messages", "censor_column", "filter_pipeline"]
