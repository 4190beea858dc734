"""Custom stateful streaming operators (applyInPandasWithState).

The reference's only stateful pattern is a replicated KV lookup
(GlobalKTable, covered by broadcast joins in pipeline.py). These
operators cover the *general* per-key mutable state surface the
engine must offer — the Spark analog of a Kafka Streams
``Processor`` with a local ``KeyValueStore``.

Scale notes: state lives in the executor state store partitioned by
the grouping key (one shuffle on key), checkpointed per batch;
timeouts bound state lifetime. Arrow moves batches to Python — the
per-key logic is pandas-vectorized, not per-row.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_COUNT_SCHEMA = "key string, n_total bigint"
RUNNING_COUNT_STATE = "n bigint"


def _running_count_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n = state.get[0] if state.exists else 0
    for pdf in pdfs:
        n += len(pdf)
    state.update((n,))
    yield pd.DataFrame({"key": [key[0]], "n_total": [n]})


def running_counts(df: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Per-key running event count across microbatches.

    Emits one (key, n_total) row per key per batch, where n_total
    accumulates over the stream's lifetime — state a plain windowed agg
    cannot express (no window bound). Batch DataFrames degrade to a
    plain groupBy count (state is meaningless in one pass).
    """
    if not df.isStreaming:
        import pyspark.sql.functions as F

        return df.groupBy(F.col(key_col).alias("key")).agg(
            F.count(F.lit(1)).alias("n_total")
        )
    return (
        df.groupBy(key_col)
        .applyInPandasWithState(
            _running_count_fn,
            outputStructType=RUNNING_COUNT_SCHEMA,
            stateStructType=RUNNING_COUNT_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
