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


def _make_ttl_count_fn(ttl_ms: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # horizon passed with no arrivals: emit a tombstone row and
            # drop the state — the unbounded-key safety valve
            (n,) = state.get
            state.remove()
            yield pd.DataFrame({"key": [key[0]], "n_total": [n], "expired": [True]})
            return
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({"key": [key[0]], "n_total": [n], "expired": [False]})

    return fn


def running_counts_with_ttl(
    df: DataFrame, key_col: str = "user_id", ttl_minutes: int = 60
) -> DataFrame:
    """Per-key running counts whose state EXPIRES after ``ttl_minutes``
    without arrivals (processing-time timeout → final row flagged
    ``expired`` + state removed).

    The unbounded-key-space guard the plain running count lacks: with
    billions of transient keys (session ids, request ids), NoTimeout
    state grows forever; a TTL bounds it to keys active within the
    horizon — the Spark analog of a Kafka Streams punctuator evicting
    a KeyValueStore.
    """
    return df.groupBy(key_col).applyInPandasWithState(
        _make_ttl_count_fn(ttl_minutes * 60 * 1000),
        outputStructType="key string, n_total bigint, expired boolean",
        stateStructType=RUNNING_COUNT_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
