"""The LLM data-prep pipeline, streaming form: documents arrive
continuously, are quality-filtered, exact-deduped ACROSS batches, and
rolled up per source.

Same logical stages as queries/llm_q.q_llm_prep_pipeline, re-expressed
for unbounded input:
- the keep-first-per-fingerprint window becomes streaming dedup state
  (`dropDuplicatesWithinWatermark` on the fingerprint): a duplicate
  arriving within the watermark horizon is dropped, state is evicted
  after it — bounded by arrival rate × horizon, not corpus size;
- the per-source stats become an update-mode aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hw_kafka_streams_spark.operators.text import fingerprint, token_count


def streaming_prep(
    docs: DataFrame,
    langs: tuple[str, ...] = ("en",),
    min_chars: int = 100,
    max_chars: int = 20_000,
    dedup_horizon: str = "1 hour",
) -> DataFrame:
    """documents stream → filtered, cross-batch-deduped, per-source stats.

    ``docs`` needs (doc_id, text, lang, n_chars, source). Event time is
    the ingest time (documents carry none): duplicates of a doc seen
    within ``dedup_horizon`` are dropped exactly; after the horizon the
    fingerprint's state is evicted (re-ingests beyond it would pass —
    the documented bounded-state trade; widen the horizon or run a
    periodic batch dedup for stronger guarantees).
    """
    filtered = docs.filter(
        F.col("lang").isin(*langs) & F.col("n_chars").between(min_chars, max_chars)
    ).select(
        "doc_id",
        "source",
        fingerprint(F.col("text")).alias("fp"),
        token_count(F.col("text")).alias("n_toks"),
        F.current_timestamp().alias("ingest_ts"),
    )
    if filtered.isStreaming:
        deduped = filtered.withWatermark(
            "ingest_ts", dedup_horizon
        ).dropDuplicatesWithinWatermark(["fp"])
    else:
        deduped = filtered.dropDuplicates(["fp"])
    return deduped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").cast("long").alias("n_tokens"),
    )
