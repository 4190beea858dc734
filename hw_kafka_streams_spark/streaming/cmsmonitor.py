"""Cross-batch streaming heavy-hitter monitoring via count-min sketch.

The streaming twin of ``operators/sketches.py``: each micro-batch
builds its own bounded d×w partial sketch and lands it in a state
directory PARTITIONED BY batch_id; the "current" sketch is the
cnt-sum over all partials (CMS grids merge by addition). This is the
unbounded-horizon companion to the Misra-Gries top-k in
``streaming/stateful.py`` — MG tracks the top-k inside the streaming
state store; the CMS artifact answers ad-hoc "how often has X ever
appeared?" point queries across the entire stream history with
bounded state.

Replay idempotence: foreachBatch can redeliver a batch after a crash.
Sum-merging is NOT naturally idempotent (unlike the Bloom OR-fold in
``streaming/bloomdedup.py``), so each batch OVERWRITES its own
batch_id partition (dynamic partition overwrite) — a replayed batch
rewrites identical rows instead of double-counting, the same
partition-as-commit-marker policy the snapshot layer uses.

Scale shape: per batch ONE map-side-combinable aggregation bounded at
d·w rows; the state dir grows one tiny partition per batch and
compacts by rewriting summed partials (``compact_cms_state``);
estimates touch ≤ d·w rows however long the stream has run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hw_kafka_streams_spark.operators.sketches import cms_build, cms_estimate
from hw_kafka_streams_spark.operators.text import word_tokens


def fold_batch_cms(
    batch: DataFrame,
    state_dir: str,
    batch_id: int,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
) -> None:
    """Build this batch's partial sketch and overwrite its partition."""
    words = batch.filter(F.col(text_col).isNotNull()).select(
        F.explode(word_tokens(F.lower(F.col(text_col)))).alias("w")
    )
    part = cms_build(words, "w", depth, width).withColumn(
        "batch_id", F.lit(int(batch_id))
    )
    (
        part.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(state_dir)
    )


def cms_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """The merged sketch: sum partials across every batch partition."""
    return (
        spark.read.parquet(state_dir)
        .groupBy("cms_row", "cms_bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def compact_cms_state(spark: SparkSession, state_dir: str) -> None:
    """Fold all per-batch partials into a single partition (batch_id
    -1) so the state dir stays O(d·w) regardless of stream age; safe
    to run between triggers (the merged grid is value-identical)."""
    merged = cms_state(spark, state_dir).withColumn(
        "batch_id", F.lit(-1)
    )
    merged.write.mode("overwrite").parquet(state_dir + "_compact")
    spark.read.parquet(state_dir + "_compact").write.mode(
        "overwrite"
    ).partitionBy("batch_id").parquet(state_dir)


def cms_state_estimate(
    spark: SparkSession,
    state_dir: str,
    keys: DataFrame,
    key_col: str = "w",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate keys against the whole stream history."""
    return cms_estimate(
        cms_state(spark, state_dir), keys, key_col, depth, width
    )


def run_streaming_cms(
    spark: SparkSession,
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
):
    """Attach the CMS fold to a stream as a foreachBatch sink."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        fold_batch_cms(batch, state_dir, batch_id, text_col, depth, width)

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
