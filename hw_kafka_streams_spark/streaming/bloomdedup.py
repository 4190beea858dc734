"""Streaming cross-batch dedup with a persistent Bloom bitmap.

`streaming/prep.py` dedups exactly WITHIN a watermark horizon
(`dropDuplicatesWithinWatermark`: state bounded by arrival rate ×
horizon, duplicates beyond it pass). This module is the complementary
UNBOUNDED-horizon path: the seen-set is a Bloom bitmap persisted as a
tiny parquet artifact (`operators/bloom.py`), so state is O(num_bits)
— 16 KiB by default — FOREVER, regardless of how many documents have
streamed through.

The trade is explicit and documented: membership is approximate in one
direction only. A duplicate of anything ever seen is ALWAYS dropped
(no false negatives); a genuinely-new document is wrongly dropped with
probability ≈ fpp (size num_bits at ~10 bits per expected key for
~1 %). Because the hash positions are deterministic in the key, the
error is STABLE: the same content always resolves the same way, so
reruns and shard replays cannot flip a decision.

Per microbatch:
1. fingerprint the batch, keep the min-id row per intra-batch fp;
2. load the bitmap (absent ⇒ empty — first batch), drop rows whose fp
   might be contained;
3. hand survivors to the sink, THEN fold their fps into the bitmap and
   save. On an at-least-once replay (crash between sink and save) the
   batch re-evaluates against the pre-batch bitmap and emits the same
   rows — the OR-fold is idempotent, so a replayed fold is a no-op.

At crawl scale the bitmap stays driver-/artifact-sized while the
per-batch work is a narrow zero-shuffle probe plus one intra-batch
window — no index table to list, no state store to checkpoint. Pair
with `streaming/neardup.py` when near-duplicates (not just exact
content) must be caught.

Not SQL-oracle-able (multi-batch side effects + designed fpp);
semantics pinned by tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from hw_kafka_streams_spark.operators.bloom import (
    bloom_bitmap,
    load_bitmap,
    merge_bitmaps,
    might_contain,
    save_bitmap,
)
from hw_kafka_streams_spark.operators.text import fingerprint


def _load_or_empty(
    spark: SparkSession, bloom_dir: str, num_bits: int
) -> list[int]:
    # try/except instead of a filesystem check: works for object-store
    # paths where os.path probing would silently say "absent".
    try:
        return load_bitmap(spark, bloom_dir, num_bits)
    except AnalysisException:
        return [0] * (num_bits // 64)


def bloom_dedup_batch_step(
    spark: SparkSession,
    batch: DataFrame,
    bloom_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_bits: int = 1 << 17,
    k: int = 3,
) -> DataFrame:
    """One microbatch: intra-batch keep-min-id dedup → bloom probe →
    survivors. Pure function of (batch, persisted bitmap); does NOT
    write — the caller sinks the result first and then calls
    :func:`fold_batch_into_bloom`, preserving replay stability."""
    w = Window.partitionBy("fp").orderBy(id_col)
    fps = (
        batch.withColumn("fp", fingerprint(text_col))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    bitmap = _load_or_empty(spark, bloom_dir, num_bits)
    return fps.filter(
        ~might_contain(F.col("fp"), bitmap, num_bits, k)
    )


def fold_batch_into_bloom(
    spark: SparkSession,
    kept: DataFrame,
    bloom_dir: str,
    num_bits: int = 1 << 17,
    k: int = 3,
) -> None:
    """OR-fold the survivors' fingerprints into the persisted bitmap
    (idempotent: replaying the same keys changes nothing)."""
    old = _load_or_empty(spark, bloom_dir, num_bits)
    add = bloom_bitmap(kept, "fp", num_bits, k)
    save_bitmap(spark, merge_bitmaps(old, add), bloom_dir)


def run_streaming_bloom_dedup(
    spark: SparkSession,
    docs_stream: DataFrame,
    bloom_dir: str,
    checkpoint_dir: str,
    sink,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_bits: int = 1 << 17,
    k: int = 3,
):
    """Unbounded-horizon streaming exact-content dedup: emit only
    never-seen documents; state = one persisted Bloom bitmap."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        kept = bloom_dedup_batch_step(
            spark, batch, bloom_dir, id_col, text_col, num_bits, k
        ).persist()
        try:
            sink(kept, batch_id)
            fold_batch_into_bloom(spark, kept, bloom_dir, num_bits, k)
        finally:
            kept.unpersist()

    return (
        docs_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
