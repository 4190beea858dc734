"""Streaming near-duplicate suppression: an incremental MinHash-LSH
index maintained across microbatches.

The batch near-dup path (operators/dedup.py) answers "which pairs in
this corpus are near-dups"; a crawl-ingest pipeline instead asks, per
arriving batch, "is this document a near-dup of ANYTHING seen so far".
The scalable answer is the same banded index, made persistent:

- the index is a parquet table of (id, sig, band, bucket) rows,
  partitioned by ``band`` — a new batch joins it ONLY on
  (band, bucket), so at crawl scale the probe touches the matching
  band partitions and bucket hash-space, never the corpus;
- each microbatch: signature + band its docs (the exact
  :func:`operators.dedup.minhash_band_buckets` used in batch), drop
  intra-batch dups (keep min id), probe the index for bucket
  collisions, verify with the signature-estimated Jaccard, then
  append only the survivors' band rows to the index;
- state is the index table itself — no driver memory, no Spark state
  store growth; exactly the "seen-set as a table" design crawl dedup
  uses (the alternative, dropDuplicatesWithinWatermark, bounds state
  by TIME — this bounds nothing and needs no horizon because parquet
  is the state).

Not SQL-oracle-able (multi-batch side effects); semantics are pinned by
tests/test_streaming.py with constructed near-dup fixtures.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hw_kafka_streams_spark.operators.dedup import (
    minhash_band_buckets,
    minhash_lsh_pairs,
    minhash_signatures,
    signature_est_jaccard,
)

INDEX_SCHEMA = "id long, sig array<bigint>, band int, bucket long"


def neardup_batch_step(
    spark: SparkSession,
    batch: DataFrame,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 16,
    threshold: float = 0.5,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Process one (micro)batch against the persistent LSH index.

    Returns the batch's docs labeled ``(doc_id, is_dup, dup_of)`` —
    ``dup_of`` is the smallest matching prior id (or the intra-batch
    representative) — and appends the non-dup docs' band rows to
    ``index_dir``. Factored batch-shaped (DataFrame in/out) so the
    foreachBatch wrapper stays one line and tests can drive it
    synchronously.
    """
    # 1. Intra-batch near-dups (keep the min id as representative).
    intra = (
        minhash_lsh_pairs(
            batch, text_col, id_col, bands=bands,
            verify_threshold=threshold, hash_mode=hash_mode,
        )
        .groupBy(F.col("id2").alias("id"))
        .agg(F.min("id1").alias("dup_of_batch"))
    )

    sig = minhash_signatures(batch, text_col, id_col, hash_mode=hash_mode)
    banded = minhash_band_buckets(sig, bands=bands, hash_mode=hash_mode)

    # 2. Probe the persistent index on (band, bucket) — partition-pruned
    # on band, hash-joined on bucket; the index's sig rides along for
    # the verify step.
    if os.path.isdir(index_dir):
        index = spark.read.schema(INDEX_SCHEMA).parquet(index_dir)
        hits = (
            banded.alias("new")
            .join(
                index.alias("ix"),
                (F.col("new.band") == F.col("ix.band"))
                & (F.col("new.bucket") == F.col("ix.bucket")),
            )
            .withColumn(
                "est", signature_est_jaccard(F.col("new.sig"), F.col("ix.sig"))
            )
            .filter(F.col("est") >= threshold)
            .groupBy(F.col("new.id").alias("id"))
            .agg(F.min(F.col("ix.id")).alias("dup_of_index"))
        )
    else:
        hits = spark.createDataFrame([], "id long, dup_of_index long")

    labeled = (
        sig.select("id")
        .join(intra, "id", "left")
        .join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            (F.col("dup_of_batch").isNotNull() | F.col("dup_of_index").isNotNull())
            .alias("is_dup"),
            F.least("dup_of_batch", "dup_of_index").alias("dup_of"),
        )
    )

    # 3. Append only the survivors' band rows (band-partitioned layout).
    survivors = labeled.filter(~F.col("is_dup")).select(F.col(id_col).alias("id"))
    (
        banded.join(survivors, "id")
        .select("id", "sig", "band", "bucket")
        .write.mode("append")
        .partitionBy("band")
        .parquet(index_dir)
    )
    return labeled


def run_streaming_neardup(
    spark: SparkSession,
    docs_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    sink,
    **step_kwargs,
):
    """Wire :func:`neardup_batch_step` into a StreamingQuery via
    foreachBatch; ``sink(labeled_df, batch_id)`` receives each batch's
    labels. The parquet index + checkpoint make the pipeline restartable
    (at-least-once labeling; index appends are idempotent per batch id
    only if the sink dedups — documented trade, same as any foreachBatch
    side effect)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        labeled = neardup_batch_step(spark, batch_df, index_dir, **step_kwargs)
        sink(labeled, batch_id)

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
