"""Streaming near-duplicate suppression: an incremental MinHash-LSH
index maintained across microbatches.

The batch near-dup path (operators/dedup.py) answers "which pairs in
this corpus are near-dups"; a crawl-ingest pipeline instead asks, per
arriving batch, "is this document a near-dup of ANYTHING seen so far".
The scalable answer is the same banded index, made persistent:

- the index is a parquet table of (id, sig, bucket, batch_id) rows,
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

Restart / at-least-once semantics (foreachBatch replays a batch after
a crash): labels are REPLAY-STABLE — the probe excludes an index row
with the prober's own id (``ix.id != new.id``), so a redelivered doc
never matches the rows its first delivery appended, and its peers
resolve to the same representative either intra-batch or via the
index.  Re-appends are skipped via a per-batch commit marker
(``<index>/_batches/<id>``, written after the append — underscore
dirs are invisible to parquet discovery); a crash between append and
marker can leave duplicate index rows, which are label-harmless
(min-id aggregation) and removed by :func:`compact_neardup_index`.

Operational: every microbatch appends a handful of parquet files; at
crawl scale the index becomes a small-file swamp and probe-side
listing slows.  :func:`run_streaming_neardup` therefore runs
:func:`compact_neardup_index` every ``compact_every`` batches —
bin-packs each band partition and drops crash-window duplicates, with
the same staged atomic-swap crash-safety as ``operators.layout
.compact_files``.

Not SQL-oracle-able (multi-batch side effects); semantics are pinned by
tests/test_streaming.py with constructed near-dup fixtures.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from hw_kafka_streams_spark.operators.dedup import (
    minhash_band_buckets,
    minhash_lsh_pairs,
    minhash_signatures,
    signature_est_jaccard,
)

INDEX_SCHEMA = "id long, sig array<bigint>, bucket long, batch_id long, band int"

_MARKER_SUBDIR = "_batches"  # underscore: ignored by parquet discovery


def _read_index(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """The persisted index, or None if it doesn't exist yet.

    Existence is probed by attempting the read, not ``os.path`` — the
    index may live on any Hadoop filesystem (HDFS/S3/ABFS), where a
    local-path check would silently disable cross-batch detection.
    """
    try:
        df = spark.read.schema(INDEX_SCHEMA).parquet(index_dir)
        df.schema  # force resolution so a missing path raises here
        return df
    except AnalysisException:
        return None


def neardup_batch_step(
    spark: SparkSession,
    batch: DataFrame,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 16,
    threshold: float = 0.5,
    hash_mode: str = "xxhash64",
    batch_id: int = -1,
) -> DataFrame:
    """Process one (micro)batch against the persistent LSH index.

    Returns ALL of the batch's docs labeled ``(doc_id, is_dup,
    dup_of)`` — ``dup_of`` is the smallest matching prior id (or the
    intra-batch representative); docs too short to signature (< n
    tokens, or NULL text) come back ``is_dup=false, dup_of=NULL`` and
    are not indexed.  Appends the non-dup docs' band rows to
    ``index_dir`` unless this ``batch_id`` already committed (replay).
    The labels are materialized BEFORE the append, so they can never
    observe the just-written rows.  Factored batch-shaped (DataFrame
    in/out) so the foreachBatch wrapper stays one line and tests can
    drive it synchronously.
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
    # the verify step.  `ix.id != new.id` keeps labels replay-stable:
    # a redelivered batch's docs are already IN the index, and without
    # the guard every one would match itself at est_jaccard = 1.
    index = _read_index(spark, index_dir)
    if index is not None:
        hits = (
            banded.alias("new")
            .join(
                index.alias("ix"),
                (F.col("new.band") == F.col("ix.band"))
                & (F.col("new.bucket") == F.col("ix.bucket"))
                & (F.col("new.id") != F.col("ix.id")),
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

    # Left-join back onto EVERY batch id: docs with no signature row
    # (< n tokens / NULL text) still get a label instead of vanishing.
    all_ids = batch.select(F.col(id_col).cast("long").alias("id")).distinct()
    labeled = (
        all_ids
        .join(sig.select("id", F.lit(True).alias("has_sig")), "id", "left")
        .join(intra, "id", "left")
        .join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            (F.col("dup_of_batch").isNotNull() | F.col("dup_of_index").isNotNull())
            .alias("is_dup"),
            F.least("dup_of_batch", "dup_of_index").alias("dup_of"),
            F.coalesce("has_sig", F.lit(False)).alias("_has_sig"),
        )
    )
    # Materialize (lineage cut) so the returned labels are computed from
    # the PRE-append index listing, not lazily after the write below.
    labeled = labeled.localCheckpoint(eager=True)

    # 3. Append only the survivors' band rows (band-partitioned layout),
    # unless this batch already committed (foreachBatch replay).
    marker = os.path.join(index_dir, _MARKER_SUBDIR, str(batch_id))
    if batch_id < 0 or not os.path.exists(marker):
        survivors = (
            labeled.filter(~F.col("is_dup") & F.col("_has_sig"))
            .select(F.col(id_col).alias("id"))
        )
        (
            banded.join(survivors, "id")
            .select("id", "sig", "bucket", F.lit(batch_id).alias("batch_id"), "band")
            .write.mode("append")
            .partitionBy("band")
            .parquet(index_dir)
        )
        if batch_id >= 0:
            os.makedirs(os.path.dirname(marker), exist_ok=True)
            open(marker, "w").close()
    return labeled.drop("_has_sig")


def compact_neardup_index(spark: SparkSession, index_dir: str) -> int:
    """Bin-pack the band-partitioned index and drop replay duplicates.

    Streaming appends leave a few files per (batch × band); this
    rewrites the whole index into ~1 file per band partition (the
    lakehouse OPTIMIZE pass), dropping duplicate (id, band, bucket)
    rows a crash between append and commit-marker may have left.
    Staged atomic swap: readers (the next batch's probe) see the old
    or the new index, never a half-written one; the commit markers are
    carried over.  Returns the output row count.
    """
    index = _read_index(spark, index_dir)
    if index is None:
        return 0
    deduped = index.dropDuplicates(["id", "band", "bucket"])
    tmp = index_dir.rstrip("/") + ".__compact_tmp__"
    shutil.rmtree(tmp, ignore_errors=True)
    # 1 file per band partition: each band's rows coalesce to one
    # writer task via a (band)-hash repartition before the write
    deduped.repartition("band").write.mode("overwrite").partitionBy(
        "band"
    ).parquet(tmp)
    markers = os.path.join(index_dir, _MARKER_SUBDIR)
    if os.path.isdir(markers):
        shutil.copytree(markers, os.path.join(tmp, _MARKER_SUBDIR))
    old = index_dir.rstrip("/") + ".__compact_old__"
    os.rename(index_dir, old)
    os.rename(tmp, index_dir)
    shutil.rmtree(old)
    out = _read_index(spark, index_dir)
    return out.count() if out is not None else 0


def run_streaming_neardup(
    spark: SparkSession,
    docs_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    sink,
    compact_every: int = 0,
    **step_kwargs,
):
    """Wire :func:`neardup_batch_step` into a StreamingQuery via
    foreachBatch; ``sink(labeled_df, batch_id)`` receives each batch's
    labels. The parquet index + checkpoint make the pipeline
    restartable: labeling is at-least-once (the sink may see a batch
    twice with identical labels), the index append is once per batch
    id (commit marker).  ``compact_every=N`` runs
    :func:`compact_neardup_index` after every Nth batch so the
    per-batch appends can't accumulate into a small-file swamp
    (0 = never, for tests that assert raw file layout)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        labeled = neardup_batch_step(
            spark, batch_df, index_dir, batch_id=batch_id, **step_kwargs
        )
        sink(labeled, batch_id)
        if compact_every and (batch_id + 1) % compact_every == 0:
            compact_neardup_index(spark, index_dir)

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
