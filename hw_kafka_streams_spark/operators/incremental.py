"""Cross-job incremental dedup: one documented pipeline over the
repo's three persistent dedup artifacts.

A 100 TB corpus is never deduped in one job — it arrives in daily
increments, and each increment must dedup against ALL prior days
without rescanning them. The three artifacts that make that possible,
each individually tested elsewhere, compose here into one state
directory:

- ``bloom.parquet`` — the OR-mergeable Bloom bitmap over every
  historical content fingerprint (operators/bloom.py). Probing it is a
  zero-shuffle literal-array expression; ~misses (the vast majority of
  a fresh crawl) skip the history join entirely.
- ``fingerprints.parquet`` — the exact historical fingerprint set, the
  ground truth behind the bloom's maybe-hits (re-verified with a real
  LEFT ANTI join, so exactness is preserved; the bloom only PRUNES).
- ``neardup_index/`` — the band-partitioned MinHash-LSH index
  (streaming/neardup.py): (band, bucket, sig) rows probed per
  increment, appended with only the increment's survivors.

Daily flow (:func:`incremental_dedup_step`):

1. fingerprint the increment (md5 of normalized text);
2. intra-increment exact dedup (keep-min representative);
3. exact-vs-history via the bloom-pruned anti join — history is
   touched only for bloom maybe-hits;
4. near-dup-vs-history + intra-increment near-dup via the LSH index
   step (which also appends the survivors' band rows);
5. fold the increment's fingerprints into both exact artifacts
   (parquet append + bitmap OR-merge — merge(bloom(a), bloom(b)) ==
   bloom(a ∪ b), so history is never rescanned);
6. every ``compact_every`` days, compact both the fingerprint table
   and the LSH index (small-file mitigation — operators/layout.py
   compact_files / streaming/neardup.compact_neardup_index).

Reference parity note: this is the batch-increment twin of what the
reference's RocksDB-backed GlobalKTable state does for its message
topology (svolga/hw-kafka-streams KafkaStreamApp.java:140-152) —
persistent state that outlives any one run — applied to the dedup
surface the north-star extensions add.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hw_kafka_streams_spark.operators.bloom import (
    bloom_anti_join,
    bloom_bitmap,
    load_bitmap,
    merge_bitmaps,
    save_bitmap,
)
from hw_kafka_streams_spark.operators.text import fingerprint

_BLOOM = "bloom.parquet"
_FPS = "fingerprints.parquet"
_INDEX = "neardup_index"


def incremental_dedup_step(
    spark: SparkSession,
    batch: DataFrame,
    state_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_bits: int = 1 << 17,
    k: int = 3,
    bands: int = 16,
    threshold: float = 0.5,
    hash_mode: str = "xxhash64",
    day_id: int = -1,
    compact_every: int = 7,
) -> DataFrame:
    """Label one day's increment against all prior days' state.

    Returns every batch doc as ``(doc_id, exact_dup_of_history,
    exact_dup_of_batch, near_dup, dup_of, is_new)`` — ``is_new`` marks
    the docs a downstream writer should keep — and folds the kept docs
    into the state directory for the next increment.

    Docs with a NULL fingerprint (NULL/empty text) or NULL id cannot
    participate in dedup state; they pass through explicitly as
    ``is_new`` with null ``dup_of`` (mirroring neardup_batch_step's
    has_sig handling) instead of being silently dropped by the
    null-unsafe state joins. The id column must be integral — a
    lossy ``cast('long')`` on string ids would null them silently, so
    non-integral id columns are rejected up front.
    """
    from hw_kafka_streams_spark.streaming.neardup import (
        compact_neardup_index,
        neardup_batch_step,
    )

    id_type = batch.schema[id_col].dataType.simpleString()
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"incremental_dedup_step needs an integral id column; got "
            f"{id_col!r}: {id_type}. Hash or cast ids to BIGINT first "
            "(e.g. xxhash64 for string ids)."
        )

    os.makedirs(state_dir, exist_ok=True)
    bloom_path = os.path.join(state_dir, _BLOOM)
    fps_path = os.path.join(state_dir, _FPS)
    index_dir = os.path.join(state_dir, _INDEX)

    fps_all = batch.select(
        F.col(id_col).cast("long").alias("id"),
        fingerprint(F.col(text_col)).alias("fp"),
    )
    # no-signature passthrough: null text/id rows are labeled, not lost
    no_sig = fps_all.filter(F.col("fp").isNull() | F.col("id").isNull())
    fps = fps_all.filter(F.col("fp").isNotNull() & F.col("id").isNotNull())

    # intra-increment exact dedup: keep-min representative per content
    intra_keep = fps.groupBy("fp").agg(F.min("id").alias("keep_id"))
    intra = fps.join(intra_keep, "fp").select(
        "id",
        "fp",
        F.when(F.col("id") != F.col("keep_id"), F.col("keep_id")).alias(
            "_batch_rep"
        ),
    )

    # exact-vs-history: bloom-pruned anti join against the persisted
    # fingerprint set (misses never touch history; hits re-verified)
    have_history = os.path.exists(fps_path)
    if have_history:
        history = spark.read.parquet(fps_path)
        fresh = bloom_anti_join(
            intra,
            history.withColumnRenamed("id", "_hid"),
            key_col="fp",
            num_bits=num_bits,
            k=k,
            # the persisted bitmap IS the point: history's parquet is
            # only read for bloom maybe-hits, never scanned to rebuild
            bitmap=load_bitmap(spark, bloom_path, num_bits)
            if os.path.exists(bloom_path)
            else None,
        ).select("id")
        labeled_exact = intra.join(
            fresh.withColumn("_fresh", F.lit(True)), "id", "left"
        ).select(
            "id",
            "fp",
            "_batch_rep",
            (~F.coalesce(F.col("_fresh"), F.lit(False))).alias("_hist_dup"),
        )
    else:
        labeled_exact = intra.withColumn("_hist_dup", F.lit(False))

    # near-dup (intra + vs-history) through the persistent LSH index;
    # only exact-new batch representatives are worth signaturing
    exact_new = labeled_exact.filter(
        ~F.col("_hist_dup") & F.col("_batch_rep").isNull()
    ).select("id")
    nd_input = batch.join(
        exact_new.withColumnRenamed("id", id_col), id_col
    )
    nd = neardup_batch_step(
        spark,
        nd_input,
        index_dir,
        text_col=text_col,
        id_col=id_col,
        bands=bands,
        threshold=threshold,
        hash_mode=hash_mode,
        batch_id=day_id,
    ).select(
        F.col(id_col).alias("id"),
        F.col("is_dup").alias("_near_dup"),
        F.col("dup_of").alias("_near_dup_of"),
    )

    labeled = (
        labeled_exact.join(nd, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.col("_hist_dup").alias("exact_dup_of_history"),
            F.col("_batch_rep").isNotNull().alias("exact_dup_of_batch"),
            F.coalesce("_near_dup", F.lit(False)).alias("near_dup"),
            F.coalesce("_batch_rep", "_near_dup_of").alias("dup_of"),
            (
                ~F.col("_hist_dup")
                & F.col("_batch_rep").isNull()
                & ~F.coalesce(F.col("_near_dup"), F.lit(False))
            ).alias("is_new"),
        )
        .localCheckpoint(eager=True)  # label before state mutates below
    )
    out = labeled.unionByName(
        no_sig.select(
            F.col("id").alias(id_col),
            F.lit(False).alias("exact_dup_of_history"),
            F.lit(False).alias("exact_dup_of_batch"),
            F.lit(False).alias("near_dup"),
            F.lit(None).cast("long").alias("dup_of"),
            F.lit(True).alias("is_new"),
        )
    )

    # fold the increment into the exact artifacts: bitmap FIRST, then
    # fingerprint append. A crash between the two writes may leave the
    # bitmap a SUPERSET of the fingerprint table, which is always safe
    # (bloom maybe-hits are re-verified against the parquet); the
    # reverse order could leave a SUBSET, under which already-appended
    # fingerprints probe as "definitely new", skip the exact re-verify,
    # and get re-emitted on replay — violating both the replay contract
    # and bloom_anti_join's coverage precondition.
    kept_fps = fps.join(
        labeled.filter("is_new").select(F.col(id_col).alias("id")), "id"
    ).localCheckpoint(eager=True)  # one computation feeds both writes
    inc_bitmap = bloom_bitmap(kept_fps, "fp", num_bits, k)
    if os.path.exists(bloom_path):
        inc_bitmap = merge_bitmaps(
            inc_bitmap, load_bitmap(spark, bloom_path, num_bits)
        )
    save_bitmap(spark, inc_bitmap, bloom_path)
    kept_fps.write.mode("append").parquet(fps_path)

    if day_id > 0 and compact_every > 0 and day_id % compact_every == 0:
        from hw_kafka_streams_spark.operators.layout import compact_files

        compact_files(spark, fps_path)
        compact_neardup_index(spark, index_dir)
    return out


def run_streaming_incremental_dedup(
    spark: SparkSession,
    docs_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    sink,
    **step_kwargs,
):
    """Wire :func:`incremental_dedup_step` into a StreamingQuery via
    foreachBatch — the "daily increment" becomes a micro-batch, the
    state directory becomes streaming state that outlives the query.

    ``sink(labeled_df, batch_id)`` receives each batch's labels.
    Restart semantics follow the batch pipeline's: labeling is
    at-least-once (a replayed batch re-labels identically against the
    pre-append state only for the near-dup index, which is guarded by
    its batch_id commit marker; the exact-fingerprint append is
    at-least-once and idempotent for dedup DECISIONS — an already-
    appended fingerprint just makes its own replay an exact-history
    dup, so replays never re-emit is_new rows twice with different
    content, the property that matters downstream).
    """

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        labeled = incremental_dedup_step(
            spark, batch_df, state_dir, day_id=int(batch_id), **step_kwargs
        )
        sink(labeled, batch_id)

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
