"""Document chunking + train/eval contamination — LLM-pipeline staples.

The reference (svolga/hw-kafka-streams, KafkaStreamApp.java:137-172) has
no text-windowing surface at all; these are north-star extensions a
training-data pipeline needs in front of a tokenizer:

- **chunk_documents** — fixed-size overlapping character windows
  (size/stride), the standard pre-tokenization split. Purely narrow
  (sequence → posexplode → substring): no shuffle, whole-stage codegen,
  and the parquet scan only reads (id, text). At 100 TB it scales
  linearly with input bytes; output partitioning inherits the scan.
- **char_ngram_contamination** — eval-set decontamination by character
  n-gram overlap (the 13-gram decontamination idea from public LLM
  dataset reports, re-expressed relationally): explode grams on both
  splits, distinct, inner-join train grams to eval grams, count hits
  per eval doc. One shuffle on the gram; the ``max_train_df`` guard
  drops degenerate grams (boilerplate that appears in huge numbers of
  train docs) the same way a posting-list cap bounds Jaccard dedup —
  without it a single hot gram would create a reduce-side hot key at
  crawl scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hw_kafka_streams_spark.operators.winutil import tiny_table_partition


def chunk_starts(text: Column, stride: int) -> Column:
    """0-based chunk start offsets: 0, stride, 2*stride … < length."""
    return F.sequence(
        F.lit(0), F.greatest(F.length(text) - 1, F.lit(0)), F.lit(stride)
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 120,
    stride: int = 90,
    min_len: int = 30,
) -> DataFrame:
    """Overlapping character-window chunks of each document.

    Returns (id, chunk_idx, chunk_start, chunk) — one row per window of
    ``size`` chars every ``stride`` chars, tail windows shorter than
    ``min_len`` dropped. Narrow pipeline: no shuffle, no Python.
    """
    text = F.col(text_col)
    out = (
        df.select(
            F.col(id_col),
            text.alias("_t"),
            F.posexplode(chunk_starts(text, stride)).alias(
                "chunk_idx", "chunk_start"
            ),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.col("chunk_start").cast("long").alias("chunk_start"),
            F.substring(
                F.col("_t"), F.col("chunk_start") + 1, F.lit(size)
            ).alias("chunk"),
        )
        .filter(F.length("chunk") >= min_len)
    )
    return out


def char_ngrams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 20,
    stride: int = 10,
) -> DataFrame:
    """Strided character n-grams of lower-cased text: (id, gram).

    Documents shorter than ``n`` chars produce no grams (callers filter
    them out so Spark's ``sequence`` never sees a negative bound).
    """
    lt = F.lower(F.col(text_col))
    return df.filter(F.length(text_col) >= n).select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.length(lt) - n, F.lit(stride))
        ).alias("_s"),
        lt.alias("_lt"),
    ).select(
        id_col,
        F.substring(F.col("_lt"), F.col("_s") + 1, F.lit(n)).alias("gram"),
    )


def char_ngram_contamination(
    train: DataFrame,
    test: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 20,
    stride: int = 10,
    max_train_df: int | None = None,
) -> DataFrame:
    """Per-eval-doc count of distinct n-grams also present in train.

    Returns (id, n_hit_grams, contaminated) for every eval doc with at
    least ``n`` chars. ``max_train_df`` drops train grams appearing in
    more than that many train docs (boilerplate/skew guard) — at crawl
    scale always set it; left None here so small-scale results have an
    exact SQL twin.
    """
    tg = char_ngrams(train, text_col, id_col, n, stride)
    if max_train_df is not None:
        keep = (
            tg.groupBy("gram")
            .agg(F.countDistinct(id_col).alias("_df"))
            .filter(F.col("_df") <= max_train_df)
            .select("gram")
        )
        train_grams = keep
    else:
        train_grams = tg.select("gram").distinct()
    test_grams = char_ngrams(test, text_col, id_col, n, stride).distinct()
    hits = (
        test_grams.join(train_grams, "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit_grams"))
    )
    eval_ids = test.filter(F.length(text_col) >= n).select(id_col).distinct()
    return eval_ids.join(hits, id_col, "left").select(
        id_col,
        F.coalesce("n_hit_grams", F.lit(0)).alias("n_hit_grams"),
        (F.coalesce("n_hit_grams", F.lit(0)) > 0).cast("int").alias("contaminated"),
    )


def sequence_pack_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    capacity: int = 512,
    block: int = 256,
) -> DataFrame:
    """Pretraining sequence packing: concatenate all documents in id
    order into one token stream and cut it into fixed ``capacity``-token
    context windows; report, per document, which windows it lands in.

    Returns ``(doc_id, n_tokens, first_window, last_window, n_windows,
    spans_boundary)``. Empty documents are dropped (they occupy no
    window), matching what a real packer does.

    Scale shape — the block-prefix-sum pattern: a naive global running
    sum is a single-partition window (the classic scale killer), so
    instead documents are range-blocked by ``id div block``; token
    sums aggregate per block, the block offsets are a window over the
    tiny block table (rows = n_docs/block — driver-bounded the same way
    the PCA partials are), and each document's global start offset is
    its within-block running sum plus its block's offset [windows
    partitioned by block — parallel]. Token counts come from one regexp
    pass over the scan (no explode).

    The regexp scan runs ONCE: both the per-document branch and the
    block-totals branch hang off the same windowed subtree — the block
    total is a whole-partition window evaluated in the same Window pass
    as the prefix sum, so the two consumers share one identical
    Exchange and Spark's exchange reuse (ReusedExchange in the physical
    plan) serves the shuffle output to both instead of re-running the
    scan + regexp per branch (the r4 shape paid the scan twice: 1.18 s
    → this shape 0.7 s at sf0.1, and at 100 TB the doubled scan is the
    difference between one and two passes over the corpus).
    """
    from pyspark.sql import Window

    from hw_kafka_streams_spark.operators.text import token_count

    dl = (
        df.select(
            F.col(id_col).alias("id"),
            token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
        .withColumn("blk", F.expr(f"id div {block}"))
    )
    w_doc = (
        Window.partitionBy("blk")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy("blk")
    local = dl.select(
        "id",
        "n_tokens",
        "blk",
        F.coalesce(F.sum("n_tokens").over(w_doc), F.lit(0)).alias("_loc"),
        F.sum("n_tokens").over(w_all).alias("_bsum"),
    )
    # block totals: groupBy on the already-blk-partitioned window output
    # (no new exchange; the shared subtree's exchange is reused)
    bsums = local.groupBy("blk").agg(F.max("_bsum").alias("bsum"))
    # tiny block table: intentionally single-partition (see winutil)
    w_blk = Window.partitionBy(tiny_table_partition("blk")).orderBy(
        "blk"
    ).rowsBetween(Window.unboundedPreceding, -1)
    boff = bsums.select(
        "blk", F.coalesce(F.sum("bsum").over(w_blk), F.lit(0)).alias("blk_off")
    )
    packed = (
        local.join(F.broadcast(boff), "blk")
        .withColumn("start", F.col("blk_off") + F.col("_loc"))
        .withColumn("first_window", F.expr(f"start div {capacity}"))
        .withColumn("last_window", F.expr(f"(start + n_tokens - 1) div {capacity}"))
    )
    return packed.select(
        F.col("id").alias(id_col),
        "n_tokens",
        "first_window",
        "last_window",
        (F.col("last_window") - F.col("first_window") + 1).alias("n_windows"),
        (F.col("last_window") != F.col("first_window")).alias("spans_boundary"),
    )
