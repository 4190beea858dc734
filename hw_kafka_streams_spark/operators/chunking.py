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
