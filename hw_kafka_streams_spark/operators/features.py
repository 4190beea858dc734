"""Feature-hashing ("hashing trick") text featurization.

The classic fixed-dimension, vocabulary-free featurizer (Weinberger et
al. 2009, "Feature Hashing for Large Scale Multitask Learning"): each
token hashes to a bucket in [0, dim) and to a ±1 sign; a document's
feature vector is the signed token-count per bucket. No vocabulary
build, no global state — exactly what a 100 TB corpus wants, since the
featurizer is a pure per-row map + a doc-local aggregation (all keys
carry doc_id, so partial aggregation collapses everything map-side and
the shuffles are doc-partitioned, never global).

All hashing is JVM-side; ``hash_mode='md5'`` uses the DuckDB-twin
:func:`~hw_kafka_streams_spark.operators.dedup.md5h` so the registry
query is value-hash oracled (xxhash64 stays the scale default). All
arithmetic is exact-integer until the final per-doc norms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hw_kafka_streams_spark.operators.text import word_tokens


def _bucket_and_sign(token: Column, dim: int, hash_mode: str) -> tuple[Column, Column]:
    if hash_mode == "md5":
        from hw_kafka_streams_spark.operators.dedup import md5h

        h = md5h(token)
        s = md5h(F.concat(F.lit("s|"), token))
    else:
        h = F.abs(F.xxhash64(token, F.lit(1)))
        s = F.abs(F.xxhash64(token, F.lit(2)))
    sign = F.when(F.pmod(s, F.lit(2)) == 0, F.lit(1)).otherwise(F.lit(-1))
    return F.pmod(h, F.lit(dim)), sign


def hashed_features_sparse(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1024,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Sparse hashed-TF features: one row per (doc, bucket) with the
    signed count. The downstream-friendly long form — a model trainer
    or an index builder consumes it without densifying dim columns.

    Plan: tokenize → explode → groupBy(doc, bucket) — one shuffle,
    partial-combined map-side; cardinality ≤ min(doc_tokens, dim) rows
    per document.
    """
    bucket, sign = _bucket_and_sign(F.col("_tok"), dim, hash_mode)
    return (
        df.select(F.col(id_col), F.explode(word_tokens(text_col)).alias("_tok"))
        .select(id_col, bucket.alias("bucket"), sign.alias("_sign"))
        .groupBy(id_col, "bucket")
        .agg(F.sum("_sign").cast("long").alias("weight"))
        .filter(F.col("weight") != 0)
    )


def hashed_features_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1024,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Per-document summary of the hashed feature vector:
    ``(id, nnz, l1, l2, top_bucket, top_weight)`` — nnz/l1 are exact
    integers, l2 is rounded at the output edge, top_bucket is the
    bucket with the largest |weight| (ties → smaller bucket). The
    sanity profile published next to a featurization run (collision
    load factor = nnz vs token count)."""
    sparse = hashed_features_sparse(df, text_col, id_col, dim, hash_mode)
    return sparse.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("nnz"),
        F.sum(F.abs("weight")).cast("long").alias("l1"),
        F.round(F.sqrt(F.sum(F.col("weight") * F.col("weight"))), 4).alias("l2"),
        F.min(
            F.struct(
                (-F.abs(F.col("weight"))).alias("na"),
                F.col("bucket").alias("b"),
            )
        )["b"].alias("top_bucket"),
        F.max(
            F.struct(
                F.abs(F.col("weight")).alias("a"),
                (-F.col("bucket")).alias("nb"),
                F.col("weight").alias("w"),
            )
        )["w"].alias("top_weight"),
    )
