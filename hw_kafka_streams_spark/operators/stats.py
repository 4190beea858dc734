"""Distributed rank statistics.

The reference (svolga/hw-kafka-streams) has no statistics surface; these
are engine extensions in the same spirit as operators/graph.py — shapes
a 100 TB evaluation pipeline needs, built so the only non-integer math
is a final scalar epilogue (the q_regression_stats / BM25 determinism
recipe).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hw_kafka_streams_spark.operators.winutil import tiny_table_partition


def rank_auc(
    df: DataFrame,
    label_col: str,
    score_col: str,
    block_col: Column | None = None,
) -> DataFrame:
    """Exact ROC-AUC of ``score_col`` predicting boolean ``label_col``
    via the Mann-Whitney U statistic, tie-correct.

    AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻). Computed as

        sum2 = Σ over distinct scores s:  n_pos(s) · (2·cum_neg(<s) + n_neg(s))
        AUC  = sum2 / (2 · N_pos · N_neg)

    — every term integer until the single final division, so the result
    is deterministic across reducer orders and engines.

    Scale shape: a global rank would be a single-partition window (the
    classic scale killer). Instead: group to distinct scores [1
    shuffle], then the block-prefix-sum pattern — scores are range-
    blocked by ``block_col`` (default ``floor(score)``), per-block
    negative counts aggregate to a tiny block table whose running sum
    is the only global window (rows = #blocks, driver-bounded), and
    each score's cumulative-negatives-below is its within-block running
    sum plus its block offset [windows partitioned by block — parallel].

    Returns a 1-row DataFrame ``(n_pos, n_neg, auc)``.
    """
    from pyspark.sql import Window

    if block_col is None:
        block_col = F.floor(F.col("score"))

    per_score = (
        df.select(
            F.col(score_col).alias("score"),
            F.col(label_col).cast("boolean").alias("label"),
        )
        .groupBy("score")
        .agg(
            F.sum(F.col("label").cast("long")).alias("np"),
            F.sum((~F.col("label")).cast("long")).alias("nn"),
        )
        .withColumn("blk", block_col)
    )
    bsums = per_score.groupBy("blk").agg(F.sum("nn").alias("bn"))
    # tiny block table: intentionally single-partition (see winutil)
    w_blk = Window.partitionBy(tiny_table_partition("blk")).orderBy(
        "blk"
    ).rowsBetween(Window.unboundedPreceding, -1)
    boff = bsums.select(
        "blk", F.coalesce(F.sum("bn").over(w_blk), F.lit(0)).alias("blk_off")
    )
    w_s = (
        Window.partitionBy("blk")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = per_score.join(F.broadcast(boff), "blk").withColumn(
        "cum_neg_below",
        F.col("blk_off") + F.coalesce(F.sum("nn").over(w_s), F.lit(0)),
    )
    return cum.agg(
        F.sum("np").alias("n_pos"),
        F.sum("nn").alias("n_neg"),
        F.sum(F.col("np") * (2 * F.col("cum_neg_below") + F.col("nn"))).alias("sum2"),
    ).select(
        "n_pos",
        "n_neg",
        F.round(
            F.col("sum2") / (2.0 * F.col("n_pos") * F.col("n_neg")), 6
        ).alias("auc"),
    )
