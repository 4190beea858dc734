"""Interval (temporal) overlap joins at scale.

A naive overlap join — ``a.start <= b.end AND b.start <= a.end`` — is a
theta join: Spark can only nested-loop it (quadratic, the planner's
BroadcastNestedLoopJoin at best). The scalable shape is BUCKET
BLOCKING: map every interval to the fixed-width time buckets it
touches, equi-join on the bucket, verify the exact overlap predicate,
and dedupe pairs that met in several buckets. Cost is
O(total bucket-touches + true matches) — linear in data for bounded
interval length, the same blocking idea the dedup family uses
(LSH bands, pigeonhole quarters), applied to time.

Bucket width is the knob: too narrow and long intervals explode into
many rows; too wide and each bucket pairs unrelated intervals. Set it
near the typical interval length. Degenerate long intervals (a session
spanning thousands of buckets) are the skew case — cap them upstream
or split the dimension into a long-interval broadcast side, the same
guard pattern as ``max_bucket`` in MinHash-LSH.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_buckets(
    df: DataFrame, start_col: str, end_col: str, width_s: int
) -> DataFrame:
    """Explode each interval row into one row per touched time bucket
    (``bucket = floor(t / width)`` for t across [start, end])."""
    return df.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.expr(f"{start_col} div {width_s}"),
                F.expr(f"{end_col} div {width_s}"),
            )
        ),
    )


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    on: tuple[str, str, str] = ("id", "start_s", "end_s"),
    width_s: int = 3600,
) -> DataFrame:
    """All (a, b) interval pairs that overlap in time, as an equi-join.

    ``a`` and ``b`` need columns ``(id, start_s, end_s)`` (integer
    seconds; rename upstream). Output: a.id AS id1, b.id AS id2 plus
    both intervals. Pairs meeting in several buckets are deduped.
    """
    id_c, s_c, e_c = on
    aa = with_buckets(
        a.select(
            F.col(id_c).alias("id1"),
            F.col(s_c).alias("s1"),
            F.col(e_c).alias("e1"),
        ),
        "s1",
        "e1",
        width_s,
    )
    bb = with_buckets(
        b.select(
            F.col(id_c).alias("id2"),
            F.col(s_c).alias("s2"),
            F.col(e_c).alias("e2"),
        ),
        "s2",
        "e2",
        width_s,
    )
    return (
        aa.join(bb, "bucket")
        .filter((F.col("s1") <= F.col("e2")) & (F.col("s2") <= F.col("e1")))
        .select("id1", "s1", "e1", "id2", "s2", "e2")
        .dropDuplicates(["id1", "id2"])
    )
