"""Multi-touch conversion attribution over an event stream.

The reference (svolga/hw-kafka-streams) has no analytics surface; this
is an engine extension in the behavioral-analytics family
(sessionization, funnels) — distributing each conversion's value over
the touches that preceded it, per attribution model.

Scale shape: the touch→conversion assignment is ONE user-partitioned
window pass (no self-join, no as-of join): walk the user's events in
REVERSE time order carrying the last-seen conversion, so every touch
picks up the nearest FOLLOWING conversion — at most one window row per
event. Credit splitting then ranks touches inside their (user,
conversion) group — bounded by touches between two conversions. This
is the same per-user window shape as sessionize; a pathological
million-event user is the known skew case there and here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def touch_attribution(
    events: DataFrame,
    touch_types: tuple[str, ...] = ("view", "click", "signup"),
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-channel attribution report under two models at once:

    - linear: each of a conversion's n preceding touches gets value/n;
    - position (U-shaped): first 40%, last 40%, middle split the 20%
      (n=1 → 100%, n=2 → 50/50).

    A touch belongs to the nearest conversion strictly after it in the
    (ts, event_id) total order; touches after a user's final conversion
    earn nothing. Returns one row per touch channel: touch count,
    distinct conversions reached, and both credit totals.

    Determinism: per-touch credits are scalar IEEE expressions rounded
    to DECIMAL(18,6) and summed exactly, so reducer order cannot
    drift the totals (the BM25/regression recipe).
    """
    ev = events.filter(
        F.col(type_col).isin([*touch_types, conversion_type])
    ).select(user_col, ts_col, type_col, value_col, id_col)
    # reverse-chronological walk: the last non-null conversion marker
    # seen so far IS the nearest following conversion
    w_desc = (
        Window.partitionBy(user_col)
        .orderBy(F.desc(ts_col), F.desc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marker = F.when(
        F.col(type_col) == conversion_type,
        F.struct(
            F.col(ts_col).alias("p_ts"),
            F.col(id_col).alias("p_id"),
            F.col(value_col).alias("p_value"),
        ),
    )
    touches = (
        ev.withColumn("p", F.last(marker, ignorenulls=True).over(w_desc))
        .filter(F.col(type_col).isin(list(touch_types)) & F.col("p").isNotNull())
        .select(
            user_col,
            ts_col,
            id_col,
            type_col,
            F.col("p.p_id").alias("p_id"),
            F.col("p.p_value").alias("p_value"),
        )
    )
    wg = Window.partitionBy(user_col, "p_id")
    wr = wg.orderBy(ts_col, id_col)
    n = F.count(F.lit(1)).over(wg)
    rn = F.row_number().over(wr)
    position = (
        F.when(n == 1, F.lit(1.0))
        .when(n == 2, F.lit(0.5))
        .when(rn == 1, F.lit(0.4))
        .when(rn == n, F.lit(0.4))
        .otherwise(F.lit(0.2) / (n - 2))
    )
    credited = touches.select(
        type_col,
        "p_id",
        F.round(F.col("p_value") / n, 6).cast("decimal(18,6)").alias("lin"),
        F.round(F.col("p_value") * position, 6)
        .cast("decimal(18,6)")
        .alias("pos"),
    )
    return credited.groupBy(type_col).agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.countDistinct("p_id").alias("n_conversions"),
        F.round(F.sum("lin").cast("double"), 4).alias("linear_credit"),
        F.round(F.sum("pos").cast("double"), 4).alias("position_credit"),
    )
