"""Incremental aggregate maintenance (continuous-aggregate / hypertable
rollup pattern).

The reference's state stores update incrementally per record
(KafkaStreamApp.java's GlobalKTables); the batch analog at 100 TB is a
materialized aggregate that folds in each new partition of data WITHOUT
rescanning history. That only works for aggregates with a mergeable
partial state — count/sum/min/max (algebraic) here; the sketch family
(hll_union_agg, kll_merge_agg, theta_union_agg — see
queries/timeseries_q.py) extends the same contract to distinct counts,
quantiles, and set algebra.

Contract: ``rollup_state(delta) ⊕ base_state == rollup_state(base ∪
delta)`` where ⊕ is ``merge_rollups``. The registry query proves it
against a full-recompute oracle. Sums accumulate as DECIMAL so the
merge is bit-exact regardless of partition order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATE_COLS = ("n_rows", "sum_v", "min_v", "max_v")


def rollup_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Aggregate ``df`` to the mergeable per-key state."""
    v = F.col(value_col).cast("decimal(18,6)")
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(v).alias("sum_v"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
    )


def merge_rollups(base: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """Fold a delta state into a base state: one union + one re-aggregate
    on the SAME key partitioning (a key absent from one side passes
    through; a key in both merges). Cost is O(|base_keys| + |delta|),
    independent of how many raw rows ever built ``base`` — that
    history-independence is the entire point.
    """
    both = base.select(*keys, *STATE_COLS).unionByName(
        delta.select(*keys, *STATE_COLS)
    )
    return both.groupBy(*keys).agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def rollup_state_from_changelog(
    changelog: DataFrame,
    keys: list[str],
    value_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Signed (retractable) rollup state from a CDC changelog: inserts
    ('I') contribute +1/+v, deletes ('D') contribute -1/-v. count and
    sum stay exact under retraction; min/max are NOT retractable (a
    deleted extremum can't be repaired without history), so this state
    carries only the invertible aggregates — the standard split between
    retractable and non-retractable aggregates in incremental view
    maintenance.
    """
    is_del = F.col(op_col) == "D"
    v = F.col(value_col).cast("decimal(18,6)")
    # Negate-by-branch, not multiply: keeps the addend at decimal(18,6)
    # (a sign*value product would widen the scale and change the string
    # form of the final sum vs a plain-aggregate oracle).
    return changelog.groupBy(*keys).agg(
        F.sum(F.when(is_del, F.lit(-1)).otherwise(F.lit(1))).alias("n_rows"),
        F.sum(F.when(is_del, -v).otherwise(v)).alias("sum_v"),
    )


def apply_changelog_to_rollup(
    base: DataFrame,
    changelog_delta: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Fold a signed changelog delta into a (count, sum) rollup WITHOUT
    rescanning history: union + re-aggregate on the key partitioning,
    then drop keys whose live row count reached zero (the materialized-
    view retraction contract: deleting a group's last row removes the
    group, exactly as a full recompute would).

    Contract (oracle-proven in the registry):
    ``apply(state(old_rows), changelog(delta)) == state(live rows)``
    where live = old ∪ inserts − deletes.
    """
    cols = ("n_rows", "sum_v")
    both = base.select(*keys, *cols).unionByName(
        changelog_delta.select(*keys, *cols)
    )
    return (
        both.groupBy(*keys)
        .agg(F.sum("n_rows").alias("n_rows"), F.sum("sum_v").alias("sum_v"))
        .filter(F.col("n_rows") > 0)
    )


def join_view_delta(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: list[str],
) -> DataFrame:
    """Incremental JOIN-view maintenance: the delta of the materialized
    view ``(A ∪ ΔA) ⋈ (B ∪ ΔB)`` over ``A ⋈ B``, computed WITHOUT
    re-joining history with itself:

        ΔV = ΔA ⋈ B ∪ A ⋈ ΔB ∪ ΔA ⋈ ΔB

    (the standard delta-rule for inner joins; insert-only deltas here —
    deletions ride the changelog path in apply_changelog_to_rollup).
    At 100 TB the three branches each have a SMALL side (the delta), so
    every join broadcasts or prunes where the naive full re-join
    shuffles both complete inputs; history (A ⋈ B, the expensive part)
    is never recomputed. The registry query proves ΔV equals the
    recompute-minus-old definition via its oracle.
    """
    return (
        a_delta.join(b_old, on)
        .unionByName(a_old.join(b_delta, on))
        .unionByName(a_delta.join(b_delta, on))
    )
