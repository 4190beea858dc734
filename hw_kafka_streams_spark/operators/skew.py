"""Skew mitigation: salted joins (and the AQE-first guidance).

First line of defense at scale is AQE (`spark.sql.adaptive.skewJoin`,
on by default in session.py): it splits oversized shuffle partitions at
runtime. Salting is the explicit fallback for the cases AQE can't fix —
e.g. one hot key dominating a shuffle HASH JOIN where the other side
must be replicated to meet it.

``salted_join``: the skewed (big) side gets a random salt in
[0, salt_factor); the small side is exploded ×salt_factor so every
(key, salt) bucket finds its match. The hot key's rows now spread over
``salt_factor`` reducers instead of one. Cost: small side inflated by
×salt_factor — use only when small ≪ big (else broadcast it and skip
salting entirely).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with key salting.

    Deterministic-per-row salt (hash of all big-side columns mod
    factor) rather than rand(): replayable under task retries, no RNG
    state. Output columns = big ∪ (small minus join key), like a plain
    ``join(on=str)``.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_factor))
    b = big.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_factor)]))
    )
    out = b.join(s, [on, "__salt"], how)
    return out.drop("__salt")


def spread_small(df: DataFrame, key: str | None = None) -> DataFrame:
    """Scale-adaptive parallelism floor for heavy per-row stages.

    Parquet scan parallelism is bounded by file splits: a table that
    arrives as a handful of single-row-group files runs its WHOLE scan
    stage — tokenize/explode/hash projections, partial aggregation,
    Python kernels — on that many cores, no matter the cluster size
    (the sf0.1 bench tables are exactly this: one row group each, so
    every scan stage was single-threaded on a 32-core host). This
    helper repartitions up to ``defaultParallelism`` ONLY when the
    input has fewer partitions than that, so:

    - small/local inputs get the cluster's full width for the heavy
      derivation that follows (the exchange moves only the projected
      input rows, which by construction here are tiny);
    - at real scale the scan already has >= defaultParallelism splits
      and this is a NO-OP — no shuffle is added on the 100 TB path
      (the brief's "derive partitioning from input size, never a
      constant tuned for local mode or the cluster").

    ``key`` hashes on a column (deterministic under task retry —
    guide §2.5's warning about rand-derived keys); ``None`` uses
    round-robin, which Spark makes retry-safe via its built-in
    sort-before-repartition.

    Call it AFTER pushdown-able filters (so PushedFilters stay at the
    scan) and BEFORE the expensive derivation.
    """
    n = df.sparkSession.sparkContext.defaultParallelism
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:
        return df
    if cur >= n:
        return df
    return df.repartition(n, F.col(key)) if key else df.repartition(n)
