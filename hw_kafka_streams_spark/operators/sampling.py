"""Dataset splitting & sampling for training-data pipelines.

The split primitive a 100 TB corpus needs is DETERMINISTIC and
CONTENT-STABLE: re-running the pipeline (or adding shards) must not
move a document across the train/eval boundary. Hence hash-based
assignment on a stable key — never `rand()` (changes per run) and
never `randomSplit` (partition-order sensitive).

All JVM-side: xxhash64 → bucket in [0, denom) → range per split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(
    key: Column | str, denom: int = 10_000, seed: int = 42, hash_mode: str = "xxhash64"
) -> Column:
    """Stable bucket in [0, denom) from a key column.

    ``hash_mode='md5'`` buckets on the DuckDB-reproducible
    :func:`~hw_kafka_streams_spark.operators.dedup.md5h` of
    ``key:seed`` so split stats can be value-hash oracled; xxhash64
    stays the scale default (native, no string round-trip).
    """
    col = F.col(key) if isinstance(key, str) else key
    if hash_mode == "md5":
        from hw_kafka_streams_spark.operators.dedup import md5h

        return F.pmod(md5h(F.concat(col.cast("string"), F.lit(f":{seed}"))), F.lit(denom))
    return F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(denom))


def hash_split(
    df: DataFrame,
    key: str,
    fractions: dict[str, float],
    seed: int = 42,
    hash_mode: str = "xxhash64",
) -> dict[str, DataFrame]:
    """Split ``df`` into named parts by hashing ``key``.

    ``fractions`` e.g. {"train": 0.98, "eval": 0.01, "test": 0.01}
    (must sum to ≤ 1; remainder is dropped). Each part is a filter over
    the same scan — no shuffle, no materialization, stable across runs
    and cluster sizes.
    """
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    denom = 10_000
    bucket = hash_bucket(key, denom, seed, hash_mode)
    out: dict[str, DataFrame] = {}
    lo = 0
    for name, frac in fractions.items():
        hi = lo + int(round(frac * denom))
        out[name] = df.filter((bucket >= lo) & (bucket < hi))
        lo = hi
    return out


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sampling (`sampleBy`): cheap class
    rebalancing, e.g. downsampling an over-represented language."""
    return df.sampleBy(strata_col, fractions, seed)


def reservoir_per_key(
    df: DataFrame, key_col: str, n: int, order_hint: str | None = None
) -> DataFrame:
    """Deterministic k-per-key sample: rank by a stable hash of the row's
    id (or ``order_hint``) within each key, keep the first n. One
    shuffle on key; the per-group top-n avoids a full sort via
    WindowGroupLimit pushdown."""
    from pyspark.sql import Window

    order = F.xxhash64(F.col(order_hint)) if order_hint else F.xxhash64(*df.columns)
    w = Window.partitionBy(key_col).orderBy(order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
