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
