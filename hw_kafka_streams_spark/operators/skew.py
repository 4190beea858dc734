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

import os
from collections.abc import Sequence

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


def spread_small(
    df: DataFrame, key: str | Sequence[str] | None = None
) -> DataFrame:
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

    ``key`` hashes on a column — or a list of columns, when the
    downstream groupBy is multi-key, so its exchange is reused —
    (deterministic under task retry — guide §2.5's warning about
    rand-derived keys); ``None`` uses round-robin, which Spark makes
    retry-safe via its built-in sort-before-repartition.

    Call it AFTER pushdown-able filters (so PushedFilters stay at the
    scan) and BEFORE the expensive derivation.

    Width probe (round-12 hardening, VERDICT r11 item 9 / ADVICE): the
    previous ``df.rdd.getNumPartitions()`` forced a full
    logical→physical→RDD translation of the upstream plan — file
    listing included — at every call site, at query-CONSTRUCTION time,
    and read the pre-AQE split count. The probe now estimates scan
    width from the relation's already-listed input files
    (``df.inputFiles()`` walks the cached file index; no planning):
    parquet byte-splits cannot subdivide a row group, so effective scan
    parallelism is the source row-group count, read from local footers
    via pyarrow and memoized per file list (the bench re-constructs
    each query several times per timed loop). Anything un-probe-able —
    non-local URIs, many files, Spark Connect, missing footers —
    resolves to "already wide", i.e. the no-op: at 100 TB scale the
    helper never adds a shuffle AND never stalls the driver.
    """
    try:
        n = df.sparkSession.sparkContext.defaultParallelism
        if _probed_scan_width(df) >= n:
            return df
    except Exception:
        return df
    if key is None:
        return df.repartition(n)
    cols = [key] if isinstance(key, str) else list(key)
    return df.repartition(n, *[F.col(c) for c in cols])


#: file-list → row-group-count memo; keyed on the exact file set so a
#: different sf_dir (or a rewritten table) re-probes.
_WIDTH_MEMO: dict[tuple[str, ...], int] = {}

#: At or above this many source files the scan is wide by construction
#: (each file is >= 1 split) and footers are not worth reading.
_MANY_FILES = 64


def _probed_scan_width(df: DataFrame) -> int:
    """Effective scan parallelism of ``df``'s source: total parquet row
    groups across its input files. Returns a large number ("wide — do
    nothing") whenever the answer cannot be established cheaply."""
    files = df.inputFiles()
    if len(files) >= _MANY_FILES:
        return 1 << 30
    if not files:
        # empty relation or a non-file source (rate, memory, ...):
        # nothing to spread
        return 1 << 30
    memo_key = tuple(sorted(files))
    hit = _WIDTH_MEMO.get(memo_key)
    if hit is not None:
        return hit
    total = 0
    for uri in memo_key:
        if uri.startswith("file:"):
            path = uri[len("file://"):] if uri.startswith("file://") \
                else uri[len("file:"):]
        elif uri.startswith("/"):
            path = uri
        else:
            return 1 << 30  # remote store: treat as wide, add nothing
        if not os.path.exists(path):
            return 1 << 30
        import pyarrow.parquet as pq

        total += pq.ParquetFile(path).metadata.num_row_groups
    _WIDTH_MEMO[memo_key] = total
    return total
