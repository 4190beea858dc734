"""Bucketed tables: shuffle-free co-located joins and aggregations.

At 100 TB, the single biggest join lever after broadcasting is not
shuffling at all: persist both sides bucketed by the join key
(`bucketBy(n, key)` + `saveAsTable`), and Spark's scan reports a
hash-partitioned output — the sort-merge/hash join then runs with NO
exchange on either side. Same for `groupBy(key)` on one bucketed
table. The cost is paid once at write time and amortized over every
downstream join/agg on that key (the classic warehouse layout for fact
tables joined on the same key daily).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally sort-merged) table.

    ``n_buckets`` should track the join parallelism you want at read
    time (≈ cluster cores for the hot path); sorting within buckets
    additionally removes the sort from future sort-merge joins.
    """
    spark = df.sparkSession
    if mode == "overwrite":
        # saveAsTable(overwrite) still fails on a stale warehouse dir
        # left by a previous session (location exists, catalog entry
        # doesn't) — drop both explicitly for idempotence.
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        path = os.path.join(warehouse.removeprefix("file:"), table.lower())
        shutil.rmtree(path, ignore_errors=True)
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a saved (bucketed) table — bucket metadata flows into the plan."""
    return spark.table(table)
