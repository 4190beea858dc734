"""Centralized persist lifecycle for library operators.

Several operators persist an intermediate that feeds MULTIPLE branches
of the plan they return (a self-join's both sides, a margins + filter
pair, a max-pass + argmax-pass share). That persist must outlive the
operator call — the caller's terminal action is what consumes it — so
the operator itself cannot unpersist on exit. Left unmanaged, those
cached blocks accumulate without bound across a long-lived session
running many registry queries (the leak tools/scale_probe.py had to
clearCache() around).

The contract:

- operators call :func:`managed_persist` instead of ``df.persist()``;
  the DataFrame is recorded in a session-lifetime registry;
- harness loops (bench.py, tools/oracle_check.py, tools/scale_probe.py)
  call :func:`release_managed_caches` after each query's terminal
  action, returning executor storage to zero between queries;
- long-lived callers embedding an operator's result can call it at
  their own checkpoint boundaries — unpersisting a DataFrame whose
  cache a still-pending plan references is SAFE in Spark (the branch
  recomputes), so releasing is never a correctness risk, only a
  recompute risk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pyspark.storagelevel import StorageLevel

_MANAGED: list[DataFrame] = []


def managed_persist(df: DataFrame, level: StorageLevel | None = None) -> DataFrame:
    """Persist ``df`` and record it for session-scoped cleanup."""
    out = df.persist() if level is None else df.persist(level)
    _MANAGED.append(out)
    return out


def release_managed_caches() -> int:
    """Unpersist every managed DataFrame recorded since the last call.

    Returns the number released. Safe at any time: a pending plan that
    still references a released cache silently recomputes that branch.
    """
    n = 0
    while _MANAGED:
        df = _MANAGED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n
