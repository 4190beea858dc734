"""Every registered query with an oracle must match DuckDB at sf0.001.

This mirrors the driver's t2 gate (which runs at sf0.01); sf0.001 keeps
the suite fast. ``tools/oracle_check.py`` runs the sf0.01 version.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from oracle_check import compare_query, duckdb_con  # noqa: E402

from hw_kafka_streams_spark.queries import REGISTRY, _load_all  # noqa: E402

_load_all()
_ORACLE_QUERIES = [name for name, q in REGISTRY.items() if q.oracle is not None]


@pytest.fixture(scope="module")
def con(sf_dir):
    return duckdb_con(sf_dir)


@pytest.mark.parametrize("name", _ORACLE_QUERIES)
def test_oracle_parity(spark, con, sf_dir, name):
    q = REGISTRY[name]
    msgs = compare_query(spark, con, q.fn, q.oracle, sf_dir)
    assert not msgs, f"{name}: {msgs}"


def test_rows_only_queries_return_rows(spark, sf_dir):
    for name, q in REGISTRY.items():
        if q.oracle is None:
            assert q.fn(spark, sf_dir).count() >= 0, name
