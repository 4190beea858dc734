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


def test_oracle_output_types_hashable(con):
    """No oracle may emit HUGEINT or nested output columns.

    DuckDB HUGEINT reaches pandas as float64, flipping the driver's raw
    cell hash against Spark's int (the q_table_diff failure,
    CORRECTNESS_r02); nested cells crash the canonicalizer. Lazily binds
    all oracles — cheap, runs on every CI pass.
    """
    from oracle_check import lint_oracle_types

    oracles = {n: q.oracle for n, q in REGISTRY.items() if q.oracle is not None}
    bad = lint_oracle_types(con, oracles)
    assert not bad, f"oracles with unhashable output types: {bad}"


def test_oracle_policy_total():
    """Kill the stale-docstring class (VERDICT r6+r7): every registered
    query carries an oracle, and NO query-module docstring may carry a
    hand-maintained "N/N" registry count that disagrees with the live
    registry. Modules should cite this test / QUERIES.md instead of a
    literal number."""
    import importlib
    import pkgutil
    import re

    import hw_kafka_streams_spark.queries as qpkg

    total = len(REGISTRY)
    oracled = len(_ORACLE_QUERIES)
    assert oracled == total, (
        f"oracle policy broken: {oracled}/{total} queries oracled"
    )
    stale = []
    # Anchored to registry-count CONTEXT: only flag "N/M" ratios whose
    # sentence talks about queries/oracles/registry — a bare \d+/\d+
    # would false-positive on benign docstring ratios like "24/7" or
    # "16/44 kHz" (ADVICE r8).
    ratio_in_context = re.compile(
        r"\b(\d{2,})/(\d{2,})\b(?=[^.]*\b(?:quer|oracl|registr)\w*)"
        r"|\b(?:quer|oracl|registr)\w*[^.]*?\b(\d{2,})/(\d{2,})\b",
        re.IGNORECASE,
    )
    for mod in pkgutil.iter_modules(qpkg.__path__):
        m = importlib.import_module(f"{qpkg.__name__}.{mod.name}")
        doc = m.__doc__ or ""
        for g in ratio_in_context.findall(doc):
            a, b = (g[0], g[1]) if g[0] else (g[2], g[3])
            if int(a) != total or int(b) != total:
                stale.append(f"{mod.name}: {a}/{b} (registry is {total})")
    # README ships a registry count too — the docstring sweep missed it
    # in round 9 (README said 368 while the registry was 373)
    import os

    readme = os.path.join(os.path.dirname(os.path.dirname(__file__)), "README.md")
    with open(readme, encoding="utf-8") as fh:
        for i, line in enumerate(fh, 1):
            m2 = re.search(r"registry: (\d+) operators", line)
            if m2 and int(m2.group(1)) != total:
                stale.append(
                    f"README.md:{i}: {m2.group(1)} (registry is {total})"
                )
    assert not stale, f"stale registry counts in docstrings: {stale}"


def test_every_headline_query_has_sf1_probe_row():
    """Headline-coverage lint (VERDICT r10 item 7): every query in the
    bench headline set must have (a) an sf1 probe row in SCALING.md and
    (b) a PROBES + NOTES entry in tools/sf1_probe.py, so no headline
    shape ships without a one-decade growth measurement and its
    adjudication."""
    import os
    import re

    root = os.path.dirname(os.path.dirname(__file__))
    sys.path.insert(0, root)
    from bench import HEADLINE  # noqa: E402
    from sf1_probe import NOTES, PROBES  # noqa: E402

    with open(os.path.join(root, "SCALING.md"), encoding="utf-8") as fh:
        md = fh.read()
    missing_rows = [
        q for q in HEADLINE if not re.search(r"\|\s*" + re.escape(q) + r"\s*\|", md)
    ]
    assert not missing_rows, f"headline queries without SCALING.md rows: {missing_rows}"
    # every sf1 probe must carry its adjudication note
    missing_note = [q for q in PROBES if q not in NOTES]
    assert not missing_note, f"sf1_probe PROBES without NOTES entries: {missing_note}"
