"""Driver-mimic: run every registered query in Spark AND its DuckDB
oracle on the same parquet, compare row-count + schema + sorted values.

Usage: python tools/oracle_check.py [sf_dir] [query ...]

Replicates the driver's t2 gate locally (order-insensitive,
column-name-sorted, string-normalized compare) so oracle mismatches
are caught before a round ends. Importable from tests.
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)
    return out


def compare_query(spark, con, fn, oracle: str, sf_dir: str) -> list[str]:
    """Run one query both ways; return a list of mismatch messages."""
    sdf = fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    drel = con.execute(oracle)
    dcols = [d[0] for d in drel.description]
    drows = drel.fetchall()
    msgs: list[str] = []
    if sorted(scols) != sorted(dcols):
        msgs.append(f"schema: spark={sorted(scols)} duckdb={sorted(dcols)}")
    if len(srows) != len(drows):
        msgs.append(f"rowcount: spark={len(srows)} duckdb={len(drows)}")
    if not msgs:
        sn = _norm_rows(scols, srows)
        dn = _norm_rows(dcols, drows)
        if sn != dn:
            diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            msgs.append(f"values differ, first diffs: {diff}")
    return msgs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from hw_kafka_streams_spark.session import get_spark

    spark = get_spark("oracle_check")
    con = duckdb_con(sf_dir)

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            n = fn(spark, sf_dir).count()
            print(f"  {name:40s} rows-only ({n} rows)")
            continue
        msgs = compare_query(spark, con, fn, oracles[name], sf_dir)
        print(f"  {name:40s} {'OK' if not msgs else 'MISMATCH'}")
        for m in msgs:
            print(f"      {m}")
        if msgs:
            failures.append(name)

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
