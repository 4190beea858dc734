"""Driver-mimic: run every registered query in Spark AND its DuckDB
oracle on the same parquet, compare row-count + sorted values.

Usage: python tools/oracle_check.py [sf_dir] [query ...]

This replicates the driver's t2 gate locally (order-insensitive,
column-name-sorted, exact string-normalized compare) so oracle
mismatches are caught before a round ends.
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round-trip stable repr; queries already round at the edge
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for _, c in sorted(zip([cols[i] for i in order], [cols[i] for i in order]))], out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from hw_kafka_streams_spark.session import get_spark

    spark = get_spark("oracle_check")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            status = f"rows-only ({len(srows)} rows)"
            print(f"  {name:40s} {status}")
            continue
        drel = con.execute(oracles[name])
        dcols = [d[0] for d in drel.description]
        drows = drel.fetchall()
        ok = True
        msgs = []
        if sorted(scols) != sorted(dcols):
            ok = False
            msgs.append(f"schema: spark={sorted(scols)} duckdb={sorted(dcols)}")
        if len(srows) != len(drows):
            ok = False
            msgs.append(f"rowcount: spark={len(srows)} duckdb={len(drows)}")
        if ok:
            _, sn = _norm_rows(scols, [tuple(r) for r in srows])
            _, dn = _norm_rows(dcols, drows)
            if sn != dn:
                ok = False
                diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
                msgs.append(f"values differ, first diffs: {diff}")
        print(f"  {name:40s} {'OK' if ok else 'MISMATCH'}")
        for m in msgs:
            print(f"      {m}")
        if not ok:
            failures.append(name)

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
