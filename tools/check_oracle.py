"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 on Spark AND its
``oracle_sql()`` on DuckDB, compares row count, schema (column
names), and order-insensitive values (columns sorted by name, rows
sorted). Usage:

    python tools/check_oracle.py [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from graph_data_science_spark.session import get_spark

import os

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0
        return v
    if isinstance(v, bool):
        return bool(v)
    return v


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out, [cols[i] for i in order]


def main() -> int:
    only = set(sys.argv[1:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    spark = get_spark("oracle-check")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures.append(name)
            continue
        spark_s = time.monotonic() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows={len(srows)} (no oracle — rows-only) "
                  f"[{spark_s:.1f}s]")
            if len(srows) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            drows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            failures.append(name)
            continue
        sn, sc = normalize(srows, scols)
        dn, dc = normalize(drows, dcols)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duckdb={dc}")
            failures.append(name)
            continue
        if len(sn) != len(dn):
            print(f"FAIL {name}: rowcount spark={len(sn)} duckdb={len(dn)}")
            failures.append(name)
            continue
        bad = None
        for i, (a, b) in enumerate(zip(sn, dn)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            print(f"FAIL {name}: first value diff at sorted-row {bad[0]}:")
            print(f"  spark : {bad[1]}")
            print(f"  duckdb: {bad[2]}")
            failures.append(name)
        else:
            print(f"PASS {name}: rows={len(sn)} [{spark_s:.1f}s]")
    print("----")
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all checked queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
