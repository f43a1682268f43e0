"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 on Spark AND its
``oracle_sql()`` on DuckDB, compares row count, schema (column
names), declared column TYPES (serialization families — catches
DuckDB's integer-SUM → HUGEINT promotion that a plain Python-int
comparison cannot see but the driver's typed hasher does), and
order-insensitive values (columns sorted by name, rows sorted).
Usage:

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


def type_family(t: str) -> str:
    """Collapse a type name (Spark dtype or DuckDB declared type) to the
    serialization family the driver's typed hasher distinguishes.

    The one family deliberately NOT merged into ``int`` is DuckDB's
    HUGEINT (int128, the implicit promotion of an uncast integer SUM)
    and DECIMAL — both serialize differently from Spark's BIGINT in the
    driver's hash even when the values are equal, which is exactly the
    r4 ``bpe_train``/``bpe_encode``/``shard_corpus`` failure mode.
    """
    t = t.strip().lower()
    if t.startswith(("decimal", "numeric")):
        return "decimal"
    if t in ("hugeint", "int128", "uhugeint"):
        return "hugeint"
    if t in ("tinyint", "smallint", "int", "integer", "bigint", "long",
             "short", "byte", "utinyint", "usmallint", "uinteger",
             "ubigint", "int1", "int2", "int4", "int8"):
        return "int"
    if t in ("float", "double", "real", "float4", "float8"):
        return "float"
    if t in ("string", "varchar", "text", "char", "bpchar"):
        return "str"
    if t in ("boolean", "bool"):
        return "bool"
    if t.startswith(("array", "list")) or t.endswith("[]"):
        return "array"
    if t.startswith(("map", "struct", "row")):
        return "nested"
    if t.startswith(("timestamp", "datetime")):
        return "timestamp"
    if t == "date":
        return "date"
    return t


def type_mismatches(scols, stypes, dcols, dtypes):
    """Name→family comparison; returns list of (col, spark, duckdb)."""
    sfam = {c: type_family(t) for c, t in zip(scols, stypes)}
    dfam = {c: type_family(t) for c, t in zip(dcols, dtypes)}
    return [
        (c, sfam[c], dfam[c])
        for c in sorted(set(sfam) & set(dfam))
        if sfam[c] != dfam[c]
    ]


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
    argv = list(sys.argv[1:])
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
            print("usage: check_oracle.py [--json OUT.json] [query ...]")
            return 2
        json_path = argv[i + 1]
        del argv[i : i + 2]
    only = set(argv)
    results: dict[str, dict] = {}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    spark = get_spark("oracle-check")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []

    def record(name, *, rows_match, schema_match, hash_match, spark_rows,
               oracle_rows, err, sec, type_match=None, oracle_types=None):
        results[name] = {
            "rows_match": rows_match,
            "schema_match": schema_match,
            "type_match": type_match,
            "hash_match": hash_match,
            "spark_rows": spark_rows,
            "oracle_rows": oracle_rows,
            "oracle_types": oracle_types,
            "err": err,
            "spark_sec": round(sec, 2),
        }

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            stypes = [t for _, t in sdf.dtypes]
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures.append(name)
            record(name, rows_match=False, schema_match=False, hash_match=False,
                   spark_rows=None, oracle_rows=None,
                   err=f"spark error: {exc}"[:500], sec=time.monotonic() - t0)
            continue
        spark_s = time.monotonic() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows={len(srows)} (no oracle — rows-only) "
                  f"[{spark_s:.1f}s]")
            if len(srows) == 0:
                print(f"WARN {name}: zero rows")
            record(name, rows_match=len(srows) > 0, schema_match=None,
                   hash_match=None, spark_rows=len(srows), oracle_rows=None,
                   err=None if srows else "zero rows (rows-only check)",
                   sec=spark_s)
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            dtypes = [str(t) for t in rel.types]
            drows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            failures.append(name)
            record(name, rows_match=False, schema_match=False, hash_match=False,
                   spark_rows=len(srows), oracle_rows=None,
                   err=f"duckdb error: {exc}"[:500], sec=spark_s)
            continue
        otypes = dict(zip(dcols, dtypes))
        tmis = type_mismatches(scols, stypes, dcols, dtypes)
        if tmis:
            print(f"FAIL {name}: type mismatch (driver-hash-visible): {tmis}")
            failures.append(name)
            record(name, rows_match=len(srows) == len(drows),
                   schema_match=sorted(scols) == sorted(dcols),
                   type_match=False, hash_match=False,
                   spark_rows=len(srows), oracle_rows=len(drows),
                   oracle_types=otypes,
                   err=f"type mismatch: {tmis}"[:500], sec=spark_s)
            continue
        sn, sc = normalize(srows, scols)
        dn, dc = normalize(drows, dcols)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duckdb={dc}")
            failures.append(name)
            record(name, rows_match=len(sn) == len(dn), schema_match=False,
                   type_match=True, hash_match=False,
                   spark_rows=len(sn), oracle_rows=len(dn),
                   oracle_types=otypes,
                   err=f"columns spark={sc} duckdb={dc}"[:500], sec=spark_s)
            continue
        if len(sn) != len(dn):
            print(f"FAIL {name}: rowcount spark={len(sn)} duckdb={len(dn)}")
            failures.append(name)
            record(name, rows_match=False, schema_match=True,
                   type_match=True, hash_match=False,
                   spark_rows=len(sn), oracle_rows=len(dn),
                   oracle_types=otypes, err="rowcount mismatch", sec=spark_s)
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
            record(name, rows_match=True, schema_match=True,
                   type_match=True, hash_match=False,
                   spark_rows=len(sn), oracle_rows=len(dn),
                   oracle_types=otypes,
                   err=f"value diff at sorted-row {bad[0]}", sec=spark_s)
        else:
            print(f"PASS {name}: rows={len(sn)} [{spark_s:.1f}s]")
            record(name, rows_match=True, schema_match=True,
                   type_match=True, hash_match=True,
                   spark_rows=len(sn), oracle_rows=len(dn),
                   oracle_types=otypes, err=None, sec=spark_s)
    print("----")
    if json_path:
        import datetime
        import json as _json

        payload = {
            "sf_dir": SF_DIR,
            "generated_utc": datetime.datetime.now(
                datetime.timezone.utc
            ).isoformat(timespec="seconds"),
            "n_checked": len(results),
            "n_failed": len(failures),
            "failures": failures,
            "queries": results,
        }
        with open(json_path, "w") as fh:
            _json.dump(payload, fh, indent=1)
        print(f"wrote {json_path} ({len(results)} queries)")
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all checked queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
