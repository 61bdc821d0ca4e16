#!/usr/bin/env python
"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry at sf0.01 and compares against
``oracle_sql()`` via DuckDB: row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted,
floats repr'd). Queries without oracle SQL get a rows-only check.

Usage: python tools/check_correctness.py [name ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from kubernetes_logs_datalake_spark import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def norm_lines(cols: list[str], rows: list[tuple]) -> list[str]:
    """The ONE normalization (sort columns by name, normalize cells,
    sort rows) shared by the hash and the failure-diff sample — so the
    printed diff always corresponds to what was hashed."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("\x1f".join(norm_cell(r[i]) for i in order) for r in rows)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    h = hashlib.sha256()
    for line in norm_lines(cols, rows):
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    only = set(sys.argv[1:])
    known = set(entrymod.queries())
    unknown = only - known
    if unknown:
        # a typo'd name must never produce a zero-check green result
        print(f"unknown query name(s): {sorted(unknown)}", file=sys.stderr)
        return 2
    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            cols = sdf.columns
            rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(rows)} rows (rows-only, {time.time()-t0:.1f}s)")
            continue
        try:
            # fetch via Arrow — the closest public analog of whatever
            # pandas/arrow path the driver uses, so type hazards (HUGEINT
            # → decimal128/float64) surface locally instead of driver-side
            otbl = con.execute(oracles[name]).arrow()
            ocols = otbl.column_names
            orows = [
                tuple(d[c] for c in ocols) for d in otbl.to_pylist()
            ]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            failures.append(name)
            continue
        problems = []
        # output-type lint: DECIMAL (incl. HUGEINT's decimal128 export)
        # stringifies differently across engines/paths — ban it in oracle
        # outputs; require clean BIGINT/DOUBLE/VARCHAR/BOOL/DATE/TS.
        import pyarrow as pa  # noqa: PLC0415

        for field in otbl.schema:
            if pa.types.is_decimal(field.type):
                problems.append(
                    f"oracle col {field.name} has decimal type {field.type} "
                    "(likely HUGEINT sum) — CAST it in the oracle SQL"
                )
        for f_name, f_type in sdf.dtypes:
            if f_type.startswith("decimal"):
                problems.append(
                    f"spark col {f_name} is {f_type} — cast to double/long"
                )
        if sorted(cols) != sorted(ocols):
            problems.append(f"cols spark={sorted(cols)} duckdb={sorted(ocols)}")
        if len(rows) != len(orows):
            problems.append(f"rowcount spark={len(rows)} duckdb={len(orows)}")
        if not problems:
            hs, ho = value_hash(cols, rows), value_hash(ocols, orows)
            if hs != ho:
                problems.append(f"valuehash {hs} != {ho}")
                # show a diff sample (same normalization as the hash)
                ls = norm_lines(cols, rows)
                lo = norm_lines(ocols, orows)
                for a, b in zip(ls, lo):
                    if a != b:
                        problems.append(f"  spark : {a[:160]}")
                        problems.append(f"  duckdb: {b[:160]}")
                        break
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(f"      {p}")
            failures.append(name)
        else:
            print(f"ok    {name}: {len(rows)} rows match ({time.time()-t0:.1f}s)")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
