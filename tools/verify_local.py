"""Local replica of the driver's correctness gate — STRICT.

Runs every ``queries()`` entry from ``__spark_entry__`` at a given sf and
compares against its ``oracle_sql()`` via DuckDB: row count, column names,
and order-insensitive STRICT value comparison.  The round-1 lesson
(VERDICT.md "What's wrong" #1) is that normalising representations hides
exactly the mismatches the driver's hash catches: DuckDB returns integer
SUMs as HUGEINT (→ Decimal/float64 through Arrow/pandas) where Spark
returns int64.  So the oracle side is fetched THROUGH ARROW (the lossy
conversion the driver plausibly uses) and cells must match on both type
class and value — an int on one side and a Decimal/float on the other is
a failure even when numerically equal.  Fix the oracle SQL (CAST ... AS
BIGINT, explicit timestamp casts), never the comparator.

Usage:  python tools/verify_local.py [--sf /root/testdata/sf0.01] [--only name ...]
"""

from __future__ import annotations

import argparse
import datetime as dt
import decimal
import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from trafsys_data_transfer_spark.schemas import FIXTURE_TABLES
from trafsys_data_transfer_spark.session import get_spark


def _norm_cell(v):
    """Strict cell signature: (type-tag, canonical value).

    Two cells compare equal only when both the type class and the value
    agree — matching the bit-level discipline of the driver's value hash.
    """
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, float):
        return ("float", "nan" if math.isnan(v) else repr(v))
    if isinstance(v, decimal.Decimal):
        return ("decimal", str(v))
    if isinstance(v, dt.datetime):
        return (
            "timestamp",
            v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds"),
        )
    if isinstance(v, dt.date):
        return ("date", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("array", tuple(_norm_cell(x) for x in v))
    if isinstance(v, dict):
        return (
            "map",
            tuple(sorted((k, _norm_cell(x)) for k, x in v.items())),
        )
    if isinstance(v, (bytes, bytearray)):
        return ("binary", bytes(v))
    return (type(v).__name__, v)


def _rows_to_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    spark = get_spark("verify-local")
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.only or list(qs)
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL  {name}: spark raised\n{traceback.format_exc()}")
            failures.append(name)
            continue
        took = time.time() - t0
        if name not in oracles:
            print(f"ok    {name}: rows-only ({len(srows)} rows, {took:.1f}s)")
            continue
        try:
            # Fetch through Arrow — the conversion layer the driver's
            # DuckDB comparison plausibly goes through.  HUGEINT/DECIMAL
            # survive as Decimal here (and float64 via pandas), so an
            # oracle that isn't CAST to BIGINT fails strict comparison.
            tbl = con.execute(oracles[name]).arrow()
            ocols = tbl.column_names
            # Positional iteration over Arrow columns: a per-row dict
            # (to_pylist) collapses duplicate column names into one key,
            # silently narrowing the rows and misreporting the compare.
            ocols_py = [col.to_pylist() for col in tbl.columns]
            orows = (
                [tuple(vals) for vals in zip(*ocols_py)]
                if ocols_py
                else [() for _ in range(tbl.num_rows)]
            )
        except Exception:
            print(f"FAIL  {name}: duckdb raised\n{traceback.format_exc()}")
            failures.append(name)
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
        if sorted(scols) != sorted(c for c in ocols):
            problems.append(f"columns spark={sorted(scols)} duckdb={sorted(ocols)}")
        if not problems:
            skey = _rows_to_key(srows, scols)
            okey = _rows_to_key(orows, ocols)
            if skey != okey:
                diffs = [
                    (a, b) for a, b in zip(skey, okey) if a != b
                ][:3]
                problems.append(f"values differ; first diffs: {diffs}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"ok    {name}: {len(srows)} rows match ({took:.1f}s)")

    print(f"\n{len(names) - len(failures)}/{len(names)} queries pass")
    if failures:
        print("failing:", ", ".join(failures))
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
