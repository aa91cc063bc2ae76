"""DuckDB comparator timings — the BASELINE.md measurement protocol.

Runs every ``oracle_sql()`` statement in-process on the same parquet
fixtures bench.py uses and prints one JSON line {query: best_sec}.
Queries without an oracle (rows-only) are reported as null.

Usage: python tools/bench_duckdb.py [--sf /root/testdata/sf0.1] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from trafsys_data_transfer_spark.schemas import FIXTURE_TABLES


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )
    oracles = entrymod.oracle_sql()
    out: dict[str, float | None] = {}
    for name in entrymod.queries():
        sql = oracles.get(name)
        if sql is None:
            out[name] = None
            continue
        best = None
        for _ in range(args.runs):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 4)
    print(json.dumps({"sf_dir": args.sf, "runs": args.runs, "queries": out}))


if __name__ == "__main__":
    main()
