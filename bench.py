"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Methodology (protocol details in BASELINE.md):

* ``queries``  — per-query wall seconds, best of BENCH_RUNS executions,
  each execution REBUILDING the DataFrame from the registry exactly as the
  driver does.  This includes the ~0.3–0.5 s Py4J + Catalyst plan-build
  constant per call, and is directly comparable to rounds 1–2.
* ``queries_exec`` — for side-effect-free queries only: collect() time of
  a FRESH build whose analysis/optimization/physical planning was forced
  beforehand (``queryExecution().executedPlan()``).  A fresh build per
  run means fresh RDD lineage — no cross-run shuffle-file reuse, so this
  is true end-to-end execution, minus only the per-call planning constant.
  Execution is what scales with data volume; the planning floor does not,
  which is why the ``queries``→``queries_exec`` gap is irrelevant at
  100 TB.  Work-in-build queries (streaming drains, bucketed writes,
  compaction, IVF training, iterative components) are excluded — their
  build IS the work, so planning and execution are not separable.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from trafsys_data_transfer_spark.registry import all_queries
from trafsys_data_transfer_spark.session import get_spark

BENCH_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

#: Queries whose build() itself performs the measured work (Spark actions,
#: table/file writes, streaming lifecycles).  For these, rebuild-per-run is
#: the only honest timing; a steady-state re-collect would measure a
#: memory-sink read, not the operator.
WORK_IN_BUILD = {
    "streaming_hourly_rollup",
    "streaming_dedup_events",
    "streaming_view_click_join",
    "streaming_merge_restate",
    "streaming_sessionize",
    "streaming_session_window",
    "streaming_enrich_join",
    "layout_compaction",
    "layout_zorder",
    "bucketed_colocated_join",
    "sim_topk_ivf",
    "sim_topk_pq",
    "dedup_components",
    "dedup_neardup_pipeline",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    specs = all_queries()

    # Warm the JVM / parquet footers so per-query numbers reflect steady
    # state, not first-touch costs.
    specs["flagship_revenue_topk"].build(spark, sf_dir).collect()
    # Also warm the Arrow/Pandas-UDF worker pool: the first Python stage of
    # the session forks 32 workers that each import numpy/pandas — ~10 s of
    # one-time cost that would otherwise be billed to whichever UDF query
    # runs first.  A tiny-sf MinHash pass spawns them all.
    specs["dedup_minhash_lsh"].build(spark, "/root/testdata/sf0.001").collect()

    timings: dict[str, float] = {}
    exec_only: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, spec in specs.items():
        best = None
        e_best = None
        measurable = name not in WORK_IN_BUILD
        # Work-in-build queries (streaming lifecycles, index builds,
        # iterative jobs) pay their full cost on EVERY run — cap them at
        # best-of-2 so the suite stays inside the driver's time budget.
        runs = BENCH_RUNS if measurable else min(BENCH_RUNS, 2)
        try:
            for _ in range(runs):
                t0 = time.perf_counter()
                df = spec.build(spark, sf_dir)
                if measurable:
                    # Force analysis → optimization → physical planning now so
                    # the collect below times execution alone.  Fresh build per
                    # run = fresh RDD lineage = no shuffle-file reuse.
                    df._jdf.queryExecution().executedPlan()
                    t1 = time.perf_counter()
                    df.collect()
                    t2 = time.perf_counter()
                    e_best = (t2 - t1) if e_best is None else min(e_best, t2 - t1)
                    took = t2 - t0
                else:
                    df.collect()
                    took = time.perf_counter() - t0
                best = took if best is None else min(best, took)
        except Exception as exc:  # noqa: BLE001 — one broken query must not
            # zero the whole bench: record and keep measuring the rest.
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"bench: {name} FAILED: {errors[name]}", file=sys.stderr)
            continue
        timings[name] = round(best, 4)
        if e_best is not None:
            exec_only[name] = round(e_best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_exec": exec_only,
                "exec_total_sec": round(sum(exec_only.values()), 4),
                "bench_runs": BENCH_RUNS,
                "errors": errors,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
