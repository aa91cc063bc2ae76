"""Optimization-round measurement probe (guide §1).

For one or more registered queries, on one long-lived session:

* time build() (plan construction) and a noop-sink execution separately,
  best-of-N, with `setJobDescription` labels;
* dump `.explain("formatted")` to plans/r11/<name>_<tag>.txt.

Usage:
    python tools/opt_probe.py --sf /root/testdata/sf0.1 --runs 3 \
        --tag before query1 query2 ...

Work-in-build queries (bench.WORK_IN_BUILD) are timed rebuild-inclusive
only, exactly like bench.py, because their build IS the work.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import WORK_IN_BUILD  # noqa: E402
from trafsys_data_transfer_spark.registry import all_queries  # noqa: E402
from trafsys_data_transfer_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--tag", default=None, help="suffix for plan dumps")
    ap.add_argument("--plans-dir", default="r12", help="plans/<dir> target")
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark("opt_probe")
    specs = all_queries()
    # Warm JVM + python worker pool the same way bench.py does.
    specs["flagship_revenue_topk"].build(spark, args.sf).collect()
    specs["dedup_minhash_lsh"].build(spark, "/root/testdata/sf0.001").collect()

    # Ambient-contention reference (bench.py's canary protocol): this host
    # shows cross-tenant load spikes that inflate wall numbers 2-8x, so a
    # probe reading is only interpretable alongside its canary.  Best of 3,
    # compare against BENCH_LOCAL's canary_ref_sec.
    canary = []
    for _ in range(3):
        t0 = time.perf_counter()
        specs["flagship_revenue_topk"].build(spark, args.sf).collect()
        canary.append(time.perf_counter() - t0)
    canary_ref = round(min(canary), 4)
    print(f"canary_ref_sec: {canary_ref} (loadavg1 {os.getloadavg()[0]:.2f})",
          flush=True)

    out: dict[str, dict] = {}
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.plans_dir,
    )
    os.makedirs(plans_dir, exist_ok=True)

    for name in args.names:
        spec = specs[name]
        sc = spark.sparkContext
        wib = name in WORK_IN_BUILD
        best_wall = None
        best_build = None
        best_exec = None
        for _ in range(args.runs):
            sc.setJobDescription(f"opt_probe: {name}")
            t0 = time.perf_counter()
            df = spec.build(spark, args.sf)
            if wib:
                df.collect()
                wall = time.perf_counter() - t0
                best_wall = wall if best_wall is None else min(best_wall, wall)
            else:
                df._jdf.queryExecution().executedPlan()
                t1 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                t2 = time.perf_counter()
                b, e = t1 - t0, t2 - t1
                best_build = b if best_build is None else min(best_build, b)
                best_exec = e if best_exec is None else min(best_exec, e)
                best_wall = (
                    (t2 - t0)
                    if best_wall is None
                    else min(best_wall, t2 - t0)
                )
            sc.setJobDescription(None)
        rec: dict = {"wall": round(best_wall, 4), "work_in_build": wib}
        if not wib:
            rec["build"] = round(best_build, 4)
            rec["exec_noop"] = round(best_exec, 4)
        out[name] = rec
        if not args.no_plans and args.tag:
            df = spec.build(spark, args.sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(
                os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w"
            ) as fh:
                fh.write(plan)
        print(f"{name}: {json.dumps(rec)}", flush=True)

    print(
        "PROBE "
        + json.dumps({"canary_ref_sec": canary_ref, "queries": out})
    )


if __name__ == "__main__":
    main()
