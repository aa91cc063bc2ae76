"""Hot-key skew probe (VERDICT r08 task 5 — SCALE.md twenty-second sweep).

The keyed-window family (sessionize, interval coalescing, SCD2) shuffles
on ``user_id``; SCALE.md's replication sweeps grow volume UNIFORMLY, so
the straggler shape — one key holding a large share of all rows — was
never measured.  This probe builds a deterministic skewed replica of the
sf0.1 events table (30% of rows reassigned to ONE user) and measures the
plain one-exchange window plans against the salted two-phase plans
(`coalesce_intervals_salted`, `sessionize_salted`) on both the skewed and
the natural key distribution, best-of-N foreground wall seconds.

Usage:
    python tools/skew_probe.py [--runs 2] [--salt 16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from trafsys_data_transfer_spark.operators.intervals import (
    coalesce_intervals,
    coalesce_intervals_salted,
)
from trafsys_data_transfer_spark.operators.sessions import (
    sessionize_batch,
    sessionize_salted,
)
from trafsys_data_transfer_spark.session import get_spark
from trafsys_data_transfer_spark.sources.fixtures import load_table

SRC = "/root/testdata/sf0.1"
DST = f"/tmp/tds_skew_events_{os.environ.get('SKEW_PROBE_REPS', '30')}"
NATURAL = f"/tmp/tds_skew_events_natural_{os.environ.get('SKEW_PROBE_REPS', '30')}"
HOT_USER = 1
HOT_FRACTION_MOD = (10, 3)  # event_id % 10 < 3 → 30% of rows
#: sf0.1 events is only 100k rows — small enough that AQE folds the whole
#: keyed window into a couple of tasks and no key can straggle.  The probe
#: replicates 30× (3M rows, hot key ≈ 900k) with per-replica id/user/ts
#: shifts so the non-hot key space grows and timestamps interleave.
REPS = int(os.environ.get("SKEW_PROBE_REPS", "30"))


def _replicated(spark):
    base = load_table(spark, SRC, "events")
    parts = []
    for rep in range(REPS):
        r = F.lit(rep)
        parts.append(
            base.select(
                (F.col("event_id") + r * 10_000_000).alias("event_id"),
                (F.col("user_id") + r * 100_000).alias("user_id"),
                (F.col("ts") + F.make_interval(secs=r.cast("double"))).alias(
                    "ts"
                ),
                "event_type",
                "value",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def build_replicas(spark) -> None:
    if not os.path.exists(os.path.join(NATURAL, "_SUCCESS")):
        _replicated(spark).write.mode("overwrite").parquet(NATURAL)
    if not os.path.exists(os.path.join(DST, "_SUCCESS")):
        mod, lt = HOT_FRACTION_MOD
        skewed = spark.read.parquet(NATURAL).withColumn(
            "user_id",
            F.when(F.col("event_id") % mod < lt, F.lit(HOT_USER)).otherwise(
                F.col("user_id")
            ),
        )
        skewed.write.mode("overwrite").parquet(DST)


def _intervals_of(events):
    # the events_interval_islands derivation (traffic-style spans)
    return events.select(
        F.col("user_id").alias("key"),
        F.col("ts").alias("start"),
        (
            F.col("ts")
            + F.make_interval(mins=(F.col("event_id") % 7 + 1).cast("int"))
        ).alias("end"),
    )


def measure(label: str, build, runs: int) -> float:
    best = float("inf")
    for _ in range(runs):
        t = time.time()
        build().foreach(lambda _: None)  # full materialization, no driver collect
        best = min(best, time.time() - t)
    print(f"{label:55s} {best:7.2f} s")
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--salt", type=int, default=16)
    args = ap.parse_args()

    spark = get_spark("skew-probe")
    build_replicas(spark)
    natural = spark.read.parquet(NATURAL)
    skewed = spark.read.parquet(DST)
    n = skewed.count()
    hot = skewed.filter(F.col("user_id") == HOT_USER).count()
    print(f"events: {n} rows, hot key holds {hot} ({hot / n:.0%})")

    for dist, ev in (("natural", natural), ("skewed-30pct", skewed)):
        iv = _intervals_of(ev)
        measure(
            f"coalesce_intervals   plain   [{dist}]",
            lambda: coalesce_intervals(iv, "key"),
            args.runs,
        )
        measure(
            f"coalesce_intervals   salted  [{dist}] n_salt={args.salt}",
            lambda: coalesce_intervals_salted(iv, "key", n_salt=args.salt),
            args.runs,
        )
        measure(
            f"sessionize           plain   [{dist}]",
            lambda: sessionize_batch(ev),
            args.runs,
        )
        measure(
            f"sessionize           salted  [{dist}] n_salt={args.salt}",
            lambda: sessionize_salted(ev, n_salt=args.salt),
            args.runs,
        )


if __name__ == "__main__":
    main()
