"""Dense-city cell-skew probe for the geo radius join (VERDICT r09 task 4
— SCALE.md sweep 35).

operators/geo.py documents that hot-cell skew "composes with the salting
lever" but never measured it.  This probe builds a 10× skewed probe set —
80% of probes inside ONE grid cell (a 1°×1° city patch; the 800 km cell is
7.27°×15°) — against a 10× supplier dim, and times the plain cell join vs
``cell_radius_join_salted`` on both the skewed and the natural coordinate
distribution, best-of-N foreground wall seconds.

Usage:
    python tools/geo_skew_probe.py [--runs 2] [--salt 8] [--mult 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from trafsys_data_transfer_spark.operators.geo import (
    RADIUS_KM,
    cell_radius_join,
    cell_radius_join_salted,
    synthetic_coords,
)
from trafsys_data_transfer_spark.session import get_spark
from trafsys_data_transfer_spark.sources.fixtures import load_table

SRC = "/root/testdata/sf0.1"
#: the hot patch: 1°×1° starting here — interior of a single 7.27°×15°
#: grid cell (lat cell 17, lon cell 12 at 800 km)
PATCH_LAT, PATCH_LON = 40.0, 3.0


def probes(spark, mult: int, skewed: bool):
    c = load_table(spark, SRC, "customer").select("c_custkey")
    reps = []
    for rep in range(mult):
        reps.append(
            c.select(
                (F.col("c_custkey") + rep * 1_000_000).alias("pid")
            )
        )
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    lat, lon = synthetic_coords(F.col("pid"))
    if skewed:
        # 80% of probes: deterministic sub-degree position inside the patch
        hot = F.col("pid") % 10 < 8
        lat = F.when(
            hot, F.lit(PATCH_LAT) + (F.col("pid") % 1000) / F.lit(1000.0)
        ).otherwise(lat)
        lon = F.when(
            hot, F.lit(PATCH_LON) + (F.col("pid") % 997) / F.lit(997.0)
        ).otherwise(lon)
    return out.select("pid", lat.alias("lat"), lon.alias("lon"))


def candidates(spark, mult: int):
    s = load_table(spark, SRC, "supplier").select("s_suppkey")
    reps = []
    for rep in range(mult):
        reps.append(
            s.select((F.col("s_suppkey") + rep * 100_000).alias("cid"))
        )
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    lat, lon = synthetic_coords(F.col("cid"))
    return out.select("cid", lat.alias("c_lat"), lon.alias("c_lon"))


def measure(label: str, build, runs: int) -> float:
    best = float("inf")
    for _ in range(runs):
        t = time.time()
        build().foreach(lambda _: None)
        best = min(best, time.time() - t)
    print(f"{label:52s} {best:7.2f} s")
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--salt", type=int, default=8)
    ap.add_argument("--mult", type=int, default=10)
    args = ap.parse_args()

    spark = get_spark("geo-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    cand = candidates(spark, args.mult).cache()
    print(f"candidates: {cand.count()} rows (dim, {args.mult}x)")
    for dist in ("natural", "skewed-80pct-one-cell"):
        p = probes(spark, args.mult, skewed=dist != "natural").cache()
        n = p.count()
        out_n = cell_radius_join(p, cand, RADIUS_KM).count()
        print(f"[{dist}] probes: {n}, join output: {out_n}")
        # Regime 1: the small-dim reality — AQE broadcasts the 9x dim, the
        # probe side never shuffles on the cell key, so probe skew cannot
        # straggle and salting only adds dim replication.
        measure(
            f"plain   broadcast-join          [{dist}]",
            lambda: cell_radius_join(p, cand, RADIUS_KM),
            args.runs,
        )
        # Regime 2: the 100 TB posture — BOTH sides shuffle on the cell
        # key (dim too big to broadcast).  Simulated by disabling the
        # broadcast threshold; the hot cell's probe mass lands on one
        # reduce task unless salted.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            measure(
                f"plain   shuffle-join            [{dist}]",
                lambda: cell_radius_join(p, cand, RADIUS_KM),
                args.runs,
            )
            measure(
                f"salted  shuffle-join n={args.salt}        [{dist}]",
                lambda: cell_radius_join_salted(
                    p, cand, RADIUS_KM, n_salt=args.salt
                ),
                args.runs,
            )
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
            measure(
                f"plain   shuffle-join, AQE-skew OFF [{dist}]",
                lambda: cell_radius_join(p, cand, RADIUS_KM),
                args.runs,
            )
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.unset("spark.sql.adaptive.skewJoin.enabled")
        p.unpersist()


if __name__ == "__main__":
    main()
