"""Streaming drain-floor probe (r11 optimization round, guide §1).

Measures the applyInPandasWithState KEYED-INVOCATION floor that bounds
every stateful drain in the registry: a trivial state function (append
one counter per key, emit nothing but the key) over the same shape as
the real drains — N distinct keys, B stateful micro-batches
(maxFilesPerTrigger-paced file source), S state partitions — so the
measured wall is pure harness cost: per-batch planning + state-store
task scheduling + one keyed pandas invocation per (key, batch).

The real drains' wall minus this floor is the part optimization can
touch.  BASELINE.md (r7/r8) measured ~4 s/batch at 7.5k keys; this probe
re-derives the number on the current session/host so OPTIMIZATION_r11.md
quotes a fresh floor next to its canary.

Usage: python tools/stream_floor_probe.py [--keys 7500] [--batches 3]
       [--partitions 32]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", type=int, default=7500)
    ap.add_argument("--batches", type=int, default=3)
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    from trafsys_data_transfer_spark.session import get_spark
    from trafsys_data_transfer_spark.streaming.incremental import (
        _stream_partitions,
    )

    spark = get_spark("stream_floor_probe")
    sc = spark.sparkContext

    out_schema = StructType([StructField("k", LongType())])
    state_schema = StructType([StructField("n", LongType())])

    def trivial_fn(key, pdfs, state: GroupState):
        n = state.get[0] if state.exists else 0
        rows = 0
        for pdf in pdfs:
            rows += len(pdf)
        state.update((n + rows,))
        yield pd.DataFrame({"k": [key[0]]})

    # Stage B files of K rows each, one key per row (every key appears in
    # every batch — the worst-case invocation count the cap drain pays).
    results = []
    for run in range(args.runs):
        staging = tempfile.mkdtemp(prefix="tds_floor_")
        try:
            for b in range(args.batches):
                t = pa.table(
                    {
                        "k": pa.array(range(args.keys), pa.int64()),
                        "v": pa.array([b] * args.keys, pa.int64()),
                    }
                )
                f = os.path.join(staging, f"b{b:03d}.parquet")
                pq.write_table(t, f)
                os.utime(f, (1_700_000_000 + b, 1_700_000_000 + b))
            table = f"floor_{uuid.uuid4().hex[:8]}"
            sc.setJobDescription(
                f"floor probe: {args.keys} keys x {args.batches} batches "
                f"@ {args.partitions} parts (run {run})"
            )
            t0 = time.perf_counter()
            with _stream_partitions(spark, n=args.partitions):
                q = (
                    spark.readStream.schema("k long, v long")
                    .option("maxFilesPerTrigger", 1)
                    .parquet(staging)
                    .groupBy("k")
                    .applyInPandasWithState(
                        trivial_fn,
                        outputStructType=out_schema,
                        stateStructType=state_schema,
                        outputMode="append",
                        timeoutConf=GroupStateTimeout.NoTimeout,
                    )
                    .writeStream.format("memory")
                    .queryName(table)
                    .outputMode("append")
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
            wall = time.perf_counter() - t0
            n_out = spark.table(table).count()
            assert n_out == args.keys * args.batches, n_out
            sc.setJobDescription(None)
            results.append(wall)
            print(
                f"run {run}: wall {wall:.2f}s "
                f"({wall / args.batches:.2f}s/batch), loadavg1 "
                f"{os.getloadavg()[0]:.2f}",
                flush=True,
            )
        finally:
            shutil.rmtree(staging, ignore_errors=True)
    best = min(results)
    print(
        f"FLOOR best-of-{args.runs}: {best:.2f}s total, "
        f"{best / args.batches:.3f}s per stateful micro-batch "
        f"({args.keys} keys, {args.partitions} state partitions)"
    )


if __name__ == "__main__":
    main()
