"""Streaming Holt linear smoothing — level/trend state maintained AT
INGEST, exact against the batch recurrence.

The streaming twin of :func:`plans.timeseries.holt_linear`.  Holt's
recurrence is order-SENSITIVE and non-associative, so unlike interval
coalescing (islands.py) no partial-merge trick exists: correctness under
out-of-order arrival requires the cap.py reorder-buffer discipline —
buffer rows per key, fold ONLY the prefix the event-time watermark has
sealed (no earlier row can still arrive), in (ts, event_id) order, and
emit one smoothed row per fold step.  The drained output is therefore
bit-identical to running the batch recurrence over the same rows.

State per key:
* ``l``, ``b``, ``rn`` — the smoothing state proper: level, trend and
  the 1-based fold index.  Like the contribution cap's admitted-quota
  counter (cap.py) this survives quiet periods BY CONTRACT — the whole
  point of the operator is that the (l, b) pair is durable per-series
  state a forecaster reads; evicting it would restart every series.
  TTL-eviction of cold series is the caller's policy decision, not this
  operator's.
* ``buf_ts_us``, ``buf_eid``, ``buf_cents`` — the reorder buffer of
  not-yet-sealed rows (µs longs end-to-end; the cap.py ADVICE r07
  lesson).  Its size is bounded by arrival disorder × rate (the rows
  inside one lateness window), never by history.

Float discipline: the fold uses the same dyadic α/β constants and the
same expression shapes as the batch operator, so Python, numpy and the
oracle's recursive CTE all execute identical IEEE-754 ops.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..plans.timeseries import HOLT_ALPHA, HOLT_BETA

HOLT_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("rn", LongType()),
        StructField("cents", LongType()),
        StructField("level", DoubleType()),
        StructField("trend", DoubleType()),
    ]
)

HOLT_STATE_SCHEMA = StructType(
    [
        StructField("l", DoubleType()),
        StructField("b", DoubleType()),
        StructField("rn", LongType()),
        StructField("buf_ts_us", ArrayType(LongType())),
        StructField("buf_eid", ArrayType(LongType())),
        StructField("buf_cents", ArrayType(LongType())),
    ]
)


def _holt_fn(key, pdf_iter, state: GroupState):
    (user_id,) = key
    if state.exists:
        l, b, rn, ts_us, eids, cents = state.get
        buf = list(zip(ts_us, eids, cents))
        started = rn > 0
    else:
        l, b, rn = 0.0, 0.0, 0
        buf = []
        started = False
    for pdf in pdf_iter:
        if not len(pdf):
            continue
        real = pdf[pdf["event_id"] >= 0]  # sentinel rows never buffer
        if not len(real):
            continue
        t_us = (
            real["ts"].to_numpy(dtype="datetime64[ns]").astype("int64")
            // 1_000
        )
        buf.extend(
            (int(t), int(e), int(c))
            for t, e, c in zip(
                t_us, real["event_id"].tolist(), real["cents"].tolist()
            )
        )
    wm_us = state.getCurrentWatermarkMs() * 1_000
    buf.sort()  # (ts_us, event_id, cents) — the batch fold order
    sealed = [r for r in buf if r[0] < wm_us]
    keep = [r for r in buf if r[0] >= wm_us]
    out_rn, out_cents, out_l, out_b = [], [], [], []
    for _, _, x in sealed:
        if not started:
            l = float(x)
            b = 0.0
            started = True
        else:
            l_new = HOLT_ALPHA * x + (1.0 - HOLT_ALPHA) * (l + b)
            b = HOLT_BETA * (l_new - l) + (1.0 - HOLT_BETA) * b
            l = l_new
        rn += 1
        out_rn.append(rn)
        out_cents.append(x)
        out_l.append(l)
        out_b.append(b)
    if keep or started:
        state.update(
            (
                l,
                b,
                rn,
                [r[0] for r in keep],
                [r[1] for r in keep],
                [r[2] for r in keep],
            )
        )
        if keep:
            # wake this key when the watermark passes the earliest
            # buffered row so tails flush without new arrivals
            state.setTimeoutTimestamp(keep[0][0] // 1_000 + 1)
    elif state.exists:
        state.remove()
    if out_rn:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out_rn),
                "rn": out_rn,
                "cents": out_cents,
                "level": out_l,
                "trend": out_b,
            }
        )


def holt_stream(
    rows_stream: DataFrame,
    lateness: str = "1 hour",
    est_keys: int | None = None,
) -> DataFrame:
    """Per-key Holt level/trend over a stream of ``(user_id, ts,
    event_id, cents)`` rows — one output row per input row, emitted when
    the watermark seals its position in the series, bit-identical to the
    batch recurrence over the same rows.  Negative event_ids are drain
    sentinels (advance the watermark, never fold)."""
    if est_keys is not None:
        from .incremental import warn_if_state_partitions_undersized

        n_parts = int(
            rows_stream.sparkSession.conf.get(
                "spark.sql.shuffle.partitions"
            )
        )
        warn_if_state_partitions_undersized(est_keys, n_parts)
    return (
        rows_stream.select("user_id", "ts", "event_id", "cents")
        .withWatermark("ts", lateness)
        .groupBy("user_id")
        .applyInPandasWithState(
            _holt_fn,
            outputStructType=HOLT_OUT_SCHEMA,
            stateStructType=HOLT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
