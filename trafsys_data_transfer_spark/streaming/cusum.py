"""Streaming CUSUM change-point detection — ``applyInPandasWithState``.

The streaming twin of :func:`operators.drift.events_cusum_changepoints`:
the reflected one-sided CUSUM recurrence runs INSIDE the stream, keyed by
series (event_type), with the per-series running statistic living in the
state store across micro-batches — change-point alerting at ingest
latency instead of a nightly sweep.

The recurrence needs a reference (per-series mean and allowance); like
``streaming_seasonal_anomalies``'s stored hour-of-day profile, that comes
from a PRE-COMPUTED profile (historical totals) captured as a plain
closure constant — O(series) numbers, the "stored control chart" any
production monitor maintains.

Zero-count hours matter (the statistic decays through gaps), so the fold
must advance hour by hour even when a series is silent.  Batch boundaries
therefore carry a SENTINEL row per (series, slice) at the slice's final
hour (the SCD2 sentinel-flush precedent): every key is invoked every
micro-batch and folds exactly through the slice frontier — no hour is
folded twice and none is skipped, which is what makes the drained stream
bit-identical to the batch operator (same oracle).

Scale: state is two integers per series; each micro-batch shuffles only
its own rows to the series' state partition; the per-key fold is O(hours
in slice).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..operators.drift import CUSUM_SIGMA_LIMIT_SQ

CUSUM_OUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("epoch_hour", LongType()),
        StructField("cusum_scaled", LongType()),
    ]
)

#: state: (running s, last folded epoch-hour)
CUSUM_STATE_SCHEMA = StructType(
    [StructField("s", LongType()), StructField("last_h", LongType())]
)


def cusum_profile(events) -> dict:
    """Per-series control-chart profile from historical data: global spine
    bounds and length, and per series (tot, allowance k) — the O(series)
    constant table the streaming detector folds against.  Matches the
    batch operator's arithmetic exactly (scaled ×H, k = ⌊√(tot·H)/2⌋)."""
    import math

    from pyspark.sql import functions as F

    hourly = events.groupBy(
        "event_type",
        F.expr("CAST(unix_timestamp(ts) div 3600 AS BIGINT)").alias("h"),
    ).agg(F.count(F.lit(1)).alias("n"))
    h0, h1 = hourly.agg(F.min("h"), F.max("h")).first()
    big_h = int(h1 - h0 + 1)
    tots = {
        r["event_type"]: int(r["tot"])
        for r in hourly.groupBy("event_type")
        .agg(F.sum("n").alias("tot"))
        .collect()
    }
    return {
        "h0": int(h0),
        "h1": int(h1),
        "H": big_h,
        "series": {
            t: (tot, int(math.floor(math.sqrt(tot * big_h) / 2)))
            for t, tot in tots.items()
        },
    }


def _cusum_fn(profile: dict):
    big_h = profile["H"]
    h0 = profile["h0"]
    h1 = profile["h1"]
    series = profile["series"]

    def fn(key, pdf_iter, state: GroupState):
        (etype,) = key
        tot, k = series[etype]
        limit = CUSUM_SIGMA_LIMIT_SQ * tot * big_h

        counts: dict[int, int] = {}
        frontier = None
        for pdf in pdf_iter:
            hours = (
                pdf["ts"].to_numpy(dtype="datetime64[ns]").astype("int64")
                // (3600 * 1_000_000_000)
            )
            sent = pdf["is_sentinel"].to_numpy()
            for h, is_s in zip(hours.tolist(), sent.tolist()):
                if frontier is None or h > frontier:
                    frontier = h
                if not is_s:
                    counts[h] = counts.get(h, 0) + 1

        s, last_h = state.get if state.exists else (0, h0 - 1)
        out_h, out_s = [], []
        # Fold every hour from the last frontier to this slice's frontier —
        # zero-count hours decay the statistic exactly like the batch fold.
        # The sentinel sits at the slice's end-of-day, which can overshoot
        # the batch spine's global max event hour h1; cap the fold there so
        # the stream never evaluates (and flags) hours the batch recurrence
        # never reaches (ADVICE r05 #1).
        if frontier is not None:
            frontier = min(frontier, h1)
        for h in range(last_h + 1, (frontier or last_h) + 1):
            s = max(0, s + big_h * counts.get(h, 0) - tot - k)
            if s * s > limit:
                out_h.append(h)
                out_s.append(s)
        state.update((int(s), int(frontier or last_h)))
        if out_h:
            yield pd.DataFrame(
                {
                    "event_type": [etype] * len(out_h),
                    "epoch_hour": out_h,
                    "cusum_scaled": out_s,
                }
            )

    return fn


def cusum_stream(events_stream: DataFrame, profile: dict) -> DataFrame:
    """Flagged (series, hour) change points, emitted per micro-batch.
    Input needs ``event_type``, ``ts`` and ``is_sentinel`` columns."""
    return (
        events_stream.select("event_type", "ts", "is_sentinel")
        .groupBy("event_type")
        .applyInPandasWithState(
            _cusum_fn(profile),
            outputStructType=CUSUM_OUT_SCHEMA,
            stateStructType=CUSUM_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
