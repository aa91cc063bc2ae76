"""Streaming per-key contribution capping — ``applyInPandasWithState``.

The streaming twin of :func:`operators.sampling.events_contribution_capped`'s
selection rule: each (event_type, user_id) may contribute at most CAP
events, earliest first — enforced AT INGEST, so the quota (rate limit,
DP-style influence bound, spam damper) holds before data ever lands,
instead of as a nightly repair job.

State is ONE integer (events admitted so far) per key.  Within a
micro-batch rows are ordered by (ts, event_id) before admission, and the
counter carries across batches, so the drained admitted set is exactly
the batch operator's earliest-N selection.  IN-ORDER ARRIVAL across
micro-batches is required (the growth/SCD2 contract): the day-sliced
staging used by the registered query satisfies it by construction, and
rows arriving after their key's cap is exhausted are dropped — a replay
of already-admitted rows would be re-admitted only if state were lost,
which the checkpoint prevents.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

CAP_OUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
    ]
)

CAP_STATE_SCHEMA = StructType([StructField("admitted", LongType())])


def _cap_fn(cap: int):
    def fn(key, pdf_iter, state: GroupState):
        etype, user_id = key
        (admitted,) = state.get if state.exists else (0,)
        out = []
        frames = [pdf for pdf in pdf_iter]
        if frames:
            batch = pd.concat(frames).sort_values(["ts", "event_id"])
            room = cap - admitted
            if room > 0:
                take = batch.head(room)
                out = take["event_id"].tolist()
                admitted += len(take)
        state.update((int(admitted),))
        if out:
            yield pd.DataFrame(
                {
                    "event_type": [etype] * len(out),
                    "user_id": [user_id] * len(out),
                    "event_id": out,
                }
            )

    return fn


def cap_stream(events_stream: DataFrame, cap: int) -> DataFrame:
    """Admitted (event_type, user_id, event_id) rows, earliest-``cap``
    per key across all micro-batches.  Input needs ``event_type``,
    ``user_id``, ``ts`` and ``event_id``."""
    return (
        events_stream.select("event_type", "user_id", "ts", "event_id")
        .groupBy("event_type", "user_id")
        .applyInPandasWithState(
            _cap_fn(cap),
            outputStructType=CAP_OUT_SCHEMA,
            stateStructType=CAP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
