"""Stateful streaming sessionization — ``applyInPandasWithState``.

The streaming twin of :func:`operators.sessions.sessionize_batch`: per-user
session state (start, last-seen, count) lives in the state store across
micro-batches; a session closes — and is emitted exactly once — when a
later event for that user arrives more than ``gap`` after the last one.
This is the "custom stateful operator" escape hatch for semantics that
``window()``/``withWatermark`` can't express (data-driven session
boundaries rather than fixed buckets).

Scale: state is O(active users), keyed and partitioned by ``user_id``;
each micro-batch shuffles only its own rows to their key's state partition.
Sessions still open when the source drains stay in state (checkpointed) —
exactly what a production always-on pipeline wants; tests flush them with a
sentinel event.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from ..operators.sessions import SESSION_GAP_MINUTES

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

#: state: (session_start_us, last_ts_us, n_events) — microsecond epochs,
#: because the state store round-trips plain tuples.
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)


def _session_fn(gap_minutes: int):
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key

        if state.hasTimedOut:
            # Event-time timeout: the watermark passed last_ts + gap with no
            # new events for this key — the session is closed by idleness.
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": pd.to_datetime([start_us], unit="us"),
                    "session_end": pd.to_datetime([last_us], unit="us"),
                    "n_events": [n],
                }
            )
            return

        # Vectorized gaps-and-islands over this batch's events for the key:
        # sort, diff > gap → island boundaries.  No per-event Python loop —
        # at 100 k events/batch the state machine is numpy slicing.
        chunks = [pdf["ts"].to_numpy(dtype="datetime64[ns]") for pdf in pdf_iter]
        ts = np.sort(np.concatenate(chunks)).astype("int64") // 1_000  # ns→us
        starts = np.flatnonzero(np.diff(ts) > gap_us) + 1
        isl_start = np.concatenate(([0], starts))  # island start indices
        isl_end = np.concatenate((starts, [len(ts)]))  # exclusive ends

        s_start = ts[isl_start]
        s_end = ts[isl_end - 1]
        s_n = (isl_end - isl_start).astype("int64")

        if state.exists:
            start_us, last_us, n = state.get
            if ts[0] - last_us <= gap_us:
                # First island continues the open session.
                s_start[0] = start_us
                s_n[0] += n
            else:
                # Open session closes; prepend it as its own island.
                s_start = np.concatenate(([start_us], s_start))
                s_end = np.concatenate(([last_us], s_end))
                s_n = np.concatenate(([n], s_n))

        # Last island stays open in state; everything before it closes now.
        state.update((int(s_start[-1]), int(s_end[-1]), int(s_n[-1])))
        # Flush the open session once event time passes its gap horizon.
        state.setTimeoutTimestamp(int(s_end[-1] + gap_us) // 1_000)

        if len(s_start) > 1:
            yield pd.DataFrame(
                {
                    "user_id": np.full(len(s_start) - 1, user_id, dtype="int64"),
                    "session_start": pd.to_datetime(s_start[:-1], unit="us"),
                    "session_end": pd.to_datetime(s_end[:-1], unit="us"),
                    "n_events": s_n[:-1],
                }
            )

    return fn


def sessionize_stream(
    events_stream: DataFrame,
    gap_minutes: int = SESSION_GAP_MINUTES,
    lateness: str = "1 hour",
) -> DataFrame:
    """Closed sessions per user, emitted as they close — either because a
    later event from the same user opened a new session, or because the
    event-time watermark passed the session's idle horizon
    (``last_event + gap``).  The timeout path is what bounds state at
    scale: without it, every user who never returns leaks one state entry
    forever.  Input needs ``user_id`` and ``ts`` columns (event time)."""
    return (
        events_stream.select("user_id", "ts")
        .withWatermark("ts", lateness)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_minutes),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
