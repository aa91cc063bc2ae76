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

import datetime as dt

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


def _us(ts: pd.Timestamp) -> int:
    return int(ts.value // 1_000)


def _session_fn(gap_minutes: int):
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        closed: list[tuple] = []

        if state.hasTimedOut:
            # Event-time timeout: the watermark passed last_ts + gap with no
            # new events for this key — the session is closed by idleness.
            start_us, last_us, n = state.get
            closed.append((user_id, start_us, last_us, n))
            state.remove()
        else:
            if state.exists:
                start_us, last_us, n = state.get
            else:
                start_us = last_us = n = None

            for pdf in pdf_iter:
                for ts in sorted(pdf["ts"]):
                    t = _us(ts)
                    if last_us is None:
                        start_us, last_us, n = t, t, 1
                    elif t - last_us > gap_us:
                        closed.append((user_id, start_us, last_us, n))
                        start_us, last_us, n = t, t, 1
                    else:
                        last_us, n = t, n + 1

            state.update((start_us, last_us, n))
            # Flush this session once event time passes its gap horizon.
            state.setTimeoutTimestamp((last_us + gap_us) // 1_000)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": [
                        dt.datetime.fromtimestamp(c[1] / 1e6, dt.timezone.utc).replace(tzinfo=None)
                        for c in closed
                    ],
                    "session_end": [
                        dt.datetime.fromtimestamp(c[2] / 1e6, dt.timezone.utc).replace(tzinfo=None)
                        for c in closed
                    ],
                    "n_events": [c[3] for c in closed],
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
