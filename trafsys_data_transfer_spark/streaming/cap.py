"""Streaming per-key contribution capping — ``applyInPandasWithState``
with a WATERMARKED REORDER BUFFER (out-of-order-safe admission).

The streaming twin of :func:`operators.sampling.events_contribution_capped`'s
selection rule: each (event_type, user_id) may contribute at most CAP
events, EARLIEST IN EVENT TIME first — enforced AT INGEST, so the quota
(rate limit, DP-style influence bound, spam damper) holds before data
ever lands, instead of as a nightly repair job.

Out-of-order arrival (VERDICT r06 task 1).  A counter-only cap admits in
ARRIVAL order, which silently diverges from the batch oracle's
earliest-N the moment micro-batches land out of event-time order: a
late-arriving earlier event is dropped if later events already filled
the quota.  This version admits in EVENT-TIME order under any disorder
the watermark tolerates:

* incoming rows are BUFFERED in keyed state, not admitted immediately;
* a buffered row is SEALED once the event-time watermark passes it
  strictly (``ts_us < watermark_ms * 1000`` — the buffer carries
  microsecond ints so sub-millisecond timestamp differences keep the
  exact batch (ts, event_id) admission order): the watermark contract says no
  row with an earlier-or-equal timestamp can still arrive, so admission
  order is final.  Sealed rows are admitted in (ts, event_id) order
  against the remaining quota; sealed rows beyond the quota are dropped
  permanently — exactly the batch operator's earliest-N;
* rows later than the watermark allows (ts below the watermark at
  arrival) are standard streaming late data — outside the contract,
  same as every watermarked operator in this package.

State per key is ONE integer (admitted so far, kept forever — the quota
must survive quiet periods) plus the transient buffer of not-yet-sealed
rows, bounded by O(key arrival rate x watermark delay): rows leave the
buffer the moment the watermark passes them.  An event-time timeout is
registered at the earliest buffered row, so a key whose data stops
still flushes its tail when the watermark advances (no-data batches /
later batches fire the timer without new rows for the key).

Draining a FINITE stream needs the watermark pushed past the last real
row and one more invocation per key — the package's sentinel-slice
pattern (cusum/SCD2 precedent): a far-future single-row slice advances
the global watermark, then a per-key sentinel slice (``event_id < 0``,
never buffered) invokes every key for the final seal.  A production
stream never ends, so the sentinel tier is drain harness, not operator.

State-retention audit (VERDICT r08 #1).  This operator calls
``state.update`` even when the reorder buffer is empty — DELIBERATELY:
the ``admitted`` quota counter is the operator's contract ("at most CAP
per key, EVER") and must survive arbitrarily long quiet periods, so a
key's state entry is permanent by semantics, not by accident.  Contrast
islands.py, where an empty open-island set carries zero information and
is ``state.remove()``d.  Bounding key cardinality (e.g. expiring quotas
after N days) would be a DIFFERENT operator contract — a rolling-window
cap — not this one.

CHECKPOINT COMPATIBILITY: round 8 changed the reorder buffer's time unit
from milliseconds to MICROSECONDS without renaming the ``buf_ts`` state
field.  A stream resumed from a checkpoint written by the pre-r8 code
would silently reinterpret stored ms values as µs (1000× too small) and
instantly seal/mis-order every buffered row.  Resuming across that
boundary is NOT supported: start from a fresh checkpoint.  (The field
name is kept because renaming it breaks those same old checkpoints just
as hard, but loudly — and every in-repo harness uses fresh checkpoints.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CAP_OUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
    ]
)

#: admitted-so-far counter + the reorder buffer (parallel ts/id arrays).
CAP_STATE_SCHEMA = StructType(
    [
        StructField("admitted", LongType()),
        StructField("buf_ts", ArrayType(LongType())),
        StructField("buf_id", ArrayType(LongType())),
    ]
)


def _cap_fn(cap: int):
    def fn(key, pdf_iter, state: GroupState):
        etype, user_id = key
        if state.exists:
            admitted, buf_ts, buf_id = state.get
            buf = list(zip(buf_ts, buf_id))
        else:
            admitted, buf = 0, []
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            real = pdf[pdf["event_id"] >= 0]  # sentinel rows never buffer
            if not len(real):
                continue
            # Microsecond precision (ADVICE r07): the batch twin and the
            # oracle order by the full timestamp, so the buffer must not
            # collapse sub-millisecond differences — carry µs ints and
            # scale the ms watermark up when sealing.
            ts_us = (
                real["ts"].to_numpy(dtype="datetime64[ns]").astype("int64")
                // 1_000
            )
            buf.extend(zip(ts_us.tolist(), real["event_id"].tolist()))
        wm_us = state.getCurrentWatermarkMs() * 1_000
        buf.sort()
        seal_n = 0
        for t, _ in buf:
            if t < wm_us:
                seal_n += 1
            else:
                break
        out_ids = []
        for t, i in buf[:seal_n]:
            if admitted < cap:
                out_ids.append(i)
                admitted += 1
            # else: quota full — sealed row dropped permanently
        buf = buf[seal_n:]
        state.update(
            (int(admitted), [t for t, _ in buf], [i for _, i in buf])
        )
        if buf:
            # flush the tail when the watermark passes the earliest
            # buffered row, even if this key never sees data again
            # (timeout API is ms-granular: first ms whose µs-scaled
            # watermark strictly exceeds the earliest buffered µs)
            state.setTimeoutTimestamp(buf[0][0] // 1_000 + 1)
        if out_ids:
            yield pd.DataFrame(
                {
                    "event_type": [etype] * len(out_ids),
                    "user_id": [user_id] * len(out_ids),
                    "event_id": out_ids,
                }
            )

    return fn


def cap_stream(
    events_stream: DataFrame,
    cap: int,
    lateness: str = "1 hour",
    est_keys: int | None = None,
) -> DataFrame:
    """Admitted (event_type, user_id, event_id) rows — the earliest
    ``cap`` per key IN EVENT TIME across all micro-batches, tolerant to
    arrival disorder up to ``lateness``.  Input needs ``event_type``,
    ``user_id``, ``ts`` and ``event_id`` (negative event_ids are drain
    sentinels: they trigger sealing but are never admitted).

    Pass ``est_keys`` (estimated distinct (event_type, user_id)
    cardinality) to get the frozen-checkpoint state-partition undersizing
    warning BEFORE the query's first start pins the partitioning."""
    if est_keys is not None:
        from .incremental import warn_if_state_partitions_undersized

        n_parts = int(
            events_stream.sparkSession.conf.get(
                "spark.sql.shuffle.partitions"
            )
        )
        warn_if_state_partitions_undersized(est_keys, n_parts)
    return (
        events_stream.select("event_type", "user_id", "ts", "event_id")
        .withWatermark("ts", lateness)
        .groupBy("event_type", "user_id")
        .applyInPandasWithState(
            _cap_fn(cap),
            outputStructType=CAP_OUT_SCHEMA,
            stateStructType=CAP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
