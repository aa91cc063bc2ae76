"""Sessionization over the ``events`` table.

Batch form: the classic gaps-and-islands plan — ``lag`` per user to find
gap boundaries, running ``sum`` of boundary flags to number sessions, one
groupBy to collapse.  Two shuffles total, both on ``user_id`` (the windows
and the final groupBy share partitioning, so Catalyst reuses the exchange).
The streaming twin (streaming/sessionize.py) must produce identical closed
sessions — asserted in tests.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..sources.fixtures import load_table

#: Session gap: events further apart than this start a new session.
SESSION_GAP_MINUTES = 30


def sessionize_batch(
    events: DataFrame, gap_minutes: int = SESSION_GAP_MINUTES
) -> DataFrame:
    """Gaps-and-islands sessionization: one row per (user, session) with
    start/end/count."""
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(by_user)
    flagged = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), F.lit(1)).otherwise(F.lit(0)),
    )
    numbered = flagged.withColumn(
        "session_no", F.sum("new_session").over(by_user)
    )
    return (
        numbered.groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_no", "session_start", "session_end", "n_events")
    )


@register(
    "events_session_window_native",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > {SESSION_GAP_MINUTES * 60}
                         OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    numbered AS (
        SELECT user_id, ts,
               CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
        FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, session_no
    """,
)
def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via Spark's built-in ``session_window`` — ONE
    shuffle + one merging hash aggregate, vs the gaps-and-islands plan's
    two window passes plus a groupBy.  The operator merges an event into
    the current session iff its gap from the previous event is <= the gap
    duration (boundary check: events exactly ``gap`` apart DO merge),
    which is precisely the ``> gap ⇒ new session`` rule of the
    gaps-and-islands oracle — same sessions, cheaper plan, and the same
    operator Structured Streaming runs with watermarked state at 100 TB.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            "user_id",
            F.session_window("ts", f"{SESSION_GAP_MINUTES} minutes"),
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


@register(
    "events_sessionize",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > {SESSION_GAP_MINUTES * 60}
                         OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts,
               -- CAST: DuckDB's windowed SUM over INT yields HUGEINT,
               -- which degrades to Decimal/float through Arrow/pandas and
               -- breaks the driver hash against Spark's int64.
               CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
        FROM flagged
    )
    SELECT user_id, session_no, MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, session_no
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessionization of the events stream (batch form)."""
    return sessionize_batch(load_table(spark, sf_dir, "events"))


def sessionize_salted(
    events: DataFrame,
    gap_minutes: int = SESSION_GAP_MINUTES,
    n_salt: int = 16,
) -> DataFrame:
    """Hot-key-safe sessionization — same sessions as
    :func:`sessionize_batch`, but no single task ever holds one user's
    whole event history.

    Sessionization IS interval coalescing of ``[ts, ts + gap]`` spans:
    two events chain into one session iff ts₂ ≤ ts₁ + gap, which is
    exactly the touching-merges island rule, with ``session_end =
    island_end − gap``.  Interval merging is associative on
    (start, end, count) partial islands, so the salted two-phase plan
    (:func:`..intervals.coalesce_intervals_salted`) applies verbatim:
    phase 1 spreads a hot user's rows over ``n_salt`` tasks, phase 2
    re-merges O(sessions · n_salt) partials per user.  The plain
    window plan cannot be salted directly (the lag/gap decision needs
    total per-key order); this reformulation is what makes the lever
    exist.  Measured under 30%-single-key skew in SCALE.md's
    twenty-second sweep."""
    from .intervals import coalesce_intervals_salted

    iv = events.select(
        "user_id",
        F.col("ts").alias("start"),
        (
            F.col("ts") + F.make_interval(mins=F.lit(gap_minutes))
        ).alias("end"),
    )
    isl = coalesce_intervals_salted(
        iv, "user_id", "start", "end", n_salt=n_salt
    )
    w = Window.partitionBy("user_id").orderBy("island_start")
    return isl.select(
        "user_id",
        F.row_number().over(w).cast("long").alias("session_no"),
        F.col("island_start").alias("session_start"),
        (
            F.col("island_end") - F.make_interval(mins=F.lit(gap_minutes))
        ).alias("session_end"),
        F.col("n_merged").alias("n_events"),
    )


def sessionize_incremental(
    prior_sessions: DataFrame,
    new_events: DataFrame,
    cutoff,
    gap_minutes: int = SESSION_GAP_MINUTES,
) -> DataFrame:
    """Incrementally extend a sessionized corpus with a new batch of
    events — WITHOUT re-scanning old events (the warehouse nightly-load
    shape: day N's job reads day N's events plus yesterday's session
    table, never the event history).

    Contract: ``prior_sessions`` is :func:`sessionize_batch` over all
    events with ``ts < cutoff``; ``new_events`` are the events with
    ``ts >= cutoff``.  Only a user's LAST prior session can still absorb
    new events (one ending within ``gap`` of the cutoff); it is carried
    as a pseudo-event at its ``session_end`` with its start/count
    riding along, unioned with the new events, and the gaps-and-islands
    fold runs over that small set.  Because the pseudo-event's timestamp
    IS the last prior event's timestamp, the gap decision between old
    and new data is bit-identical to the full recompute — the registered
    query shares ``events_sessionize``'s hash-checked oracle.

    Cost: O(new events + active users), one window + one groupBy on the
    incremental slice, plus an O(users) aggregate over the session
    table.  The full-history scan is gone — at 100 TB this is the
    difference between a nightly job reading one day and reading one
    corpus."""
    gap_secs = gap_minutes * 60
    last_no = prior_sessions.groupBy("user_id").agg(
        F.max("session_no").alias("last_no")
    )
    prior = prior_sessions.join(last_no, "user_id")
    open_pred = (F.col("session_no") == F.col("last_no")) & (
        F.col("session_end").cast("long") >= F.lit(int(cutoff)) - gap_secs
    )
    closed = prior.filter(~open_pred).select(
        "user_id", "session_no", "session_start", "session_end", "n_events"
    )
    carry = prior.filter(open_pred)
    pseudo = carry.select(
        "user_id",
        F.col("session_end").alias("ts"),
        F.lit(-1).cast("long").alias("event_id"),
        F.col("session_start").alias("carry_start"),
        F.col("n_events").alias("carry_n"),
    )
    fresh = new_events.select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("timestamp").alias("carry_start"),
        F.lit(1).cast("long").alias("carry_n"),
    )
    stream = pseudo.unionByName(fresh)
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(
        by_user
    )
    numbered = stream.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_secs), F.lit(1)).otherwise(F.lit(0)),
    ).withColumn("local_no", F.sum("new_session").over(by_user))
    merged = numbered.groupBy("user_id", "local_no").agg(
        F.min(F.coalesce("carry_start", "ts")).alias("session_start"),
        F.max("ts").alias("session_end"),
        F.sum("carry_n").alias("n_events"),
        F.max((F.col("event_id") == -1).cast("int")).alias("has_carry"),
    )
    # Global numbering: the carried session keeps its prior number; new
    # sessions continue after the user's last prior number.
    offsets = prior_sessions.groupBy("user_id").agg(
        F.max("session_no").alias("prior_last")
    )
    carried_users = carry.select("user_id", F.lit(1).alias("carried"))
    renum = (
        merged.join(offsets, "user_id", "left")
        .join(carried_users, "user_id", "left")
        .select(
            "user_id",
            (
                F.coalesce(F.col("prior_last"), F.lit(0))
                - F.coalesce(F.col("carried"), F.lit(0))
                + F.col("local_no")
            ).alias("session_no"),
            "session_start",
            "session_end",
            "n_events",
        )
    )
    return closed.unionByName(renum)


@register(
    "events_sessionize_incremental",
    # SAME oracle as events_sessionize: the incremental apply must be
    # indistinguishable from the full recompute, down to the hash.
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > {SESSION_GAP_MINUTES * 60}
                         OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts,
               CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
        FROM flagged
    )
    SELECT user_id, session_no, MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, session_no
    """,
)
def events_sessionize_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nightly-load sessionization: sessionize the first ~2/3 of the
    fixture, then apply the rest as an incremental batch through
    :func:`sessionize_incremental` — the result must hash-match the
    full-recompute oracle exactly (carried-session extension, gap
    boundary at the cutoff, and renumbering all bit-correct)."""
    import tempfile as _tf
    import uuid as _uuid

    events = load_table(spark, sf_dir, "events")
    lo, hi = events.agg(
        F.min(F.col("ts").cast("long")), F.max(F.col("ts").cast("long"))
    ).first()
    cutoff = lo + (hi - lo) * 2 // 3
    # The nightly-load contract is a STORED session table (yesterday's job
    # wrote it); stage it to parquet rather than passing raw lineage, which
    # sessionize_incremental consumes three times (last-session election,
    # closed/carry split, renumbering offsets) and would otherwise recompute
    # the full-history window sort per consumer.
    prior_path = os.path.join(
        _tf.gettempdir(), f"tds_sess_prior_{_uuid.uuid4().hex[:8]}"
    )
    sessionize_batch(
        events.filter(F.col("ts").cast("long") < cutoff)
    ).write.mode("overwrite").parquet(prior_path)
    return sessionize_incremental(
        spark.read.parquet(prior_path),
        events.filter(F.col("ts").cast("long") >= cutoff),
        cutoff,
    )
