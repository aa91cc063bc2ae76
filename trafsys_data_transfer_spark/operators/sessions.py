"""Sessionization over the ``events`` table.

Batch form: the classic gaps-and-islands plan — ``lag`` per user to find
gap boundaries, running ``sum`` of boundary flags to number sessions, one
groupBy to collapse.  Two shuffles total, both on ``user_id`` (the windows
and the final groupBy share partitioning, so Catalyst reuses the exchange).
The streaming twin (streaming/sessionize.py) must produce identical closed
sessions — asserted in tests.
"""

from __future__ import annotations

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
