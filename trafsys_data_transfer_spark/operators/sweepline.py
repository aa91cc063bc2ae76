"""Interval sweep-line concurrency — "how many sessions were open at
once" as a distributed two-level prefix sum.

The textbook sweep is inherently sequential: sort every interval
boundary (+1 at start, −1 at end), scan, track the running count.  A
single global running-sum window would serialize the whole corpus into
one partition — the anti-pattern.  The distributed decomposition:

1. **Local scan** — partition boundaries by calendar day; a per-day
   window computes each day's running sum from zero.  Parallel across
   days, each partition day-sized.
2. **Carry fold** — per-day net deltas (one row per day) get a
   cumulative sum over days: ``carry_in(d)`` = open intervals entering
   day d.  This window IS global but runs over O(days) rows — a bounded
   calendar dimension, not data-sized (the same O(groups) exception
   PLAN_INVENTORY documents for global rollups).
3. **Recombine** — the true running count inside day d is
   ``carry_in(d) + local_running``; the day's peak also has to consider
   the value AT day start (``carry_in`` itself — a day whose first
   boundary is an end would otherwise report one too low).

Boundary tie rule: at the same instant, starts sort before ends
(``delta DESC``), so an interval ending exactly when another starts
counts as overlapping — closed-interval semantics, identical in the
DuckDB oracle.  The peak per day is invariant to the remaining order
among equal (ts, delta) rows: within the +1 block the running value
only rises (max is reached after the block), within the −1 block it
only falls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..sources.fixtures import load_table
from .sessions import SESSION_GAP_MINUTES, sessionize_batch


def interval_concurrency_daily(
    intervals: DataFrame, start_col: str = "session_start", end_col: str = "session_end"
) -> DataFrame:
    """Per-day peak number of simultaneously open ``[start, end]``
    intervals (closed ends: touching intervals overlap).  Returns
    (day, peak_concurrency), one row per day that contains at least one
    boundary."""
    bounds = intervals.select(
        F.col(start_col).alias("ts"), F.lit(1).alias("delta")
    ).unionByName(
        intervals.select(F.col(end_col).alias("ts"), F.lit(-1).alias("delta"))
    )
    bounds = bounds.withColumn("day", F.to_date("ts"))
    in_day = (
        Window.partitionBy("day")
        .orderBy(F.col("ts"), F.col("delta").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = bounds.withColumn("local_run", F.sum("delta").over(in_day))
    per_day = local.groupBy("day").agg(
        F.max("local_run").alias("max_local"),
        F.sum("delta").alias("net"),
    )
    # O(days) global window: cumulative net of all PRIOR days — asserted
    # in-plan (VERDICT r10 task 3).
    from .guards import bounded_window_guard

    per_day = bounded_window_guard(per_day, "concurrency_sweepline")
    by_day = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    return (
        per_day.withColumn(
            "carry_in", F.coalesce(F.sum("net").over(by_day), F.lit(0))
        )
        .select(
            "day",
            F.greatest(
                F.col("carry_in") + F.col("max_local"), F.col("carry_in")
            ).alias("peak_concurrency"),
        )
        .orderBy("day")
    )


@register(
    "events_concurrency_daily_peak",
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
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged
    ),
    sessions AS (
        SELECT user_id, session_no, MIN(ts) AS session_start, MAX(ts) AS session_end
        FROM numbered GROUP BY user_id, session_no
    ),
    bounds AS (
        SELECT session_start AS ts, 1 AS delta FROM sessions
        UNION ALL
        SELECT session_end AS ts, -1 AS delta FROM sessions
    ),
    run AS (
        SELECT CAST(ts AS DATE) AS day, delta,
               SUM(delta) OVER (ORDER BY ts, delta DESC
                                ROWS UNBOUNDED PRECEDING) AS running
        FROM bounds
    ),
    daily AS (
        SELECT day, MAX(running) AS max_in_day, SUM(delta) AS net
        FROM run GROUP BY day
    )
    SELECT day,
           CAST(GREATEST(
               max_in_day,
               COALESCE(SUM(net) OVER (ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           ) AS BIGINT) AS peak_concurrency
    FROM daily
    ORDER BY day
    """,
)
def events_concurrency_daily_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak simultaneous user sessions per day: sessionize the events
    fixture (same gaps-and-islands semantics as ``events_sessionize``),
    then sweep the session intervals.  The DuckDB oracle runs the
    sequential global sweep; the Spark plan is the two-level prefix sum
    — the per-day maxima plus carried-in open counts must agree exactly,
    including sessions that stay open across midnight (the carry path)."""
    sessions = sessionize_batch(load_table(spark, sf_dir, "events"))
    return interval_concurrency_daily(sessions)
