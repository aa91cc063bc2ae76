"""Interval coalescing — merge overlapping/adjacent ranges per key.

The range twin of sessionization: sessions cluster POINT events by gap,
interval coalescing merges RANGES ([start, end] spans — playback
segments, on-call shifts, maintenance windows, validity ranges) into
maximal non-overlapping islands.  Every warehouse grows this query
("gaps and islands"); none of the reference's operators cover it.

Spark-first algebra, one window pass (no join, no explode):

1. order each key's intervals by (start, end, id);
2. an interval starts a NEW island iff its start exceeds the running
   maximum of all PREVIOUS ends (strictly greater — touching intervals
   merge): ``start > max(end) OVER (... ROWS UNBOUNDED PRECEDING TO
   1 PRECEDING)``;
3. the island id is the running SUM of new-island flags; group by
   (key, island) → min(start), max(end), count.

Cost: ONE shuffle on the key (the window and the final groupBy share
the partitioning — Catalyst reuses the exchange), narrow codegen
expressions in between.  At 100 TB that is the floor for any
order-dependent per-key pass; skewed keys ride the same AQE/salting
levers as every other keyed window in the package.

The oracle replays the identical algebra in DuckDB — both engines
implement ANSI window frames, so the hash check certifies frame
semantics (the 1-PRECEDING running max is exactly where off-by-one
frame bugs live).

The reference engine (/root/reference/script.js) has no interval
operators; this extends the mandated analytics surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..sources.fixtures import load_table


def coalesce_intervals(
    intervals: DataFrame,
    key_col: str = "key",
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Maximal merged islands per key: ``(key, island_start, island_end,
    n_merged)``.  Touching intervals (next.start == prev.end) merge;
    zero-length intervals participate like any other."""
    order = [F.col(start_col), F.col(end_col)]
    w_prev = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = intervals.withColumn(
        "_new",
        F.when(
            F.col(start_col) > F.max(end_col).over(w_prev), 1
        ).otherwise(0),
    ).withColumn("_island", F.sum("_new").over(w_run))
    return flagged.groupBy(key_col, "_island").agg(
        F.min(start_col).alias("island_start"),
        F.max(end_col).alias("island_end"),
        F.count(F.lit(1)).alias("n_merged"),
    ).drop("_island")


def coalesce_intervals_salted(
    intervals: DataFrame,
    key_col: str = "key",
    start_col: str = "start",
    end_col: str = "end",
    n_salt: int = 16,
) -> DataFrame:
    """Hot-key-safe interval coalescing — same output as
    :func:`coalesce_intervals` (column order included), two phases:

    1. partition by (key, salt) where salt is a DETERMINISTIC hash of
       the interval bounds, and merge islands WITHIN each salt bucket —
       the straggler key's rows spread over ``n_salt`` tasks;
    2. re-merge the partial islands per key with the identical window
       algebra, summing ``n_merged``.

    Correct because interval merging is ASSOCIATIVE and IDEMPOTENT on
    (start, end, count) sets — ``islands(islands(X) ∪ islands(Y)) ==
    islands(X ∪ Y)`` with counts additive (the same algebra the
    streaming twin's state relies on, streaming/islands.py) — so phase 1
    may split a key's rows ARBITRARILY.  Phase 2's per-key input is
    O(islands · n_salt), not O(rows): a hot key with millions of rows in
    a handful of real islands re-merges in microseconds.  Measured under
    a 30%-single-key skew in SCALE.md's twenty-second sweep."""
    salted = intervals.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(F.col(start_col), F.col(end_col)), F.lit(n_salt)
        ),
    )
    # phase 1: the exact coalesce_intervals algebra over the composite
    # (key, salt) partition
    order1 = [F.col(start_col), F.col(end_col)]
    w1_prev = (
        Window.partitionBy(key_col, "_salt")
        .orderBy(*order1)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w1_run = (
        Window.partitionBy(key_col, "_salt")
        .orderBy(*order1)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    partial = (
        salted.withColumn(
            "_new",
            F.when(
                F.col(start_col) > F.max(end_col).over(w1_prev), 1
            ).otherwise(0),
        )
        .withColumn("_island", F.sum("_new").over(w1_run))
        .groupBy(key_col, "_salt", "_island")
        .agg(
            F.min(start_col).alias("island_start"),
            F.max(end_col).alias("island_end"),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .drop("_salt", "_island")
    )
    order = [F.col("island_start"), F.col("island_end")]
    w_prev = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = partial.withColumn(
        "_new",
        F.when(
            F.col("island_start") > F.max("island_end").over(w_prev), 1
        ).otherwise(0),
    ).withColumn("_island", F.sum("_new").over(w_run))
    return flagged.groupBy(key_col, "_island").agg(
        F.min("island_start").alias("island_start"),
        F.max("island_end").alias("island_end"),
        F.sum("n_merged").alias("n_merged"),
    ).drop("_island")


@register(
    "events_interval_islands",
    # identical window algebra replayed in DuckDB: running max of prior
    # ends (ROWS ... 1 PRECEDING) flags island starts, running sum
    # numbers the islands
    oracle="""
    WITH iv AS (
        SELECT user_id,
               ts AS s,
               ts + INTERVAL 1 MINUTE * (event_id % 7 + 1) AS e
        FROM events
    ),
    flagged AS (
        SELECT user_id, s, e,
               CASE WHEN s > MAX(e) OVER (
                        PARTITION BY user_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS new_island
        FROM iv
    ),
    islands AS (
        SELECT user_id, s, e,
               SUM(new_island) OVER (
                   PARTITION BY user_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS island
        FROM flagged
    )
    SELECT user_id,
           MIN(s) AS island_start,
           MAX(e) AS island_end,
           CAST(COUNT(*) AS BIGINT) AS n_merged
    FROM islands
    GROUP BY user_id, island
    ORDER BY user_id, island_start
    """,
)
def events_interval_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coalesce per-user activity intervals (each event spans
    ``event_id % 7 + 1`` minutes from its timestamp — deterministic
    synthetic durations) into maximal merged islands: the gaps-and-
    islands query over RANGES, one keyed window pass, hash-checked
    against the identical frame algebra in DuckDB."""
    events = load_table(spark, sf_dir, "events")
    iv = events.select(
        "user_id",
        F.col("ts").alias("start"),
        (
            F.col("ts")
            + F.make_interval(mins=(F.col("event_id") % 7 + 1).cast("int"))
        ).alias("end"),
    )
    return (
        coalesce_intervals(iv, key_col="user_id")
        .orderBy("user_id", "island_start")
    )


@register(
    "events_interval_gaps",
    # the islands oracle extended one LEAD: a gap is the open span
    # between an island's end and the next island's start
    oracle="""
    WITH iv AS (
        SELECT user_id,
               ts AS s,
               ts + INTERVAL 1 MINUTE * (event_id % 7 + 1) AS e
        FROM events WHERE user_id % 10 = 0
    ),
    flagged AS (
        SELECT user_id, s, e,
               CASE WHEN s > MAX(e) OVER (
                        PARTITION BY user_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS new_island
        FROM iv
    ),
    islands AS (
        SELECT user_id,
               MIN(s) AS island_start,
               MAX(e) AS island_end
        FROM (
            SELECT user_id, s, e,
                   SUM(new_island) OVER (
                       PARTITION BY user_id ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS island
            FROM flagged
        ) GROUP BY user_id, island
    )
    SELECT user_id,
           island_end AS gap_start,
           LEAD(island_start) OVER (
               PARTITION BY user_id ORDER BY island_start) AS gap_end,
           CAST(date_diff('second', island_end,
                LEAD(island_start) OVER (
                    PARTITION BY user_id ORDER BY island_start))
                AS BIGINT) AS gap_secs
    FROM islands
    QUALIFY gap_end IS NOT NULL
    ORDER BY user_id, gap_start
    """,
)
def events_interval_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLEMENT of interval coalescing: per-user idle gaps between
    consecutive activity islands — downtime windows, coverage holes,
    maintenance slack.  "Gaps" is the half of gaps-and-islands the r8
    operator left on the table; it composes as one LEAD over the
    (already tiny) islands relation, so the expensive pass is shared
    with :func:`events_interval_islands` and the gap step is
    O(islands), not O(rows)."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % 10 == 0
    )
    iv = events.select(
        "user_id",
        F.col("ts").alias("start"),
        (
            F.col("ts")
            + F.make_interval(mins=(F.col("event_id") % 7 + 1).cast("int"))
        ).alias("end"),
    )
    isl = coalesce_intervals(iv, key_col="user_id")
    w = Window.partitionBy("user_id").orderBy("island_start")
    gaps = isl.select(
        "user_id",
        F.col("island_end").alias("gap_start"),
        F.lead("island_start").over(w).alias("gap_end"),
    )
    return (
        gaps.filter(F.col("gap_end").isNotNull())
        .select(
            "user_id",
            "gap_start",
            "gap_end",
            (
                F.unix_timestamp("gap_end") - F.unix_timestamp("gap_start")
            ).alias("gap_secs"),
        )
        .orderBy("user_id", "gap_start")
    )
