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


# ---------------------------------------------------------------------------
# Interval overlap join — bucketized, no cartesian, no dedup shuffle
# ---------------------------------------------------------------------------

#: 6-hour buckets in microseconds: wide enough that a typical interval
#: expands to a handful of rows, narrow enough that a (key, bucket) cell
#: never concentrates a join explosion.  Callers tune per workload.
OVERLAP_BUCKET_US = 21_600_000_000


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    key_col: str,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bucket_us: int = OVERLAP_BUCKET_US,
) -> DataFrame:
    """All (a, b) pairs sharing a key whose CLOSED intervals overlap
    (``a_start <= b_end AND b_start <= a_end``; bounds in epoch
    microseconds).  The classic scale trap here is the naive theta-join
    — Spark plans key-equality + range predicates as a join whose range
    half filters AFTER a per-key cartesian, quadratic in rows-per-key.

    Spark-first shape (the spatial-join recipe, time as 1-D space):

    1. explode each interval into the coarse time buckets it touches
       (``sequence(start div W, end div W)`` — O(length/W) rows, bounded
       for bounded intervals);
    2. equi-join on ``(key, bucket)`` — hash join, no range predicate in
       the join condition, AQE-splittable like any other shuffle join;
    3. keep a pair only in the FIRST bucket both intervals touch
       (``bucket == greatest(a_start, b_start) div W``) — the standard
       dedup-free trick: every overlapping pair shares that bucket by
       construction, so no ``distinct()`` shuffle is ever needed;
    4. apply the exact overlap predicate.

    Cost: one shuffle of the expanded (bounded) inputs.  The DuckDB
    oracle runs the plain theta-join — fine at sf0.01, exactly what the
    bucketed plan must reproduce bit-for-bit.
    """
    w = F.lit(int(bucket_us))
    ab = a.withColumn(
        "_bk",
        F.explode(
            F.sequence(
                F.expr(f"{a_start} div {int(bucket_us)}"),
                F.expr(f"{a_end} div {int(bucket_us)}"),
            )
        ),
    )
    bb = b.withColumn(
        "_bk",
        F.explode(
            F.sequence(
                F.expr(f"{b_start} div {int(bucket_us)}"),
                F.expr(f"{b_end} div {int(bucket_us)}"),
            )
        ),
    )
    first_shared = F.col("_bk") == (
        F.greatest(F.col(a_start), F.col(b_start)) / w
    ).cast("long")
    overlap = (F.col(a_start) <= F.col(b_end)) & (
        F.col(b_start) <= F.col(a_end)
    )
    return ab.join(bb, [key_col, "_bk"]).filter(first_shared & overlap).drop(
        "_bk"
    )


@register(
    "events_interval_overlap",
    # plain theta-join oracle: session islands (the islands algebra over
    # 5-minute view spans) x 30-minute purchase lookback windows
    oracle="""
    WITH v AS (
        SELECT user_id,
               epoch_us(ts) AS s,
               epoch_us(ts + INTERVAL 5 MINUTE) AS e
        FROM events WHERE event_type = 'view'
    ),
    flagged AS (
        SELECT user_id, s, e,
               CASE WHEN s > MAX(e) OVER (
                        PARTITION BY user_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS new_island
        FROM v
    ),
    sess AS (
        SELECT user_id,
               MIN(s) AS session_start_us,
               MAX(e) AS session_end_us
        FROM (
            SELECT user_id, s, e,
                   SUM(new_island) OVER (
                       PARTITION BY user_id ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS island
            FROM flagged
        ) GROUP BY user_id, island
    ),
    pur AS (
        SELECT user_id,
               event_id AS purchase_id,
               epoch_us(ts - INTERVAL 30 MINUTE) AS ps,
               epoch_us(ts) AS pe
        FROM events WHERE event_type = 'purchase'
    )
    SELECT s.user_id,
           s.session_start_us,
           s.session_end_us,
           p.purchase_id,
           LEAST(s.session_end_us, p.pe) - GREATEST(s.session_start_us, p.ps)
               AS overlap_us
    FROM sess s JOIN pur p
      ON s.user_id = p.user_id
     AND s.session_start_us <= p.pe
     AND p.ps <= s.session_end_us
    ORDER BY s.user_id, session_start_us, purchase_id
    """,
)
def events_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which coalesced view-sessions overlap which purchase lookback
    windows — attribution's interval form, and the general two-table
    overlap join (reservations x outages, shifts x incidents) the
    single-table islands operators can't express.  Sessions come from
    :func:`coalesce_intervals` over 5-minute view spans; windows are the
    30 minutes before each purchase; the join is the bucketized
    :func:`interval_overlap_join` (first-shared-bucket dedup, no
    cartesian), hash-checked against DuckDB's plain theta-join."""
    events = load_table(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view").select(
        "user_id",
        F.unix_micros("ts").alias("start"),
        (F.unix_micros("ts") + F.lit(300_000_000)).alias("end"),
    )
    sess = coalesce_intervals(views, key_col="user_id").select(
        "user_id",
        F.col("island_start").alias("session_start_us"),
        F.col("island_end").alias("session_end_us"),
    )
    pur = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        (F.unix_micros("ts") - F.lit(1_800_000_000)).alias("ps"),
        F.unix_micros("ts").alias("pe"),
    )
    j = interval_overlap_join(
        sess,
        pur,
        key_col="user_id",
        a_start="session_start_us",
        a_end="session_end_us",
        b_start="ps",
        b_end="pe",
    )
    return j.select(
        "user_id",
        "session_start_us",
        "session_end_us",
        "purchase_id",
        (
            F.least("session_end_us", "pe")
            - F.greatest("session_start_us", "ps")
        ).alias("overlap_us"),
    ).orderBy("user_id", "session_start_us", "purchase_id")


# ---------------------------------------------------------------------------
# FIFO lot matching — a "sequential" allocation as interval overlap
# ---------------------------------------------------------------------------

@register(
    "lineitem_fifo_matching",
    # cumulative-quantity windows on both sides + plain theta overlap
    oracle="""
    WITH supply AS (
        SELECT l_partkey,
               l_orderkey AS s_orderkey,
               l_linenumber AS s_linenumber,
               SUM(CAST(l_quantity AS BIGINT)) OVER (
                   PARTITION BY l_partkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - CAST(l_quantity AS BIGINT) AS s_lo,
               SUM(CAST(l_quantity AS BIGINT)) OVER (
                   PARTITION BY l_partkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS s_hi
        FROM lineitem WHERE l_returnflag = 'N'
    ),
    demand AS (
        SELECT l_partkey,
               l_orderkey AS d_orderkey,
               l_linenumber AS d_linenumber,
               SUM(CAST(l_quantity AS BIGINT)) OVER (
                   PARTITION BY l_partkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - CAST(l_quantity AS BIGINT) AS d_lo,
               SUM(CAST(l_quantity AS BIGINT)) OVER (
                   PARTITION BY l_partkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS d_hi
        FROM lineitem WHERE l_returnflag = 'R'
    )
    SELECT s.l_partkey,
           s.s_orderkey, s.s_linenumber,
           d.d_orderkey, d.d_linenumber,
           CAST(LEAST(s.s_hi, d.d_hi) - GREATEST(s.s_lo, d.d_lo)
                AS BIGINT) AS qty_matched
    FROM supply s JOIN demand d
      ON s.l_partkey = d.l_partkey
     AND s.s_lo < d.d_hi AND d.d_lo < s.s_hi
    ORDER BY s.l_partkey, s.s_orderkey, s.s_linenumber,
             d.d_orderkey, d.d_linenumber
    """,
)
def lineitem_fifo_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO lot matching — consume supply lots ('N' lineitems, shipdate
    order) against demands ('R' lineitems, shipdate order) per part: the
    cost-basis / inventory-netting allocation every ledger needs, and the
    textbook example of a "sequential" fold that is NOT sequential.

    Spark-first identity: in cumulative-quantity space each lot occupies
    the half-open interval ``[cum_prev, cum)`` and each demand likewise;
    FIFO matches lot i to demand j for exactly
    ``min(hi_i, hi_j) − max(lo_i, lo_j)`` units wherever those intervals
    overlap.  So the whole allocation is two cumulative windows (one
    keyed exchange each) plus :func:`interval_overlap_join` in quantity
    space — no loop, no state, no per-key iteration, and the output is
    O(supplies + demands) per part (overlapping interval chains form a
    merge, not a cross product).  The DuckDB oracle replays the naive
    theta-join form; matched quantities are exact integers."""
    from ..session import spread

    # r11: project narrow + establish the l_partkey partitioning ONCE —
    # both cumulative windows below are keyed on l_partkey, so they reuse
    # this single exchange (guide §2.4) instead of each paying its own
    # shuffle off a separate single-partition scan of lineitem.
    li = spread(
        load_table(spark, sf_dir, "lineitem").select(
            "l_partkey",
            "l_orderkey",
            "l_linenumber",
            "l_shipdate",
            "l_quantity",
            "l_returnflag",
        ),
        "l_partkey",
    )

    def cum_side(flag: str, prefix: str) -> DataFrame:
        w = (
            Window.partitionBy("l_partkey")
            .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        qty = F.col("l_quantity").cast("long")
        return li.filter(F.col("l_returnflag") == flag).select(
            "l_partkey",
            F.col("l_orderkey").alias(f"{prefix}_orderkey"),
            F.col("l_linenumber").alias(f"{prefix}_linenumber"),
            (F.sum(qty).over(w) - qty).alias(f"{prefix}_lo"),
            F.sum(qty).over(w).alias(f"{prefix}_hi"),
        )

    supply = cum_side("N", "s")
    demand = cum_side("R", "d")
    j = interval_overlap_join(
        supply,
        demand,
        key_col="l_partkey",
        a_start="s_lo",
        a_end="s_hi",
        b_start="d_lo",
        b_end="d_hi",
        bucket_us=1024,  # quantity-space buckets; lots are 1-50 units
    )
    qty_matched = F.least("s_hi", "d_hi") - F.greatest("s_lo", "d_lo")
    return (
        j.select(
            "l_partkey",
            "s_orderkey",
            "s_linenumber",
            "d_orderkey",
            "d_linenumber",
            qty_matched.alias("qty_matched"),
        )
        # closed-bound helper admits touching (qty 0) pairs; half-open
        # FIFO intervals drop them
        .filter(F.col("qty_matched") > 0)
        .orderBy(
            "l_partkey", "s_orderkey", "s_linenumber",
            "d_orderkey", "d_linenumber",
        )
    )
