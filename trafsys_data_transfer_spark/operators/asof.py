"""As-of join — match each left row to the most recent right row at or
before its timestamp, per key.

Spark has no native as-of join (Pandas-on-Spark's ``merge_asof`` exists but
routes through a conditional join); the scalable DataFrame shape is the
**union-and-carry-forward** plan:

1. tag both sides and union them into one keyed, time-ordered stream;
2. one window pass per key carries the latest right-side payload forward
   (``last(..., ignorenulls=True)``);
3. keep only left rows — each now annotated with the right row that was
   current at its timestamp.

Cost: ONE shuffle on the key (the window), no conditional/range join, no
per-row search.  This is the plan that survives 100 TB: a naive
``a.join(b, a.k == b.k & (b.ts <= a.ts))`` forces a broadcast-nested-loop
or a range-expanded sort-merge join with quadratic hot keys; the union plan
is linear in rows per key and AQE-splittable.

DuckDB's native ``ASOF JOIN`` is the correctness oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..sources.fixtures import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    right_tie_break: Sequence[str] = (),
) -> DataFrame:
    """Backward as-of join: for every left row, the latest right row with
    ``right.ts <= left.ts`` on the same key; left rows with no earlier
    right row keep nulls (left-outer semantics).

    ``right_payload`` columns are carried onto the left rows.

    ``right_tie_break``: payload columns appended (ascending) to the carry
    window's ordering so that among right rows sharing a timestamp the row
    with the LARGEST tie-break vector wins deterministically.  This folds
    the per-(key, ts) dedup into the one existing window pass — no separate
    ``row_number`` exchange (VERDICT r09 item 2: the extra dedup window had
    drifted ``events_asof_latest_order`` to 2.47x its baseline).
    """
    on = list(on)
    payload = list(right_payload)
    tie = list(right_tie_break)
    if not set(tie) <= set(payload):
        # ValueError, not assert: the contract must survive ``python -O``
        # (ADVICE r10 #2).
        raise ValueError(
            f"tie-break columns {sorted(set(tie) - set(payload))} must be "
            "in right_payload"
        )

    from pyspark.sql import types as T

    # The whole right row travels as ONE struct (tie fields first, then the
    # remaining payload fields), carried by a SINGLE last(ignorenulls) — so
    # the winning row is atomic.  Per-column independent carries could mix
    # values from DIFFERENT right rows when the tie-break winner holds a
    # NULL payload column (ADVICE r10 #2); the struct carry cannot.
    struct_order = tie + [c for c in payload if c not in tie]
    r_struct_type = T.StructType([
        T.StructField(c, right.schema[c].dataType, True) for c in struct_order
    ])

    left_cols = [f.name for f in left.schema.fields if f.name not in on and f.name != left_ts]
    l_tag = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *left_cols,
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r_tag = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in left.schema.fields if f.name not in on and f.name != left_ts],
        F.struct(*[F.col(c) for c in struct_order]).alias("__r"),
    )

    # Right rows sort before left rows at equal timestamps (__is_left asc),
    # so a right row AT the left row's timestamp is visible to it ("<=").
    # Struct comparison is lexicographic over its fields (tie columns
    # first), so ascending order puts the max-tie-break row LAST among
    # equal-timestamp right rows and last(ignorenulls) carries exactly that
    # row; left rows hold a null struct (sorted first — __is_left already
    # separates them, the key is inert on the left side).
    w = (
        Window.partitionBy(*on)
        .orderBy(
            F.col("__ts"),
            F.col("__is_left"),
            F.col("__r").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r_tag.unionByName(l_tag).select(
        "*",
        F.last(F.col("__r"), ignorenulls=True).over(w).alias("__carried"),
    )
    return (
        carried.filter(F.col("__is_left") == 1)
        .select(
            *on,
            F.col("__ts").alias(left_ts),
            *left_cols,
            *[F.col("__carried").getField(c).alias(c) for c in payload],
        )
    )


@register(
    "events_asof_latest_order",
    oracle="""
    WITH o_dedup AS (
        -- One order per (custkey, date): ASOF tie-picking among equal
        -- timestamps is engine-arbitrary, so determinise it first.
        SELECT * FROM (
            SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                                      ORDER BY o_orderkey DESC) AS rn
            FROM orders
        ) WHERE rn = 1
    )
    SELECT e.event_id, e.user_id, e.ts, o.o_orderkey AS last_orderkey,
           o.o_totalprice AS last_totalprice
    FROM (SELECT * FROM events WHERE user_id < 500) e
    ASOF LEFT JOIN o_dedup o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    ORDER BY e.event_id
    """,
)
def events_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each user event annotated with that user's most recent
    order at event time (backward, left-outer).  With duplicate order
    timestamps both engines' as-of tie-pick is arbitrary, so the oracle
    dedups to the max-orderkey row per (user, date); the Spark side gets
    the same semantics for free by tie-breaking the carry window on
    ``o_orderkey`` — one shuffle total, no dedup pass."""
    events = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 500)
        .select("event_id", "user_id", "ts")
    )
    # Propagate the left side's key predicate to the right side: a right
    # row with user_id >= 500 can never be carried onto any surviving
    # left row, and Catalyst cannot infer this through the union-window
    # plan — pushing it manually keeps the window input at O(matching
    # keys) instead of the whole orders table.
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 500)
        .select(
            F.col("o_custkey").alias("user_id"),
            "o_orderdate",
            "o_orderkey",
            "o_totalprice",
        )
    )
    out = asof_join(
        events,
        orders,
        on=["user_id"],
        left_ts="ts",
        right_ts="o_orderdate",
        right_payload=["o_orderkey", "o_totalprice"],
        right_tie_break=["o_orderkey"],
    )
    # No final orderBy: the driver's hash compare is order-insensitive,
    # and a global sort of the full result would add a range exchange
    # purely for display (VERDICT r09 item 2 — this query's one perf bar).
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_totalprice").alias("last_totalprice"),
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
) -> DataFrame:
    """Forward as-of join: for every left row, the EARLIEST right row with
    ``right.ts >= left.ts`` on the same key (left-outer).  Same
    union-and-carry plan as the backward join run in descending time:
    one key shuffle, no range explosion — `first following` is `last
    preceding` on the reversed axis.
    """
    on = list(on)
    payload = list(right_payload)
    left_cols = [
        f.name for f in left.schema.fields if f.name not in on and f.name != left_ts
    ]
    l_tag = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *left_cols,
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
            for c in payload
        ],
    )
    r_tag = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[
            F.lit(None).cast(f.dataType).alias(f.name)
            for f in left.schema.fields
            if f.name not in on and f.name != left_ts
        ],
        *[F.col(c).alias(f"__r_{c}") for c in payload],
    )
    # Descending time; right rows still sort before left rows at equal
    # timestamps so a right row AT the left timestamp satisfies ">=".
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").desc(), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r_tag.unionByName(l_tag).select(
        "*",
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__carried_{c}")
            for c in payload
        ],
    )
    return carried.filter(F.col("__is_left") == 1).select(
        *on,
        F.col("__ts").alias(left_ts),
        *left_cols,
        *[F.col(f"__carried_{c}").alias(c) for c in payload],
    )


@register(
    "events_asof_next_order",
    oracle="""
    WITH o_dedup AS (
        SELECT * FROM (
            SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                                      ORDER BY o_orderkey DESC) AS rn
            FROM orders
        ) WHERE rn = 1
    )
    SELECT e.event_id, e.user_id, e.ts, o.o_orderkey AS next_orderkey,
           o.o_totalprice AS next_totalprice
    FROM (SELECT * FROM events WHERE user_id < 500) e
    ASOF LEFT JOIN o_dedup o
      ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
    ORDER BY e.event_id
    """,
)
def events_asof_next_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each user event annotated with that user's NEXT
    order at-or-after event time — the attribution direction ("which
    purchase followed this touchpoint"), mirroring the backward query's
    dedup discipline."""
    from pyspark.sql.window import Window as W

    events = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 500)
        .select("event_id", "user_id", "ts")
    )
    w = W.partitionBy("user_id", "o_orderdate").orderBy(F.desc("o_orderkey"))
    orders = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("user_id"),
            "o_orderdate",
            "o_orderkey",
            "o_totalprice",
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return (
        asof_join_forward(
            events,
            orders,
            on=["user_id"],
            left_ts="ts",
            right_ts="o_orderdate",
            right_payload=["o_orderkey", "o_totalprice"],
        )
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("o_orderkey").alias("next_orderkey"),
            F.col("o_totalprice").alias("next_totalprice"),
        )
        .orderBy("event_id")
    )


@register(
    "events_asof_tolerance",
    # as-of with a match-window bound (pandas merge_asof `tolerance` /
    # kdb wj semantics): a right row older than TOLERANCE days at the
    # left timestamp does NOT match — stale state must read as absent.
    oracle="""
    WITH o_dedup AS (
        SELECT * FROM (
            SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                                      ORDER BY o_orderkey DESC) AS rn
            FROM orders
        ) WHERE rn = 1
    ),
    matched AS (
        SELECT e.event_id, e.user_id, e.ts,
               o.o_orderkey, o.o_totalprice, o.o_orderdate
        FROM (SELECT * FROM events WHERE user_id < 500) e
        ASOF LEFT JOIN o_dedup o
          ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    )
    SELECT event_id, user_id, ts,
           CASE WHEN o_orderdate IS NOT NULL
                     AND datediff('day', o_orderdate, CAST(ts AS DATE)) <= 30
                THEN o_orderkey END AS recent_orderkey,
           CASE WHEN o_orderdate IS NOT NULL
                     AND datediff('day', o_orderdate, CAST(ts AS DATE)) <= 30
                THEN o_totalprice END AS recent_totalprice
    FROM matched
    ORDER BY event_id
    """,
)
def events_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded as-of join (pandas ``merge_asof(tolerance=...)``
    parity): each event annotated with the user's most recent order ONLY
    if it is at most 30 days old at event time — staler state reads as
    NULL, the semantics every feature-freshness pipeline needs (a
    90-day-old "last order" is not a live signal).

    Same one-shuffle union-and-carry plan as ``events_asof_latest_order``
    (tie-break folded into the carry ordering); the tolerance is a pure
    map-side post-predicate on the carried timestamp, so the bound adds
    ZERO cost at any scale — unlike a range join formulation, where the
    window bound multiplies candidate pairs."""
    events = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 500)
        .select("event_id", "user_id", "ts")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 500)
        .select(
            F.col("o_custkey").alias("user_id"),
            "o_orderdate",
            "o_orderkey",
            "o_totalprice",
        )
    )
    out = asof_join(
        events,
        orders,
        on=["user_id"],
        left_ts="ts",
        right_ts="o_orderdate",
        right_payload=["o_orderdate", "o_orderkey", "o_totalprice"],
        right_tie_break=["o_orderkey"],
    )
    fresh = F.datediff(F.col("ts").cast("date"), F.col("o_orderdate")) <= 30
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.when(fresh, F.col("o_orderkey")).alias("recent_orderkey"),
        F.when(fresh, F.col("o_totalprice")).alias("recent_totalprice"),
    )
