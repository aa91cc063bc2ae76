"""Window-function and grouping-set analytics over the fixture tables.

The reference has no window functions (SURVEY.md §2.5) — its one ordering
construct is the watermark top-1 read.  These queries extend the engine's
relational surface with the window/grouping shapes any warehouse user of
the rebuilt engine would expect: ntile bucketing, per-group top-k via rank,
CUBE grouping sets, lag-based event gaps, and window-over-aggregate shares.

Scale notes (100 TB posture):
* Every window here partitions by a key whose per-partition row count is
  bounded (user, brand, nation) — no global `ORDER BY` window over the
  whole fact table, which would single-task.  The one global window
  (`ntile` over customers) is explicitly documented as the exception: it
  plans a single-partition sort, acceptable on dimension-sized inputs only.
* Windows sharing (partition, order) reuse one Exchange+Sort.
* CUBE expands inside a single hash aggregation — one shuffle for all 4
  grouping sets, map-side partials first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..sources.fixtures import load_table


@register(
    "customer_balance_deciles",
    oracle="""
    WITH ranked AS (
        SELECT c_acctbal,
               NTILE(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
        FROM customer)
    SELECT CAST(decile AS INT) AS decile,
           COUNT(*) AS n_customers,
           ROUND(MIN(c_acctbal), 2) AS min_bal,
           ROUND(MAX(c_acctbal), 2) AS max_bal,
           ROUND(AVG(c_acctbal), 4) AS avg_bal
    FROM ranked
    GROUP BY decile
    ORDER BY decile
    """,
)
def customer_balance_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE bucketing: customers split into 10 equal-frequency balance
    deciles, then aggregated per decile.

    A global ntile needs a total order → Spark plans one single-partition
    window sort.  That is the documented cost of this operator: use it on
    dimension-sized tables (customers), never on the fact table — the
    fact-scale alternative is `approx_percentile` boundaries + a join,
    which `events_value_approx_quantiles` exercises.
    """
    cust = load_table(spark, sf_dir, "customer")
    # Dimension-sized input asserted in-plan (VERDICT r10 task 3).
    from ..operators.guards import bounded_window_guard

    cust = bounded_window_guard(cust, "customer_balance_deciles")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return (
        cust.select("c_acctbal", F.ntile(10).over(w).alias("decile"))
        .groupBy(F.col("decile").cast("int").alias("decile"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        )
        .orderBy("decile")
    )


@register(
    "top_parts_per_brand",
    oracle="""
    SELECT p_brand, p_partkey, p_name, p_retailprice, CAST(price_rank AS BIGINT) AS price_rank
    FROM (
        SELECT p_brand, p_partkey, p_name, p_retailprice,
               ROW_NUMBER() OVER (
                   PARTITION BY p_brand
                   ORDER BY p_retailprice DESC, p_partkey) AS price_rank
        FROM part)
    WHERE price_rank <= 3
    ORDER BY p_brand, price_rank
    """,
)
def top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k: 3 priciest parts per brand via row_number + filter.

    The canonical distributed top-k-per-group: one shuffle on the group
    key, per-partition sort, early filter — never a global sort.  At scale
    the rank filter prunes before any downstream join widens rows.
    """
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("p_retailprice"), F.asc("p_partkey")
    )
    return (
        part.select(
            "p_brand",
            "p_partkey",
            "p_name",
            "p_retailprice",
            F.row_number().over(w).cast("long").alias("price_rank"),
        )
        .filter(F.col("price_rank") <= 3)
        .orderBy("p_brand", "price_rank")
    )


@register(
    "orders_status_priority_cube",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
)
def orders_status_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets: order counts/value across every combination of
    (status, priority) including both marginals and the grand total.
    Spark expands CUBE inside a single hash aggregate — one shuffle for all
    four grouping sets, with map-side partial aggregation."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
        .orderBy("status", "priority")
    )


@register(
    "events_user_gaps",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(date_diff('second',
                LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                ts) AS BIGINT) AS gap_s,
           CAST(date_diff('second', ts,
                LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                AS BIGINT) AS next_gap_s
    FROM events
    WHERE user_id < 200
    ORDER BY user_id, ts, event_id
    """,
)
def events_user_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD: per-user seconds since the previous and until the next
    event — the inter-arrival primitive behind sessionization.  Both
    windows share (partition, order) so Spark plans one Exchange + one
    Sort; per-user partitions stay bounded at any corpus size."""
    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_s = F.unix_timestamp("ts")
    return (
        events.select(
            "event_id",
            "user_id",
            "ts",
            (ts_s - F.unix_timestamp(F.lag("ts").over(w))).alias("gap_s"),
            (F.unix_timestamp(F.lead("ts").over(w)) - ts_s).alias("next_gap_s"),
        )
        .orderBy("user_id", "ts", "event_id")
    )


@register(
    "events_value_histogram",
    oracle="""
    WITH b AS (
        SELECT event_type,
               LEAST(GREATEST(CAST(FLOOR(value / 50.0) AS INT), -20), 20) AS bucket
        FROM events
    )
    SELECT event_type, bucket,
           CAST(ROUND(bucket * 50.0, 1) AS DOUBLE) AS bucket_lo,
           COUNT(*) AS n
    FROM b
    GROUP BY event_type, bucket
    ORDER BY event_type, bucket
    """,
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram per event type: clamp-bucketed value counts.
    Binning is a narrow projection; the groupBy reduce side is O(types ×
    buckets) — the distributed histogram shape (map-side partials carry
    per-bucket counts, never rows).  At 100 TB this replaces collecting
    values for a driver-side histogram outright."""
    events = load_table(spark, sf_dir, "events")
    bucket = F.least(
        F.greatest(F.floor(F.col("value") / 50.0).cast("int"), F.lit(-20)),
        F.lit(20),
    )
    return (
        events.select("event_type", bucket.alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            "bucket",
            F.round(F.col("bucket") * 50.0, 1).alias("bucket_lo"),
            "n",
        )
        .orderBy("event_type", "bucket")
    )


@register(
    "events_regression_stats",
    oracle="""
    SELECT event_type,
           ROUND(REGR_SLOPE(value, date_diff('second', TIMESTAMP '2024-01-01', ts)), 6) AS slope,
           ROUND(REGR_INTERCEPT(value, date_diff('second', TIMESTAMP '2024-01-01', ts)), 2) AS intercept,
           ROUND(REGR_R2(value, date_diff('second', TIMESTAMP '2024-01-01', ts)), 6) AS r2,
           ROUND(COVAR_SAMP(value, date_diff('second', TIMESTAMP '2024-01-01', ts)), 2) AS cov_vt
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_regression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates per event type: is `value` drifting
    over time?  All four are single-pass distributive aggregates
    (sum/sum-of-products moments) — map-side partials, O(groups) reduce,
    the same cost profile as a plain sum at any scale.

    The regressor is seconds since the corpus epoch, not raw Unix epoch:
    x ≈ 1.7e9 squares into moment sums that lose the engines' agreement
    to catastrophic cancellation; centering is what any numerically sane
    regression over timestamps does."""
    events = load_table(spark, sf_dir, "events")
    ts_s = (
        F.unix_timestamp("ts")
        - F.unix_timestamp(F.lit("2024-01-01").cast("timestamp"))
    ).cast("double")
    v = F.col("value")
    return (
        events.groupBy("event_type")
        .agg(
            F.round(F.regr_slope(v, ts_s), 6).alias("slope"),
            F.round(F.regr_intercept(v, ts_s), 2).alias("intercept"),
            F.round(F.regr_r2(v, ts_s), 6).alias("r2"),
            F.round(F.covar_samp(v, ts_s), 2).alias("cov_vt"),
        )
        .orderBy("event_type")
    )


@register(
    "orders_above_customer_avg",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, ROUND(o.o_totalprice, 2) AS o_totalprice
    FROM orders o
    WHERE o.o_totalprice > 1.5 * (
        SELECT AVG(i.o_totalprice) FROM orders i WHERE i.o_custkey = o.o_custkey)
    ORDER BY o.o_orderkey
    """,
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: orders 50% above their own customer's
    average.  Expressed (as Catalyst itself decorrelates it) as an
    aggregate-then-join on the correlation key — one shuffle for the
    per-customer averages, one key join, no per-row subquery execution
    anywhere."""
    orders = load_table(spark, sf_dir, "orders")
    avgs = orders.groupBy("o_custkey").agg(F.avg("o_totalprice").alias("cust_avg"))
    return (
        orders.join(avgs, "o_custkey")
        .filter(F.col("o_totalprice") > 1.5 * F.col("cust_avg"))
        .select(
            "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice")
        )
        .orderBy("o_orderkey")
    )


@register(
    "events_funnel",
    oracle="""
    WITH stage AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_viewed,
           CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked,
           CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                     AND t_purchase > t_click THEN 1 ELSE 0 END) AS BIGINT) AS n_purchased
    FROM stage
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users whose first view precedes their first click
    precedes their first purchase.  One conditional-min aggregation per
    user (map-side partials, reduce side O(users)) then a global count —
    no joins, no per-event window, which is what keeps a funnel cheap on
    an unbounded event log."""
    events = load_table(spark, sf_dir, "events")

    def first_ts(etype: str):
        return F.min(F.when(F.col("event_type") == etype, F.col("ts")))

    stage = events.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return stage.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(viewed.cast("int")).alias("n_viewed"),
        F.sum(clicked.cast("int")).alias("n_clicked"),
        F.sum(purchased.cast("int")).alias("n_purchased"),
    )


@register(
    "orders_retention_cohort",
    oracle="""
    WITH firsts AS (
        SELECT o_custkey,
               MIN(CAST(date_trunc('month', o_orderdate) AS DATE))
                   OVER (PARTITION BY o_custkey) AS cohort_month,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month
        FROM orders
    )
    SELECT cohort_month,
           CAST(date_diff('month', cohort_month, order_month) AS BIGINT) AS months_since,
           COUNT(DISTINCT o_custkey) AS n_active
    FROM firsts
    GROUP BY 1, 2
    ORDER BY cohort_month, months_since
    """,
)
def orders_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: customers grouped by first-order month, counted as
    active in each subsequent month they order.  The cohort assignment is
    a min-window on the customer key; the retention matrix is one distinct
    aggregation keyed by (cohort, offset) — both shuffles are on bounded
    keys (customers, then months²)."""
    orders = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", "o_orderdate").cast("date")
    w = Window.partitionBy("o_custkey")
    firsts = orders.select(
        "o_custkey",
        F.min(month).over(w).alias("cohort_month"),
        month.alias("order_month"),
    )
    months_since = (
        (F.year("order_month") - F.year("cohort_month")) * 12
        + (F.month("order_month") - F.month("cohort_month"))
    ).cast("long")
    return (
        firsts.groupBy("cohort_month", months_since.alias("months_since"))
        .agg(F.countDistinct("o_custkey").alias("n_active"))
        .orderBy("cohort_month", "months_since")
    )


@register(
    "events_daily_activity_full_join",
    oracle="""
    WITH clicks AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n_clicks
        FROM events WHERE event_type = 'click' GROUP BY 1
    ),
    purchases AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               ROUND(SUM(value), 2) AS purchase_value
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT COALESCE(c.day, p.day) AS day,
           COALESCE(c.n_clicks, 0) AS n_clicks,
           COALESCE(p.purchase_value, 0.0) AS purchase_value
    FROM clicks c FULL JOIN purchases p ON c.day = p.day
    ORDER BY day
    """,
)
def events_daily_activity_full_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two daily aggregates — days present in either
    side survive with zero-filled gaps.  Both inputs are already reduced
    to O(days) rows before the join, so the full-outer (which cannot
    broadcast — both sides must shuffle) is over bounded data by
    construction; that aggregate-first ordering is the rule for outer
    joins at scale."""
    events = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("date").alias("day")
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy(day)
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(day)
        .agg(F.round(F.sum("value"), 2).alias("purchase_value"))
    )
    return (
        clicks.join(purchases, "day", "full_outer")
        .select(
            "day",
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.coalesce("purchase_value", F.lit(0.0)).alias("purchase_value"),
        )
        .orderBy("day")
    )


@register(
    "nation_revenue_share",
    oracle="""
    WITH nation_rev AS (
        SELECT r.r_name AS region_name, n.n_name AS nation_name,
               SUM(l.l_extendedprice * (1 - l.l_discount)) AS rev
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name)
    SELECT region_name, nation_name,
           ROUND(rev, 2) AS revenue,
           ROUND(rev / SUM(rev) OVER (PARTITION BY region_name), 6) AS region_share
    FROM nation_rev
    ORDER BY region_name, nation_name
    """,
)
def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-over-aggregate: each nation's share of its region's revenue.
    The expensive part (fact-table aggregation) happens first and shrinks
    the data to O(nations) rows; the share window then runs on the tiny
    aggregate — the two-level pattern that keeps window input bounded at
    any fact-table scale."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    nation_rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
    )
    w = Window.partitionBy("region_name")
    return (
        nation_rev.select(
            "region_name",
            "nation_name",
            F.round("rev", 2).alias("revenue"),
            F.round(F.col("rev") / F.sum("rev").over(w), 6).alias("region_share"),
        )
        .orderBy("region_name", "nation_name")
    )


@register(
    "events_value_outliers",
    oracle="""
    WITH s AS (
        SELECT event_type, AVG(value) AS m, STDDEV_SAMP(value) AS sd
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           ROUND((e.value - s.m) / s.sd, 4) AS z
    FROM events e JOIN s USING (event_type)
    WHERE ABS((e.value - s.m) / s.sd) > 3
    ORDER BY e.event_id
    """,
)
def events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier detection per event type — the standard numeric
    scrub before a value column feeds training or analytics.

    Scale: the per-type (mean, stddev) table is O(event types) and
    **broadcast** back onto the fact scan — the corpus itself never
    shuffles; flagging is a narrow filter.  (A median/MAD variant slots in
    by swapping the stats aggregate; mean/stddev keeps the oracle exact.)
    """
    events = load_table(spark, sf_dir, "events")
    stats = events.groupBy("event_type").agg(
        F.avg("value").alias("m"), F.stddev_samp("value").alias("sd")
    )
    z = (F.col("value") - F.col("m")) / F.col("sd")
    return (
        events.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 3)
        .select("event_id", "event_type", "value", F.round(z, 4).alias("z"))
        .orderBy("event_id")
    )


@register(
    "events_sliding_active_users",
    # Spine-join formulation of Spark's sliding window(): every 3-hour
    # window sliding hourly that CONTAINS at least one event, with exact
    # distinct-user and event counts.  Spark's window() emits exactly the
    # non-empty windows; the inner spine join reproduces that.
    oracle="""
    WITH spine AS (
        SELECT unnest(generate_series(
            date_trunc('hour', (SELECT MIN(ts) FROM events)) - INTERVAL 2 HOUR,
            date_trunc('hour', (SELECT MAX(ts) FROM events)),
            INTERVAL 1 HOUR)) AS w_start
    )
    SELECT s.w_start AS w_start,
           s.w_start + INTERVAL 3 HOUR AS w_end,
           COUNT(DISTINCT e.user_id) AS n_users,
           COUNT(*) AS n_events
    FROM spine s
    JOIN events e
      ON e.ts >= s.w_start AND e.ts < s.w_start + INTERVAL 3 HOUR
    GROUP BY 1, 2
    ORDER BY 1
    """,
)
def events_sliding_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window engagement: distinct active users per 3-hour window
    sliding hourly — the overlapping-window shape (`window(ts, size,
    slide)`) that tumbling rollups can't express; each event lands in
    size/slide = 3 windows.

    Scale: the slide multiplies rows 3× BEFORE the shuffle, then exact
    `count_distinct` adds its expand — the cost model to know is
    rows × (size/slide) × 2 through one exchange.  When that bites at
    100 TB, swap `approx_count_distinct` or the HLL-sketch rollup
    (`dedup_hll_sketch_union`) into the same plan; the exact form here is
    what makes the oracle hashable.
    """
    events = load_table(spark, sf_dir, "events")
    w = F.window("ts", "3 hours", "1 hour")
    return (
        events.groupBy(w.alias("w"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n_users",
            "n_events",
        )
        .orderBy("w_start")
    )


@register(
    "events_sliding_active_users_hll",
    # Sketch-valued n_users can't cross engines; the strict row is the
    # certificate (VERDICT r08 task 3): exact window spine + exact
    # per-window counts, plus a boolean asserting the HLL estimate sits
    # within 4×rsd (min 2) of exact — the same spine-join oracle as the
    # exact twin, emitting TRUE per window.
    oracle="""
    WITH spine AS (
        SELECT unnest(generate_series(
            date_trunc('hour', (SELECT MIN(ts) FROM events)) - INTERVAL 2 HOUR,
            date_trunc('hour', (SELECT MAX(ts) FROM events)),
            INTERVAL 1 HOUR)) AS w_start
    )
    SELECT s.w_start AS w_start,
           s.w_start + INTERVAL 3 HOUR AS w_end,
           COUNT(DISTINCT e.user_id) AS exact_users,
           COUNT(*) AS n_events,
           TRUE AS users_within_tol
    FROM spine s
    JOIN events e
      ON e.ts >= s.w_start AND e.ts < s.w_start + INTERVAL 3 HOUR
    GROUP BY 1, 2
    ORDER BY 1
    """,
)
def events_sliding_active_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL tier the exact twin names: the same sliding-window plan
    with ``approx_count_distinct`` (rsd 2%) in place of the exact
    distinct expand — the per-window user sketch is O(1) mergeable state
    per window instead of O(users), so the shuffle carries sketches, not
    user ids.  Upgraded from rows-only to strict: the registered row
    carries exact per-window counts plus a within-tolerance boolean for
    the estimate; a broken sketch emits FALSE and hash-mismatches.  At
    100 TB the exact column is dropped and the sketch stands alone."""
    events = load_table(spark, sf_dir, "events")
    w = F.window("ts", "3 hours", "1 hour")
    # Exact twin as a separate pre-deduped two-stage agg joined back on
    # the window, NOT a countDistinct alongside the sketch: a distinct
    # aggregate mixed with regular ones forces an Expand (2x the
    # window-exploded rows through the shuffle).  distinct()+count is
    # partial-agg friendly and measured ~3x faster at sf0.1.
    agg = events.groupBy(w.alias("w")).agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    exact = (
        events.select(w.alias("w"), "user_id")
        .distinct()
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("exact_users"))
    )
    agg = agg.join(exact, "w")
    tol = F.greatest(F.lit(2.0), F.lit(0.08) * F.col("exact_users"))
    return agg.select(
        F.col("w.start").alias("w_start"),
        F.col("w.end").alias("w_end"),
        "exact_users",
        "n_events",
        (F.abs(F.col("n_users") - F.col("exact_users")) <= tol).alias(
            "users_within_tol"
        ),
    ).orderBy("w_start")


_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


@register(
    "profile_orders_columns",
    # One long-format row per column: the Deequ/Great-Expectations-style
    # completeness/cardinality profile, counts-only so every cell is an
    # exact integer (min/max would drag engine-specific value formatting
    # into the hash).
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{c}' AS column_name,
               COUNT(*) AS n_rows,
               COUNT(*) - COUNT({c}) AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(COUNT({c}) * 1000000 // COUNT(*) AS BIGINT) AS completeness_ppm
        FROM orders
        """
        for c in _PROFILE_COLS
    )
    + " ORDER BY column_name",
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data-quality profile of ``orders``: row count, null
    count, exact distinct cardinality and completeness (ppm) per column —
    the scan a warehouse runs before trusting a feed, complementing the
    inline `observe` gating (which asserts invariants; this MEASURES).

    Scale: ONE pass computes every per-column aggregate simultaneously
    (Spark evaluates the 6×3 aggregates in a single stage over a single
    scan); the long format is a stack() of the one aggregated row —
    nothing per-column touches the table again.  Exact COUNT(DISTINCT) on
    all columns in one pass expands rows ×columns through the shuffle; at
    100 TB swap in approx_count_distinct / HLL sketches per column, same
    plan shape.
    """
    orders = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.count(c).alias(f"{c}__present"),
        ]
    one = orders.agg(F.count(F.lit(1)).alias("n_rows"), *aggs)
    stack_expr = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__present" for c in _PROFILE_COLS
    )
    return (
        one.selectExpr(
            "n_rows",
            f"stack({len(_PROFILE_COLS)}, {stack_expr}) AS "
            "(column_name, n_nulls, n_distinct, n_present)",
        )
        .select(
            "column_name",
            "n_rows",
            "n_nulls",
            "n_distinct",
            F.expr("n_present * 1000000 div n_rows").alias("completeness_ppm"),
        )
        .orderBy("column_name")
    )


@register(
    "events_value_winsorize",
    # Exact linear-interpolation percentiles (Spark `percentile` ==
    # DuckDB `quantile_cont`), clamp accounting in integers; the clamped
    # SUM itself is withheld (cross-engine float sum order) — counts and
    # rounded bounds carry the semantics.
    oracle="""
    WITH b AS (
        SELECT event_type,
               quantile_cont(value, 0.05) AS p05,
               quantile_cont(value, 0.95) AS p95,
               COUNT(*) AS n
        FROM events GROUP BY event_type
    )
    SELECT e.event_type AS event_type,
           ROUND(b.p05, 4) AS p05,
           ROUND(b.p95, 4) AS p95,
           CAST(b.n AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN e.value < b.p05 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clamped_low,
           CAST(SUM(CASE WHEN e.value > b.p95 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clamped_high
    FROM events e JOIN b USING (event_type)
    GROUP BY e.event_type, b.p05, b.p95, b.n
    ORDER BY event_type
    """,
)
def events_value_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization bounds + clamp accounting per event type: exact
    p05/p95 (linear interpolation — Spark's `percentile` and DuckDB's
    `quantile_cont` share the definition) broadcast back onto the fact
    scan; rows outside the band are the ones a robust feature pipeline
    clamps.  Complements the z-score scrubs (`events_value_outliers`,
    seasonal LOO): quantile bounds hold under heavy tails where moment
    statistics saturate.

    Scale: O(types) bounds table broadcast; the fact table never shuffles
    (same shape as the outlier scrub).  Exact percentile needs the
    per-type sort — at 100 TB swap `approx_percentile` with a bounded
    error for the same plan.
    """
    events = load_table(spark, sf_dir, "events")
    bounds = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("p05"),
        F.expr("percentile(value, 0.95)").alias("p95"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return (
        events.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type", "p05", "p95", "n_rows")
        .agg(
            F.sum(F.when(F.col("value") < F.col("p05"), 1).otherwise(0)).alias(
                "n_clamped_low"
            ),
            F.sum(F.when(F.col("value") > F.col("p95"), 1).otherwise(0)).alias(
                "n_clamped_high"
            ),
        )
        .select(
            "event_type",
            F.round("p05", 4).alias("p05"),
            F.round("p95", 4).alias("p95"),
            "n_rows",
            "n_clamped_low",
            "n_clamped_high",
        )
        .orderBy("event_type")
    )


@register(
    "events_windowed_funnel",
    oracle="""
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN s1 USING (user_id)
        WHERE e.event_type = 'click'
          AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 24 HOUR
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN s2 USING (user_id)
        WHERE e.event_type = 'purchase'
          AND e.ts > s2.t2 AND e.ts <= s2.t2 + INTERVAL 24 HOUR
        GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_viewed,
           CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS n_clicked_24h,
           CAST((SELECT COUNT(*) FROM s3) AS BIGINT) AS n_purchased_24h
    """,
)
def events_windowed_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE sequential windowed funnel: first view → first click STRICTLY
    AFTER it and within 24 hours → first purchase within 24 hours of that
    click.  ``events_funnel`` compares global first occurrences (cheap,
    joinless, but a click made a week after the view still converts);
    this is the product-analytics semantics where each step must happen
    inside the conversion window of the previous one.

    Scale: K funnel steps = K user-keyed aggregate/join rounds, every one
    partitioned on the SAME key — Catalyst reuses the exchange, so the
    event log shuffles once and each subsequent round joins O(converting
    users) rows.  (A single-pass alternative — per-user sorted-array fold
    via `aggregate` — trades the extra rounds for interpreted HOF eval;
    measured slower at fixture scale and harder to oracle.)
    """
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    s1 = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        events.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(
            (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        events.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t2") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_clicked_24h")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("n_purchased_24h")))
    )


@register(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    t AS (
        SELECT prev_type, event_type AS next_type, COUNT(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    ),
    row_tot AS (
        SELECT prev_type, CAST(SUM(n) AS BIGINT) AS row_n FROM t GROUP BY prev_type
    )
    SELECT t.prev_type, t.next_type, CAST(t.n AS BIGINT) AS n,
           CAST(t.n * 1000000 // row_n AS BIGINT) AS p_ppm
    FROM t JOIN row_tot USING (prev_type)
    ORDER BY prev_type, next_type
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    counts and row-normalised probabilities (exact ppm integers) for each
    (prev → next) event-type pair — the behavioural-model input (next-step
    prediction, anomaly scoring against expected flows, funnel discovery)
    that sessionization and funnels don't surface.

    Scale: one (user) shuffle for the lag window; the transition table is
    O(types²) and the row totals derive from it — nothing else moves.
    """
    events = load_table(spark, sf_dir, "events")
    from pyspark.sql.window import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id",
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    t = seq.groupBy("prev_type", "next_type").agg(F.count(F.lit(1)).alias("n"))
    row_tot = t.groupBy("prev_type").agg(F.sum("n").alias("row_n"))
    return (
        t.join(F.broadcast(row_tot), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            F.expr("n * 1000000 div row_n").alias("p_ppm"),
        )
        .orderBy("prev_type", "next_type")
    )


@register(
    "events_ohlc_hourly",
    oracle="""
    WITH cents AS (
        SELECT event_type, ts, event_id,
               CAST(FLOOR(value * 100) AS BIGINT) AS v
        FROM events
    ),
    ranked AS (
        SELECT event_type,
               date_trunc('hour', ts) AS hour_start, v,
               ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                  ORDER BY ts, event_id) AS rn_a,
               ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM cents
    )
    SELECT event_type, hour_start,
           CAST(MAX(CASE WHEN rn_a = 1 THEN v END) AS BIGINT) AS open_cents,
           CAST(MAX(v) AS BIGINT) AS high_cents,
           CAST(MIN(v) AS BIGINT) AS low_cents,
           CAST(MAX(CASE WHEN rn_d = 1 THEN v END) AS BIGINT) AS close_cents,
           CAST(COUNT(*) AS BIGINT) AS volume
    FROM ranked
    GROUP BY event_type, hour_start
    ORDER BY event_type, hour_start
    """,
)
def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling into OHLC bars (the finance/metrics
    downsampling shape): per (event_type, hour), the first / max / min /
    last value in exact cents with event count as volume.  First/last
    are deterministic under ties via (ts, event_id) ordering —
    ``min_by``/``max_by`` over a (ts, event_id) struct stay entirely in
    the hash aggregate, so the plan is ONE shuffle on the group key with
    map-side partials: the 100 TB rollup shape, no window pass."""
    events = load_table(spark, sf_dir, "events")
    cents = events.select(
        "event_type",
        F.date_trunc("hour", "ts").alias("hour_start"),
        F.struct(F.col("ts"), F.col("event_id")).alias("ord"),
        F.floor(F.col("value") * 100).cast("long").alias("v"),
    )
    return (
        cents.groupBy("event_type", "hour_start")
        .agg(
            F.min_by("v", "ord").alias("open_cents"),
            F.max("v").alias("high_cents"),
            F.min("v").alias("low_cents"),
            F.max_by("v", "ord").alias("close_cents"),
            F.count(F.lit(1)).alias("volume"),
        )
        .orderBy("event_type", "hour_start")
    )


@register(
    "supplier_abc_classification",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100)
                             AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM lineitem GROUP BY l_suppkey
    ),
    ranked AS (
        SELECT l_suppkey, revenue_cents,
               SUM(revenue_cents) OVER (
                   ORDER BY revenue_cents DESC, l_suppkey
                   ROWS UNBOUNDED PRECEDING) AS cum_cents,
               SUM(revenue_cents) OVER () AS total_cents
        FROM rev
    )
    SELECT l_suppkey, revenue_cents,
           CAST(cum_cents AS BIGINT) AS cum_cents,
           CASE WHEN cum_cents * 100 <= total_cents * 70 THEN 'A'
                WHEN cum_cents * 100 <= total_cents * 90 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked
    ORDER BY l_suppkey
    """,
)
def supplier_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of suppliers by revenue: class A
    suppliers cover the first 70% of cumulative revenue, B the next 20%,
    C the tail — the inventory-management 80/20 operator.  All
    arithmetic in exact cents with integer threshold predicates
    (``cum*100 <= total*70``), so the class boundaries hash-match the
    oracle bit-for-bit (a float share would disagree at boundary
    suppliers).

    Plan: one map-side-combined groupBy over the fact table, then the
    ranking windows run over the AGGREGATED supplier relation —
    O(suppliers), a bounded dimension, which is what makes the global
    cumulative window acceptable (the documented O(groups) exception);
    the 100 TB cost is the fact scan, already minimal."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("long")
        .alias("cents"),
    )
    rev = li.groupBy("l_suppkey").agg(F.sum("cents").alias("revenue_cents"))
    # O(suppliers) group table asserted in-plan (VERDICT r10 task 3).
    from ..operators.guards import bounded_window_guard

    rev = bounded_window_guard(rev, "supplier_abc_classification")
    w_cum = Window.orderBy(
        F.col("revenue_cents").desc(), "l_suppkey"
    ).rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    ranked = rev.withColumn("cum_cents", F.sum("revenue_cents").over(w_cum)).withColumn(
        "total_cents", F.sum("revenue_cents").over(w_all)
    )
    return (
        ranked.select(
            "l_suppkey",
            "revenue_cents",
            "cum_cents",
            F.when(
                F.col("cum_cents") * 100 <= F.col("total_cents") * 70, "A"
            )
            .when(F.col("cum_cents") * 100 <= F.col("total_cents") * 90, "B")
            .otherwise("C")
            .alias("abc_class"),
        )
        .orderBy("l_suppkey")
    )


@register(
    "events_equidepth_histogram",
    oracle="""
    WITH vc AS (
        SELECT value, COUNT(*) AS n FROM events GROUP BY value
    ), c AS (
        SELECT value, n,
               SUM(n) OVER (ORDER BY value) AS cum,
               SUM(n) OVER () AS total
        FROM vc
    ), b AS (
        SELECT value, n,
               LEAST(CAST(((cum - 1) * 8) // total AS INT), 7) AS bucket
        FROM c
    )
    SELECT bucket,
           MIN(value) AS lo,
           MAX(value) AS hi,
           CAST(SUM(n) AS BIGINT) AS n_rows
    FROM b
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def events_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (quantile-binned): 8 buckets holding ~equal row
    counts, vs events_value_histogram's fixed-width bins.  The equi-depth
    shape is what optimizers and drift monitors actually want — a bucket
    per data mass, robust to heavy tails that pack a fixed-width histogram
    into two bins.

    Exactness contract: ties never straddle a boundary — the bucket is a
    pure integer function of each DISTINCT value's cumulative row count
    (``floor((cum-1)·k / N)``), so the result is identical under any
    partitioning and any engine; no NTILE row-splitting nondeterminism.

    Plan shape: one groupBy(value) shuffle compresses rows to distinct
    values (map-side partials), then the cumulative window runs over
    O(distinct) pre-aggregated rows — the same documented O(groups)
    single-partition exception as the other global windows; the 100 TB
    tier swaps boundaries to approx_percentile and keeps this as the
    exact auditor."""
    events = load_table(spark, sf_dir, "events")
    vc = events.groupBy("value").agg(F.count(F.lit(1)).alias("n"))
    # O(distinct values) relation asserted in-plan (VERDICT r10 task 3).
    from ..operators.guards import bounded_window_guard

    vc = bounded_window_guard(vc, "events_equidepth_histogram")
    w_cum = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    c = vc.select(
        "value",
        "n",
        F.sum("n").over(w_cum).alias("cum"),
        F.sum("n").over(w_all).alias("total"),
    )
    b = c.select(
        "value",
        "n",
        F.least(
            F.floor((F.col("cum") - 1) * 8 / F.col("total")).cast("int"),
            F.lit(7),
        ).alias("bucket"),
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
            F.sum("n").alias("n_rows"),
        )
        .orderBy("bucket")
    )


@register(
    "events_stats_unpivot",
    oracle="""
    WITH w AS (
        SELECT event_type,
               ROUND(SUM(value), 2) AS sum_value,
               ROUND(MIN(value), 2) AS min_value,
               ROUND(MAX(value), 2) AS max_value,
               CAST(COUNT(*) AS DOUBLE) AS n_rows
        FROM events GROUP BY event_type
    )
    SELECT event_type, 'sum_value' AS metric, sum_value AS metric_value FROM w
    UNION ALL
    SELECT event_type, 'min_value', min_value FROM w
    UNION ALL
    SELECT event_type, 'max_value', max_value FROM w
    UNION ALL
    SELECT event_type, 'n_rows', n_rows FROM w
    ORDER BY event_type, metric
    """,
)
def events_stats_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt: the wide per-type stats block flipped to long
    (event_type, metric, metric_value) form — the transform every
    metrics-warehouse export and every "one row per (entity, kpi)"
    dashboard feed needs, and the inverse of events_daily_pivot's PIVOT.

    Uses the native ``DataFrame.unpivot`` (Spark's STACK under the hood):
    a zero-shuffle narrow expansion of an already-aggregated O(types) wide
    relation, so the only shuffle is the stats groupBy itself.  All four
    metrics are cast to one double column — unpivot requires a common
    value type, same as the SQL UNION oracle."""
    events = load_table(spark, sf_dir, "events")
    wide = events.groupBy("event_type").agg(
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
        F.count(F.lit(1)).cast("double").alias("n_rows"),
    )
    return wide.unpivot(
        ["event_type"],
        ["sum_value", "min_value", "max_value", "n_rows"],
        "metric",
        "metric_value",
    ).orderBy("event_type", "metric")




@register(
    "events_max_drawdown",
    oracle="""
    WITH cums AS (
        SELECT event_type, ts, event_id,
               SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER w AS cum
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    ), series AS (
        SELECT event_type, cum,
               MAX(cum) OVER w AS peak
        FROM cums
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    )
    SELECT event_type,
           CAST(MAX(peak - cum) AS BIGINT) AS max_drawdown_cents,
           CAST(MAX(cum) AS BIGINT) AS peak_cum_cents
    FROM series
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum DRAWDOWN per event type: the deepest peak-to-trough drop of
    the cumulative value series — the classic two-window stateful
    analytic (running sum, then running max of that sum, then a max of
    the gap) that naive per-row loops make O(n²) and window framing makes
    one sorted pass.  Exact integer cents end to end.

    Plan shape: both windows share (partition BY type, order BY ts, id) —
    one Exchange + one Sort serves the running sum AND the running peak;
    the final aggregate is O(types).  Scale: per-type series are
    independent; skewed types split via AQE like any windowed group."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, 0)
    cum = F.sum(F.floor(F.col("value") * 100)).over(wf)
    series = events.select(
        "event_type",
        cum.alias("cum"),
        F.max(cum).over(wf).alias("peak"),
    )
    return (
        series.groupBy("event_type")
        .agg(
            F.max(F.col("peak") - F.col("cum")).alias("max_drawdown_cents"),
            F.max("cum").alias("peak_cum_cents"),
        )
        .orderBy("event_type")
    )


@register(
    "events_clamped_balance",
    # The floor-at-zero running fold via the prefix identity:
    # clamp0(fold) == prefix − LEAST(0, running_min(prefix)) — two plain
    # window passes instead of a sequential recurrence, replayed
    # identically in DuckDB.  Integer cents end to end.
    oracle="""
    WITH signed AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'purchase'
                    THEN -CAST(ROUND(value * 100) AS BIGINT)
                    ELSE  CAST(ROUND(value * 100) AS BIGINT) END AS delta
        FROM events WHERE user_id % 20 = 0
    ),
    pfx AS (
        SELECT user_id, ts, event_id, delta,
               SUM(delta) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS prefix
        FROM signed
    ),
    rmin AS (
        SELECT *, MIN(prefix) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS run_min
        FROM pfx
    )
    SELECT user_id, event_id, delta,
           CAST(prefix - LEAST(0, run_min) AS BIGINT) AS balance_cents
    FROM rmin
    ORDER BY user_id, event_id
    """,
)
def events_clamped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamped running balance — the inventory/wallet fold
    ``balance_t = max(0, balance_{t-1} + delta_t)`` (purchases debit,
    everything else credits; a debit can never drive the balance
    negative) — computed WITHOUT a sequential recurrence.

    The identity that makes it a window query: a running fold clamped at
    zero from below equals ``prefix_t − min(0, min_{k≤t} prefix_k)`` —
    whatever the floor absorbed is exactly the most negative prefix so
    far.  That turns an inherently sequential-looking ledger operator
    into two whole-stage-codegen window passes sharing ONE ``user_id``
    exchange — the difference between a per-key UDF fold and a plan
    Catalyst can actually scale.  Integer cents throughout, so the hash
    check is penny-exact across engines."""
    signed = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 20 == 0)
        .select(
            "user_id",
            "ts",
            "event_id",
            F.when(
                F.col("event_type") == "purchase",
                -F.round(F.col("value") * 100).cast("bigint"),
            )
            .otherwise(F.round(F.col("value") * 100).cast("bigint"))
            .alias("delta"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pfx = signed.withColumn("prefix", F.sum("delta").over(w)).withColumn(
        "run_min", F.min("prefix").over(w)
    )
    return pfx.select(
        "user_id",
        "event_id",
        "delta",
        (F.col("prefix") - F.least(F.lit(0), F.col("run_min")))
        .cast("bigint")
        .alias("balance_cents"),
    ).orderBy("user_id", "event_id")


@register(
    "events_value_outliers_mad",
    # Robust z via median absolute deviation — resistant to the very
    # outliers it hunts (mean/stddev get dragged by them).  Exact
    # interpolated medians in both engines.
    oracle="""
    WITH med AS (
        SELECT event_type, MEDIAN(value) AS med
        FROM events GROUP BY event_type
    ),
    mad AS (
        SELECT e.event_type, MAX(m.med) AS med,
               MEDIAN(ABS(e.value - m.med)) AS mad
        FROM events e JOIN med m USING (event_type)
        GROUP BY e.event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           ROUND((e.value - m.med) / (1.4826 * m.mad), 4) AS robust_z
    FROM events e JOIN mad m USING (event_type)
    WHERE ABS((e.value - m.med) / (1.4826 * m.mad)) > 3.5
    ORDER BY e.event_id
    """,
)
def events_value_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outliers: flag events whose MAD-based z-score
    ``(x − median) / (1.4826·MAD)`` exceeds 3.5 — the
    median-absolute-deviation twin of ``events_value_outliers``.  The
    stddev z-score that operator uses is itself inflated by the
    outliers it hunts (one 100× spike drags σ and masks its peers);
    median and MAD have a 50% breakdown point, so the robust flag
    survives contaminated segments — the screen that matters on real
    telemetry.

    Plan: two grouped exact-median passes over the (bounded) per-type
    groups, broadcast back over the fact — medians are per-GROUP
    scalars, so the fact table never sorts globally."""
    events = load_table(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    mad = (
        events.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("med").alias("med"),
            F.expr("percentile(abs(value - med), 0.5)").alias("mad"),
        )
    )
    z = (F.col("value") - F.col("med")) / (1.4826 * F.col("mad"))
    return (
        events.join(F.broadcast(mad), "event_type")
        .filter(F.abs(z) > 3.5)
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(z, 4).alias("robust_z"),
        )
        .orderBy("event_id")
    )


@register(
    "events_twap_daily",
    # time-weighted average: each observation holds until the next one
    # (same day), weighted by its holding seconds; the last observation
    # of a day carries zero weight (no next sample to define its span),
    # falling back to the plain mean when a day has a single sample
    oracle="""
    WITH obs AS (
        SELECT user_id,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               ts, value,
               CAST(date_diff('second', ts,
                    LEAD(ts) OVER (PARTITION BY user_id,
                                       date_trunc('day', ts)
                                   ORDER BY ts, event_id))
                    AS BIGINT) AS hold_s
        FROM events WHERE user_id % 25 = 0
    )
    SELECT user_id, day,
           CAST(COUNT(*) AS BIGINT) AS n_obs,
           ROUND(CASE WHEN SUM(hold_s) > 0
                      THEN SUM(value * hold_s) / SUM(hold_s)
                      ELSE AVG(value) END, 4) AS twap,
           ROUND(AVG(value), 4) AS plain_avg
    FROM obs
    GROUP BY user_id, day
    ORDER BY user_id, day
    """,
)
def events_twap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per (user, day) — the gauge-correct
    mean for irregularly sampled series: each observation is weighted by
    how long it HELD (seconds until the next sample that day), so a
    sensor that reports 1 Hz while idle and 0.01 Hz under load doesn't
    drown the load readings in idle samples.  ``plain_avg`` rides along
    to expose exactly that bias.

    Plan: one LEAD window and the groupBy share the (user, day)
    partitioning — a single keyed exchange; day boundaries cap every
    window partition, so no key grows unboundedly with history."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % 25 == 0
    )
    day = F.date_trunc("day", "ts").cast("date")
    w = Window.partitionBy("user_id", day).orderBy("ts", "event_id")
    obs = events.select(
        "user_id",
        day.alias("day"),
        "value",
        (
            F.unix_timestamp(F.lead("ts").over(w)) - F.unix_timestamp("ts")
        ).alias("hold_s"),
    )
    return (
        obs.groupBy("user_id", "day")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum(F.col("value") * F.col("hold_s")).alias("wsum"),
            F.sum("hold_s").alias("w"),
            F.avg("value").alias("plain_avg"),
        )
        .select(
            "user_id",
            "day",
            "n_obs",
            F.round(
                F.when(F.col("w") > 0, F.col("wsum") / F.col("w")).otherwise(
                    F.col("plain_avg")
                ),
                4,
            ).alias("twap"),
            F.round("plain_avg", 4).alias("plain_avg"),
        )
        .orderBy("user_id", "day")
    )


@register(
    "part_xyz_classification",
    # demand variability classes from the exact integer moment sums:
    # CV² = n·Σq² / (Σq)² − ... computed as std/mean with both terms
    # derived from n, Σq, Σq² — single IEEE ops on exact integers
    oracle="""
    WITH monthly AS (
        SELECT l.l_partkey,
               date_trunc('month', o.o_orderdate) AS m,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY 1, 2
    ),
    moments AS (
        SELECT l_partkey,
               CAST(COUNT(*) AS BIGINT) AS n_months,
               CAST(SUM(qty) AS BIGINT) AS sq,
               CAST(SUM(qty * qty) AS BIGINT) AS sqq
        FROM monthly GROUP BY l_partkey
    ),
    cv AS (
        SELECT l_partkey, n_months, sq,
               CASE WHEN n_months > 1 AND sq > 0 THEN
                   SQRT((1.0 * n_months * sqq - 1.0 * sq * sq)
                        / (n_months * (n_months - 1.0)))
                   / (1.0 * sq / n_months)
               ELSE NULL END AS cv
        FROM moments
    )
    SELECT l_partkey AS partkey, n_months, sq AS total_qty,
           ROUND(cv, 6) AS demand_cv,
           CASE WHEN cv IS NULL THEN 'N'
                WHEN cv < 0.5 THEN 'X'
                WHEN cv < 1.0 THEN 'Y'
                ELSE 'Z' END AS xyz_class
    FROM cv
    ORDER BY partkey
    """,
)
def part_xyz_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XYZ demand-variability classification (ABC's companion axis):
    per-part coefficient of variation of monthly demand — X steady,
    Y seasonal-ish, Z erratic; parts with one observed month get 'N'.
    Quantities are integers, so n, Σq, Σq² are exact and the sample
    std / mean is two IEEE ops; the class thresholds compare the
    UNROUNDED cv in both engines.  Month-grain pre-aggregation bounds
    the moment pass by parts × calendar."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        li.join(
            orders.select("o_orderkey", "o_orderdate"),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy(
            "l_partkey", F.date_trunc("month", "o_orderdate").alias("m")
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
    )
    moments = monthly.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_months"),
        F.sum("qty").cast("long").alias("sq"),
        F.sum(F.col("qty") * F.col("qty")).cast("long").alias("sqq"),
    )
    n, sq, sqq = F.col("n_months"), F.col("sq"), F.col("sqq")
    cv = F.when(
        (n > 1) & (sq > 0),
        F.sqrt(
            (F.lit(1.0) * n * sqq - F.lit(1.0) * sq * sq)
            / (n * (n - F.lit(1.0)))
        )
        / (F.lit(1.0) * sq / n),
    )
    return (
        moments.withColumn("cv", cv)
        .select(
            F.col("l_partkey").alias("partkey"),
            "n_months",
            sq.alias("total_qty"),
            F.round("cv", 6).alias("demand_cv"),
            F.when(F.col("cv").isNull(), "N")
            .when(F.col("cv") < 0.5, "X")
            .when(F.col("cv") < 1.0, "Y")
            .otherwise("Z")
            .alias("xyz_class"),
        )
        .orderBy("partkey")
    )


@register(
    "orders_fulfillment_lag",
    # exact integer day lags; percentiles as the first value whose
    # cumulative count reaches the target rank (the weighted-median scan)
    oracle="""
    WITH lags AS (
        SELECT o.o_orderpriority AS priority,
               CAST(datediff('day', CAST(o.o_orderdate AS DATE),
                             CAST(l.l_shipdate AS DATE)) AS BIGINT)
                   AS lag_days
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    by_value AS (
        SELECT priority, lag_days, CAST(COUNT(*) AS BIGINT) AS c
        FROM lags GROUP BY 1, 2
    ),
    scanned AS (
        SELECT priority, lag_days, c,
               SUM(c) OVER (PARTITION BY priority ORDER BY lag_days
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
               SUM(c) OVER (PARTITION BY priority) AS n
        FROM by_value
    )
    SELECT priority,
           CAST(MIN(n) AS BIGINT) AS n_lines,
           MIN(CASE WHEN 2 * cum >= n THEN lag_days END) AS p50_days,
           MIN(CASE WHEN 10 * cum >= 9 * n THEN lag_days END) AS p90_days,
           MAX(lag_days) AS max_days
    FROM scanned
    GROUP BY priority
    ORDER BY priority
    """,
)
def orders_fulfillment_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship lag distribution per priority: exact integer-day
    lags, p50/p90 as the first value whose cumulative count reaches the
    rank target (the weighted-median scan over DISTINCT lag values —
    bounded domain, so the window input is tiny however large the fact),
    plus the max.  The SLA readout an ops dashboard wants, with exact
    percentiles instead of approx_percentile drift."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    lags = li.join(
        orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        li.l_orderkey == orders.o_orderkey,
    ).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.col("o_orderdate").cast("date"),
        )
        .cast("long")
        .alias("lag_days"),
    )
    by_value = lags.groupBy("priority", "lag_days").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w_cum = (
        Window.partitionBy("priority")
        .orderBy("lag_days")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("priority")
    scanned = by_value.select(
        "priority",
        "lag_days",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    return (
        scanned.groupBy("priority")
        .agg(
            F.min("n").cast("long").alias("n_lines"),
            F.min(
                F.when(
                    2 * F.col("cum") >= F.col("n"), F.col("lag_days")
                )
            ).alias("p50_days"),
            F.min(
                F.when(
                    10 * F.col("cum") >= 9 * F.col("n"), F.col("lag_days")
                )
            ).alias("p90_days"),
            F.max("lag_days").alias("max_days"),
        )
        .orderBy("priority")
    )


@register(
    "part_abc_xyz_matrix",
    # ABC by cumulative revenue share (integer boundary predicates) ×
    # XYZ by demand CV — the 9-cell inventory-planning matrix
    oracle="""
    WITH rev AS (
        SELECT l_partkey,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
                                   * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem GROUP BY l_partkey
    ),
    abc AS (
        SELECT l_partkey,
               CASE WHEN 5 * cum <= 4 * total THEN 'A'
                    WHEN 20 * cum <= 19 * total THEN 'B'
                    ELSE 'C' END AS abc_class,
               cents
        FROM (
            SELECT l_partkey, cents,
                   SUM(cents) OVER (ORDER BY cents DESC, l_partkey
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS cum,
                   SUM(cents) OVER () AS total
            FROM rev
        )
    ),
    monthly AS (
        SELECT l.l_partkey, date_trunc('month', o.o_orderdate) AS m,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY 1, 2
    ),
    xyz AS (
        SELECT l_partkey,
               CASE WHEN n <= 1 OR sq = 0 THEN 'N'
                    WHEN SQRT((1.0 * n * sqq - 1.0 * sq * sq)
                              / (n * (n - 1.0))) / (1.0 * sq / n) < 0.5
                        THEN 'X'
                    WHEN SQRT((1.0 * n * sqq - 1.0 * sq * sq)
                              / (n * (n - 1.0))) / (1.0 * sq / n) < 1.0
                        THEN 'Y'
                    ELSE 'Z' END AS xyz_class
        FROM (
            SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(qty) AS BIGINT) AS sq,
                   CAST(SUM(qty * qty) AS BIGINT) AS sqq
            FROM monthly GROUP BY l_partkey
        )
    )
    SELECT a.abc_class, x.xyz_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(a.cents) AS BIGINT) AS revenue_cents
    FROM abc a JOIN xyz x ON x.l_partkey = a.l_partkey
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def part_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ABC×XYZ inventory-planning matrix: revenue importance crossed
    with demand variability — cell (A, X) is automate-the-reorder, (C, Z)
    is stock-to-order.  ABC classes use integer boundary predicates over
    the cumulative revenue share (the supplier_abc discipline: 5·cum ≤
    4·total etc., no float thresholds); XYZ reuses the exact moment-sum
    CV.  Both sides aggregate to the part grain before the one join —
    dimension-sized everywhere after the rollups."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            ).cast("long")
        )
        .cast("long")
        .alias("cents")
    )
    # O(parts) group table asserted in-plan (VERDICT r10 task 3).
    from ..operators.guards import bounded_window_guard

    rev = bounded_window_guard(rev, "part_abc_xyz_matrix")
    w_cum = Window.orderBy(
        F.col("cents").desc(), F.col("l_partkey")
    ).rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    abc = rev.select(
        "l_partkey",
        "cents",
        F.sum("cents").over(w_cum).alias("cum"),
        F.sum("cents").over(w_all).alias("total"),
    ).select(
        "l_partkey",
        "cents",
        F.when(5 * F.col("cum") <= 4 * F.col("total"), "A")
        .when(20 * F.col("cum") <= 19 * F.col("total"), "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    monthly = (
        li.join(
            orders.select("o_orderkey", "o_orderdate"),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy(
            "l_partkey", F.date_trunc("month", "o_orderdate").alias("m")
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
    )
    mom = monthly.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("qty").cast("long").alias("sq"),
        F.sum(F.col("qty") * F.col("qty")).cast("long").alias("sqq"),
    )
    n, sq, sqq = F.col("n"), F.col("sq"), F.col("sqq")
    cv = F.sqrt(
        (F.lit(1.0) * n * sqq - F.lit(1.0) * sq * sq)
        / (n * (n - F.lit(1.0)))
    ) / (F.lit(1.0) * sq / n)
    xyz = mom.select(
        "l_partkey",
        F.when((n <= 1) | (sq == 0), "N")
        .when(cv < 0.5, "X")
        .when(cv < 1.0, "Y")
        .otherwise("Z")
        .alias("xyz_class"),
    )
    return (
        abc.join(xyz, "l_partkey")
        .groupBy("abc_class", "xyz_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .orderBy("abc_class", "xyz_class")
    )


@register(
    "events_rate_limit_audit",
    # time-interval sliding window (RANGE, not ROWS): every event's
    # trailing-24 h activity count per user + the quota-breach flag —
    # the batch audit behind any rate limiter / abuse detector
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(COUNT(*) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_last_24h,
           COUNT(*) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW
           ) >= 5 AS breach
    FROM events
    ORDER BY event_id
    """,
)
def events_rate_limit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-limit audit: each event annotated with its user's trailing
    24-hour event count (a TIME-RANGE window — the value-based frame
    ROWS frames can't express: the frame is "everything within 24 h",
    not "the last N rows") and the ≥5-in-24 h quota-breach flag.

    Spark's ``rangeBetween`` needs a numeric ordering, so the frame runs
    over ``unix_micros(ts)`` with a ±µs-exact 24 h bound — identical
    inclusive semantics to the oracle's INTERVAL frame, including ties.
    One keyed shuffle; the frame is evaluated with a sliding two-pointer
    over each partition, O(rows) not O(rows·frame)."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-24 * 3600 * 1_000_000, 0)
    )
    n24 = F.count(F.lit(1)).over(w)
    return events.select(
        "event_id",
        "user_id",
        "ts",
        n24.cast("long").alias("n_last_24h"),
        (n24 >= 5).alias("breach"),
    ).orderBy("event_id")


@register(
    "customer_pareto_8020",
    # Minimal covering set: how many top customers cover >= 80% of
    # revenue — exact integer cents, the 5*cum >= 4*total comparison
    # avoids any float threshold.
    oracle="""
    WITH rev AS (
        SELECT o_custkey,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT o_custkey, cents,
               SUM(cents) OVER (ORDER BY cents DESC, o_custkey
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum,
               SUM(cents) OVER () AS total
        FROM rev
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(COUNT(*) FILTER (WHERE 5 * (cum - cents) < 4 * total)
                AS BIGINT) AS n_top,
           CAST(MAX(CASE WHEN 5 * (cum - cents) < 4 * total
                         THEN cum END) AS BIGINT) AS top_cents,
           CAST(MAX(total) AS BIGINT) AS total_cents,
           CAST(1000000::HUGEINT * MAX(CASE WHEN 5 * (cum - cents) < 4 * total
                                        THEN cum END) // MAX(total) AS BIGINT)
               AS top_share_ppm,
           CAST(1000000 * COUNT(*) FILTER (WHERE 5 * (cum - cents)
                                           < 4 * total)
                // COUNT(*) AS BIGINT) AS top_frac_ppm
    FROM ranked
    """,
)
def customer_pareto_8020(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto 80/20 concentration: the SMALLEST set of top customers
    whose cumulative revenue reaches 80% of the total, reported as one
    row (set size, its revenue share, its customer share) — the revenue-
    concentration question behind every account-tiering exercise; the
    ABC queries classify every row, this answers the covering-set size.

    A customer is in the covering set iff the cumulative revenue BEFORE
    them is still short of 80% (``5·(cum−own) < 4·total`` in exact
    cents).  Plan: one fact groupBy to O(customers), then the documented
    O(groups) global cumulative window, guard-asserted."""
    from ..operators.guards import bounded_window_guard

    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias(
            "cents"
        )
    )
    rev = bounded_window_guard(rev, "customer_pareto_8020")
    w_cum = Window.orderBy(F.col("cents").desc(), "o_custkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = rev.select(
        "cents",
        F.sum("cents").over(w_cum).alias("cum"),
        F.sum("cents").over(Window.partitionBy()).alias("total"),
    )
    in_top = 5 * (F.col("cum") - F.col("cents")) < 4 * F.col("total")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.count(F.when(in_top, 1)).alias("n_top"),
        F.max(F.when(in_top, F.col("cum"))).alias("top_cents"),
        F.max("total").alias("total_cents"),
        # DECIMAL(38,0) intermediate: 1e6 × corpus-total cents overflows
        # int64 past ~9.2e12 cents of revenue (caught by the 10× fact
        # sweep); the final quotient is always < 1e6 so the BIGINT cast
        # is lossless.  The oracle mirrors with an explicit ::HUGEINT
        # (DuckDB also errors on BIGINT overflow), so both sides stay
        # floor-division at any scale.
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38, 0)) * "
            "max(case when 5 * (cum - cents) < 4 * total then cum end)) "
            "div max(total) AS BIGINT)"
        ).alias("top_share_ppm"),
        F.expr(
            "1000000 * count(case when 5 * (cum - cents) < 4 * total "
            "then 1 end) div count(1)"
        ).alias("top_frac_ppm"),
    )


@register(
    "events_duplicate_submission_audit",
    # Forensic duplicate-charge/retry screen: same user, same exact
    # amount, within 7 days — emitted as ADJACENT pairs per
    # (user, amount) chain, the dedup-review worklist shape.
    oracle="""
    WITH w AS (
        SELECT user_id, value, event_id, event_type, ts,
               LAG(event_id) OVER (PARTITION BY user_id, value
                                   ORDER BY ts, event_id) AS prev_id,
               LAG(event_type) OVER (PARTITION BY user_id, value
                                     ORDER BY ts, event_id) AS prev_type,
               LAG(ts) OVER (PARTITION BY user_id, value
                             ORDER BY ts, event_id) AS prev_ts
        FROM events
    )
    SELECT user_id,
           prev_id AS event_a, event_id AS event_b,
           prev_type AS type_a, event_type AS type_b,
           prev_ts AS ts_a, ts AS ts_b,
           ROUND(value, 2) AS amount,
           CAST(date_diff('day', CAST(prev_ts AS DATE), CAST(ts AS DATE))
                AS BIGINT) AS gap_days
    FROM w
    WHERE prev_id IS NOT NULL
      AND date_diff('day', CAST(prev_ts AS DATE), CAST(ts AS DATE)) <= 7
    ORDER BY user_id, event_b
    """,
)
def events_duplicate_submission_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-submission audit: candidate double charges / client
    retries = two events by the same user with the IDENTICAL amount
    within 7 days.  One lag window per (user, amount) group —
    consecutive-pair adjacency is sufficient for a review worklist (a
    chain of k near-identical submissions surfaces as k−1 pairs, never
    the quadratic all-pairs set).

    Scale: single hash shuffle on (user_id, value); group sizes are
    event counts per exact amount — tiny everywhere; no join."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "value").orderBy("ts", "event_id")
    lagged = events.select(
        "user_id",
        "value",
        "event_id",
        "event_type",
        "ts",
        F.lag("event_id").over(w).alias("prev_id"),
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag("ts").over(w).alias("prev_ts"),
    )
    gap = F.datediff(F.col("ts").cast("date"), F.col("prev_ts").cast("date"))
    return (
        lagged.filter(F.col("prev_id").isNotNull() & (gap <= 7))
        .select(
            "user_id",
            F.col("prev_id").alias("event_a"),
            F.col("event_id").alias("event_b"),
            F.col("prev_type").alias("type_a"),
            F.col("event_type").alias("type_b"),
            F.col("prev_ts").alias("ts_a"),
            F.col("ts").alias("ts_b"),
            F.round("value", 2).alias("amount"),
            gap.cast("bigint").alias("gap_days"),
        )
        .orderBy("user_id", "event_b")
    )


# ---------------------------------------------------------------------------
# Histogram-based join-cardinality estimation audit (optimizer profiling)
# ---------------------------------------------------------------------------

#: Hash buckets for the key histograms.  64 buckets is the classic
#: coarse-histogram regime where the estimator's upper-bound bias is
#: visible; production CBO histograms tune this per column.
JOINCARD_BUCKETS = 64


def join_cardinality_estimate(
    left: DataFrame, lkey: str, right: DataFrame, rkey: str, join_name: str
) -> DataFrame:
    """Estimate ``|L ⋈ R|`` from B-bucket hashed key histograms and audit
    it against the true count — the cost-based-optimizer statistic that
    decides join order and broadcast choices before a single row moves.

    ``est = Σ_b c_L(b)·c_R(b)`` is exact when every bucket holds one key
    and an upper bound otherwise (hash collisions merge keys, inflating
    the product) — so ``err_ppm = est·1e6 div actual ≥ 1e6``, and how
    far above 1e6 it sits measures what B buckets cost in planning
    accuracy on this key distribution.

    Scale shape: the two histograms are O(rows) scans aggregating to B
    rows each (map-side combinable), their product-join is B×B-bounded;
    only the audit's ground-truth count touches a real join.  At 100 TB
    the estimator side runs at statistics-collection cost — this is
    precisely why engines keep histograms instead of counting joins.
    """
    from ..operators.dedup import portable_hash60

    def hist(df: DataFrame, key: str) -> DataFrame:
        return (
            df.select(
                (
                    portable_hash60(F.col(key).cast("string"))
                    % JOINCARD_BUCKETS
                ).alias("b")
            )
            .groupBy("b")
            .agg(F.count(F.lit(1)).alias("c"))
        )
    lh = hist(left, lkey).withColumnRenamed("c", "cl")
    rh = hist(right, rkey).withColumnRenamed("c", "cr")
    est = (
        lh.join(rh, "b")
        .agg(
            F.coalesce(
                F.sum(F.expr("CAST(cl AS DECIMAL(38,0)) * cr")), F.lit(0)
            )
            .cast("long")
            .alias("est")
        )
    )
    actual = (
        left.select(F.col(lkey).alias("k"))
        .join(right.select(F.col(rkey).alias("k")), "k")
        .agg(F.count(F.lit(1)).alias("actual"))
    )
    sizes = left.agg(F.count(F.lit(1)).alias("n_left")).crossJoin(
        right.agg(F.count(F.lit(1)).alias("n_right"))
    )
    return (
        sizes.crossJoin(F.broadcast(est))
        .crossJoin(F.broadcast(actual))
        .select(
            F.lit(join_name).alias("join_name"),
            "n_left",
            "n_right",
            "est",
            "actual",
            F.expr("est * 1000000 div actual").alias("err_ppm"),
        )
    )


def _joincard_oracle() -> str:
    from ..operators.dedup import PORTABLE_HASH60_SQL

    def hist(table: str, key: str) -> str:
        h = PORTABLE_HASH60_SQL.format(s=f"CAST({key} AS VARCHAR)")
        return (
            f"SELECT ({h}) % {JOINCARD_BUCKETS} AS b, "
            f"CAST(COUNT(*) AS BIGINT) AS c FROM {table} GROUP BY 1"
        )

    def one(join_name: str, lt: str, lk: str, rt: str, rk: str) -> str:
        return f"""
    SELECT '{join_name}' AS join_name,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM {lt}) AS n_left,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM {rt}) AS n_right,
           CAST((SELECT COALESCE(SUM(CAST(lh.c AS HUGEINT) * rh.c), 0)
                 FROM ({hist(lt, lk)}) lh JOIN ({hist(rt, rk)}) rh
                      USING (b)) AS BIGINT) AS est,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM {lt} l JOIN {rt} r ON l.{lk} = r.{rk}) AS actual,
           CAST((SELECT COALESCE(SUM(CAST(lh.c AS HUGEINT) * rh.c), 0)
                 FROM ({hist(lt, lk)}) lh JOIN ({hist(rt, rk)}) rh
                      USING (b)) * 1000000
                // (SELECT COUNT(*) FROM {lt} l JOIN {rt} r
                    ON l.{lk} = r.{rk}) AS BIGINT) AS err_ppm
    """

    return (
        one("orders_customer", "orders", "o_custkey", "customer", "c_custkey")
        + "\n    UNION ALL\n"
        + one("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey")
        + "\n    ORDER BY join_name"
    )


@register("profile_join_cardinality", oracle=_joincard_oracle())
def profile_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-histogram join-cardinality estimates audited against true
    join counts for the two TPC-H FK joins."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    a = join_cardinality_estimate(
        orders, "o_custkey", customer, "c_custkey", "orders_customer"
    )
    b = join_cardinality_estimate(
        lineitem, "l_orderkey", orders, "o_orderkey", "lineitem_orders"
    )
    return a.unionByName(b).orderBy("join_name")
