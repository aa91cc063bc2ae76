"""Relational flagship queries over the TPC-H-ish fixture tables.

The reference implements no relational operators (SURVEY.md §2) — these
queries prove the engine's scan → filter → join → aggregate → sort path on
the driver fixtures, expressed declaratively so Catalyst supplies pushdown,
pruning, broadcast-join selection and AQE.

Scale notes (100 TB posture):
* ``customer``/``orders`` dimension joins are explicitly ``broadcast()``
  when the side is bounded (customer at any sf is ~1.5% of lineitem rows);
  the big fact-fact join (lineitem ⋈ orders) is left to Catalyst/AQE which
  picks SMJ/shuffled-hash and handles skew splitting.
* Filters are applied before joins so they reach the parquet scan
  (PushedFilters), and aggregates sit on the join output so partial
  (map-side) aggregation runs before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.fixtures import load_table

# Revenue = extendedprice * (1 - discount), rounded late so Spark and the
# DuckDB oracle agree bit-for-bit despite double accumulation order.
_ROUND = 2


@register(
    "flagship_revenue_topk",
    oracle="""
    SELECT o.o_orderkey AS o_orderkey,
           CAST(o.o_orderdate AS DATE) AS order_date,
           o.o_orderpriority AS o_orderpriority,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1996-01-01'
    GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def flagship_revenue_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: top-10 open orders by revenue for one segment.

    lineitem ⋈ orders (fact-fact, Catalyst/AQE-planned) ⋈ broadcast(customer
    filtered to one segment).  Filters precede joins → pushed to parquet.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-01-01")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01")
    )
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_orderpriority",
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), _ROUND
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag AS l_returnflag,
           l_linestatus AS l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-06-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: wide aggregate over one scan.

    Single scan, map-side partial aggregation, tiny shuffle (≤6 groups) —
    the plan survives any scale-up because the reduce side is O(groups).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-06-01")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "regional_market_share",
    oracle="""
    SELECT r.r_name AS region_name,
           n.n_name AS nation_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(DISTINCT o.o_orderkey) AS n_orders
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    ORDER BY region_name, nation_name
    """,
)
def regional_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped star join: fact ⋈ 4 dimensions, revenue per nation.

    All dimension sides are broadcast (region/nation are tiny at every sf,
    customer is bounded) — the only shuffle is the final aggregation.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), _ROUND
            ).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
        .orderBy("region_name", "nation_name")
    )


@register(
    "orders_without_lineitems",
    oracle="""
    SELECT o_orderkey, o_orderpriority
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
      AND o.o_orderdate >= TIMESTAMP '1998-06-01'
    ORDER BY o_orderkey
    """,
)
def orders_without_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (NOT EXISTS): recent orders with no shipped lineitems.

    ``left_anti`` keeps only the probe columns, so the join never widens
    rows; at scale this is a broadcast-anti when the filtered orders side
    is small, else a shuffled anti on the key."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-06-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_anti")
        .select("o_orderkey", "o_orderpriority")
        .orderBy("o_orderkey")
    )


@register(
    "suppliers_with_returns",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_suppkey = s.s_suppkey AND l.l_returnflag = 'R')
    ORDER BY s.s_suppkey
    """,
)
def suppliers_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (EXISTS): suppliers with at least one returned lineitem.
    ``left_semi`` short-circuits per probe row — no row widening, no dedup
    needed afterwards."""
    supplier = load_table(spark, sf_dir, "supplier")
    returned = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        supplier.join(returned, supplier.s_suppkey == returned.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@register(
    "segment_customers_setops",
    oracle="""
    WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
    big_spenders AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    SELECT c_custkey, 'both' AS membership FROM (
        SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM big_spenders)
    UNION ALL
    SELECT c_custkey, 'building_only' AS membership FROM (
        SELECT c_custkey FROM building EXCEPT SELECT c_custkey FROM big_spenders)
    ORDER BY membership, c_custkey
    """,
)
def segment_customers_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (INTERSECT / EXCEPT / UNION ALL) over two customer
    predicates.  Spark plans INTERSECT/EXCEPT as semi/anti joins on all
    columns — here a single key column, so both reduce to key joins."""
    cust = load_table(spark, sf_dir, "customer")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    spenders = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    both = building.intersect(spenders).withColumn("membership", F.lit("both"))
    only = building.exceptAll(spenders).withColumn(
        "membership", F.lit("building_only")
    )
    return both.unionByName(only).orderBy("membership", "c_custkey")


@register(
    "revenue_rollup_grouping_sets",
    oracle="""
    SELECT COALESCE(r.r_name, 'ALL') AS region_name,
           COALESCE(n.n_name, 'ALL') AS nation_name,
           ROUND(SUM(c.c_acctbal), 2) AS total_balance,
           COUNT(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    ORDER BY region_name, nation_name
    """,
)
def revenue_rollup_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets: per-nation, per-region and grand-total account
    balances in one pass.  Spark expands rollup into grouping sets inside a
    single aggregation — one shuffle, not one per grouping level."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region_name"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation_name"),
            "total_balance",
            "n_customers",
        )
        .orderBy("region_name", "nation_name")
    )


@register(
    "events_value_stats",
    oracle="""
    SELECT event_type,
           ROUND(AVG(value), 4) AS avg_value,
           ROUND(STDDEV_SAMP(value), 4) AS sd_value,
           ROUND(MEDIAN(value), 4) AS p50,
           ROUND(QUANTILE_CONT(value, 0.95), 4) AS p95,
           ROUND(CORR(value, CAST(user_id AS DOUBLE)), 4) AS corr_user
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per event type: exact continuous percentiles
    (Spark `percentile` == DuckDB `quantile_cont`), sample stddev,
    Pearson correlation.  At 100 TB exact percentiles become
    `approx_percentile` (t-digest, mergeable map-side); the exact form here
    is what the oracle can check bit-for-bit."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.round(F.stddev_samp("value"), 4).alias("sd_value"),
            F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("value", F.lit(0.95)), 4).alias("p95"),
            F.round(F.corr("value", F.col("user_id").cast("double")), 4).alias("corr_user"),
        )
        .orderBy("event_type")
    )


@register(
    "events_daily_pivot",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
    FROM events
    GROUP BY 1
    ORDER BY day
    """,
)
def events_daily_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: daily counts per event type as columns.  Expressed with an
    explicit value list (`pivot(col, values)`) so Spark skips the extra
    distinct-values scan a blind pivot needs — the form that works on a
    stream too."""
    events = load_table(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    pivoted = (
        events.groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types]
    ).orderBy("day")


@register(
    "events_running_totals",
    oracle="""
    SELECT event_id, user_id, ts,
           ROUND(SUM(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING), 4) AS running_value,
           ROUND(AVG(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS seq
    FROM events WHERE user_id < 200
    ORDER BY user_id, seq
    """,
)
def events_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frames: per-user running sum (unbounded preceding) and 3-row
    moving average.  One shuffle on user_id serves all three windows
    (identical partitioning/ordering → single exchange + sort)."""
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running = by_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    moving = by_user.rowsBetween(-2, Window.currentRow)
    return (
        events.select(
            "event_id",
            "user_id",
            "ts",
            F.round(F.sum("value").over(running), 4).alias("running_value"),
            F.round(F.avg("value").over(moving), 4).alias("moving_avg3"),
            F.row_number().over(by_user).cast("long").alias("seq"),
        )
        .orderBy("user_id", "seq")
    )


def approx_quantile_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw `approx_percentile` estimates per event_type (Greenwald-
    Khanna-style sketch, mergeable map-side, constant memory) — the 100 TB
    form of the percentile query.  Estimate VALUES are engine-specific;
    the registered strict query wraps them in a rank-bracket certificate."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.approx_percentile("value", F.lit(0.5), F.lit(1000)).alias("p50_approx"),
            F.approx_percentile("value", F.lit(0.95), F.lit(1000)).alias("p95_approx"),
        )
        .orderBy("event_type")
    )


def approx_quantile_certificate(events: DataFrame, est: DataFrame) -> DataFrame:
    """Rank-bracket certificate for a per-group (p50, p95) estimate
    table: one exact pass computes each estimate's true rank bracket per
    event_type and emits exact group sizes plus within-bound booleans
    (accuracy 1000 → rank error ≤ N/1000, +1 tie slack).  Shared by the
    registered query and its negative-control pytest, so a formula drift
    can't silently un-load-bear the boolean."""
    j = events.join(F.broadcast(est), "event_type")
    ranks = j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("value") < F.col("p50_approx")).cast("long")).alias("lt50"),
        F.sum((F.col("value") <= F.col("p50_approx")).cast("long")).alias("le50"),
        F.sum((F.col("value") < F.col("p95_approx")).cast("long")).alias("lt95"),
        F.sum((F.col("value") <= F.col("p95_approx")).cast("long")).alias("le95"),
    )

    def within(q: float, lt: str, le: str):
        t = F.ceil(F.lit(q) * F.col("n_rows"))
        err = F.col("n_rows") / F.lit(1000.0) + F.lit(1.0)
        return (F.col(lt) + 1 <= t + err) & (F.col(le) >= t - err)

    return ranks.select(
        "event_type",
        "n_rows",
        within(0.5, "lt50", "le50").alias("p50_within"),
        within(0.95, "lt95", "le95").alias("p95_within"),
    ).orderBy("event_type")


@register(
    "events_value_approx_quantiles",
    # The estimates are sketch-valued, so the STRICT row is the
    # certificate: exact per-group N plus rank-bracket booleans the
    # oracle expects to be TRUE (accuracy 1000 -> rank error <= N/1000,
    # checked with the suite's +1 tie slack).
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS p50_within,
           TRUE AS p95_within
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def events_value_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict tier of :func:`approx_quantile_estimates` (the VERDICT r08
    task-3 certificate pattern): a mis-merged or corrupted sketch emits
    FALSE and hash-mismatches.  The raw estimates keep their accuracy
    pytest against exact percentiles."""
    events = load_table(spark, sf_dir, "events")
    return approx_quantile_certificate(
        events, approx_quantile_estimates(spark, sf_dir)
    )


@register(
    "orders_lineitem_nested_agg",
    oracle="""
    WITH li AS (
        SELECT l_orderkey,
               CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100)
                    AS BIGINT) AS cents
        FROM lineitem
    ), packed AS (
        SELECT l_orderkey,
               list_sort(list(cents), 'DESC') AS c
        FROM li GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           CAST(len(c) AS INT) AS n_items,
           CAST(list_aggregate(c[1:2], 'sum') AS BIGINT) AS top2_cents,
           CAST(len(list_filter(c, x -> x > 5000000)) AS INT) AS n_big,
           CAST(list_aggregate(c, 'sum') AS BIGINT) AS total_cents
    FROM packed
    ORDER BY l_orderkey
    """,
)
def orders_lineitem_nested_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-data analytics via HIGHER-ORDER array functions: pack each
    order's line revenues into a sorted array, then answer intra-order
    questions (top-2 concentration, count of big-ticket lines, total)
    with ``slice``/``filter``/``aggregate`` lambda expressions — all
    JVM-side Catalyst expressions, zero Python, zero explode-regroup
    round trips.

    This is the array-column discipline a training-data pipeline relies
    on (token arrays, embedding arrays, chunk lists): one groupBy builds
    the nested column; every per-array computation after that is narrow
    and shuffle-free.  Revenue is floored to integer cents before any
    aggregation so both engines sum exact BIGINTs in any order.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        ).alias("cents"),
    )
    packed = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("cents"), asc=False).alias("c")
    )
    zero = F.lit(0).cast("long")
    return packed.select(
        "l_orderkey",
        F.size("c").alias("n_items"),
        F.aggregate(
            F.slice("c", 1, 2), zero, lambda acc, x: acc + x
        ).alias("top2_cents"),
        F.size(F.filter("c", lambda x: x > 5_000_000)).alias("n_big"),
        F.aggregate("c", zero, lambda acc, x: acc + x).alias("total_cents"),
    ).orderBy("l_orderkey")


@register(
    "customers_dormant_above_avg",
    oracle="""
    WITH cents AS (
        SELECT c_custkey, c_mktsegment,
               CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS bal_cents
        FROM customer WHERE c_acctbal > 0.0
    ), g AS (
        SELECT CAST(SUM(bal_cents) AS BIGINT) AS sum_cents,
               CAST(COUNT(*) AS BIGINT) AS n_pos
        FROM cents
    )
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(c.bal_cents) AS BIGINT) AS total_cents
    FROM cents c, g
    WHERE c.bal_cents * g.n_pos > g.sum_cents
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-06-01'
      )
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def customers_dormant_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: dormant high-value customers — above-average
    balance, no orders in the trailing window (every fixture customer has
    SOME order, so dormancy is defined against recent activity) — counted
    per segment.  Exercises the global scalar subquery (corpus-wide
    average) + anti join (NOT EXISTS over a filtered subquery)
    + re-aggregation pipeline in one plan.

    Exactness: the average is never materialized as a double — the filter
    is cross-multiplied to ``bal_cents · n_pos > sum_cents`` over floored
    integer cents, so the boundary customer is identical in every engine
    regardless of double accumulation order.

    Plan shape: the 1-row global aggregate broadcast-joins onto customer
    (the documented O(1) constant-join pattern); the anti join against
    orders hashes on o_custkey (broadcast at dimension scale, shuffled
    hash at fact scale via AQE); final groupBy is O(segments)."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_acctbal") > 0.0
    )
    cents = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") * 100).alias("bal_cents"),
    )
    g = cents.agg(
        F.sum("bal_cents").alias("sum_cents"),
        F.count(F.lit(1)).alias("n_pos"),
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-06-01"))
        .select("o_custkey")
    )
    return (
        cents.join(F.broadcast(g))
        .filter(F.col("bal_cents") * F.col("n_pos") > F.col("sum_cents"))
        .join(
            orders,
            cents["c_custkey"] == orders["o_custkey"],
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("bal_cents").alias("total_cents"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "lineitem_allocate_rebate",
    # Largest-remainder (Hamilton) allocation in EXACT integer cents:
    # identical integer DIV/MOD algebra in both engines, so the hash
    # check certifies penny-exactness, not float luck.
    oracle="""
    WITH li AS (
        SELECT l_orderkey, l_linenumber,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS pc
        FROM lineitem WHERE l_orderkey % 50 = 0
    ),
    tot AS (
        SELECT *, SUM(pc) OVER (PARTITION BY l_orderkey) AS total_pc,
               COUNT(*) OVER (PARTITION BY l_orderkey) AS n_lines
        FROM li
    ),
    shares AS (
        SELECT *,
               (10000 * pc) // total_pc AS floor_cents,
               (10000 * pc) % total_pc AS rem,
               SUM((10000 * pc) // total_pc)
                   OVER (PARTITION BY l_orderkey) AS floor_sum
        FROM tot
    ),
    ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (
                   PARTITION BY l_orderkey
                   ORDER BY rem DESC, l_linenumber, pc) AS rr
        FROM shares
    )
    SELECT l_orderkey, l_linenumber,
           CAST(floor_cents
                + CASE WHEN rr <= 10000 - floor_sum THEN 1 ELSE 0 END
                AS BIGINT) AS alloc_cents
    FROM ranked
    ORDER BY l_orderkey, l_linenumber
    """,
)
def lineitem_allocate_rebate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-total proportional allocation (largest-remainder method):
    spread a fixed 100.00 order-level rebate across each order's
    lineitems proportional to extendedprice, in INTEGER CENTS, such that
    the allocations sum to exactly 10,000 cents per order — the
    invoice/ledger operator every finance warehouse carries, and the one
    naive ``ROUND(share)`` gets wrong (pennies drift).

    Algebra: floor allocation ``(10000·pc) div total_pc`` per line, then
    the leftover ``10000 − Σfloor`` pennies go to the largest division
    remainders (ties by line number, then cents — the fixture carries
    duplicate line numbers within an order, and rows identical in ALL
    of (rem, linenumber, pc) are output-indistinguishable, so the
    rank order is total where it matters).  All integer DIV/MOD — no float in
    the allocation path, so the result is engine-portable and auditable.

    Scale: two windows plus a rank, all sharing the ``l_orderkey``
    partitioning — one exchange end to end; orders are independent so
    the plan parallelizes embarrassingly at any fact size."""
    from pyspark.sql.window import Window

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 50 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * 100)
            .cast("bigint")
            .alias("pc"),
        )
    )
    by_order = Window.partitionBy("l_orderkey")
    shares = li.select(
        "l_orderkey",
        "l_linenumber",
        "pc",
        F.sum("pc").over(by_order).alias("total_pc"),
    ).select(
        "l_orderkey",
        "l_linenumber",
        "pc",
        F.expr("10000 * pc div total_pc").alias("floor_cents"),
        (10000 * F.col("pc") % F.col("total_pc")).alias("rem"),
    )
    ranked = shares.select(
        "*",
        F.sum("floor_cents").over(by_order).alias("floor_sum"),
        F.row_number()
        .over(
            by_order.orderBy(
                F.desc("rem"), F.asc("l_linenumber"), F.asc("pc")
            )
        )
        .alias("rr"),
    )
    return ranked.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("floor_cents")
            + F.when(
                F.col("rr") <= 10000 - F.col("floor_sum"), F.lit(1)
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("alloc_cents"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "customers_every_priority",
    # relational DIVISION: customers whose orders cover EVERY priority
    # level present in the data.  Textbook double-NOT-EXISTS semantics;
    # the engine uses the scalable count-match form with the divisor
    # cardinality computed from the data and broadcast.
    oracle="""
    WITH divisor AS (
        SELECT COUNT(DISTINCT o_orderpriority) AS n_prio FROM orders
    ),
    cov AS (
        SELECT o_custkey,
               COUNT(DISTINCT o_orderpriority) AS n_covered,
               COUNT(*) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT o_custkey AS c_custkey,
           CAST(n_covered AS BIGINT) AS n_priorities,
           CAST(n_orders AS BIGINT) AS n_orders
    FROM cov, divisor
    WHERE n_covered = n_prio
    ORDER BY c_custkey
    """,
)
def customers_every_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division — customers that have ordered at EVERY
    priority level (the "for all" join SQL never got a keyword for).
    The scalable form is count-matching, not double-NOT-EXISTS: one
    keyed aggregate counts each customer's DISTINCT covered divisor
    values, a 1-row broadcast carries the divisor's cardinality, and
    the filter keeps the customers where they agree.  No quadratic
    stage, no anti-join cascade; at 100 TB the only shuffle is the one
    keyed aggregate the query needs anyway."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    divisor = orders.agg(
        F.countDistinct("o_orderpriority").alias("n_prio")
    )
    cov = orders.groupBy("o_custkey").agg(
        F.countDistinct("o_orderpriority").alias("n_covered"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return (
        cov.join(F.broadcast(divisor))
        .where(F.col("n_covered") == F.col("n_prio"))
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.col("n_covered").cast("long").alias("n_priorities"),
            F.col("n_orders").cast("long").alias("n_orders"),
        )
        .orderBy("c_custkey")
    )


@register(
    "nation_trade_matrix",
    # the TPC-H Q7 shape: revenue flows between customer nations and
    # supplier nations — two dimension joins on opposite sides of the
    # same fact scan, exact cents
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice
                               * (1 - l.l_discount) * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    WHERE cn.n_name < sn.n_name
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def nation_trade_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral trade matrix (the TPC-H Q7 "volume shipping" shape):
    line revenue aggregated by (customer nation, supplier nation) pair,
    ordered pairs only.  The plan the shape exists to test: ONE fact
    scan with dimensions joined on BOTH sides — customer→nation through
    orders, supplier→nation directly.  The 25-row nation maps carry an
    explicit broadcast; customer/supplier are left to AQE (they
    broadcast at these SFs but legitimately shuffle at 100 TB, where
    the plan degrades to keyed joins, never a cross product).  Exact
    integer cents."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("long")
        .alias("cents"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    cn = nation.select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_name").alias("cust_nation"),
    )
    sn = nation.select(
        F.col("n_nationkey").alias("s_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), "c_nationkey")
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), "s_nationkey")
        .where(F.col("cust_nation") < F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .orderBy("cust_nation", "supp_nation")
    )
