"""Growth accounting and referential-integrity auditing.

* **Growth accounting** — the canonical product-analytics decomposition
  of daily active users into NEW / RETAINED / RESURRECTED (and the
  implied CHURNED from the previous day), plus cumulative registered
  users.  Everything derives from per-(user, day) activity plus each
  user's previous active day — one lag window — so the whole
  decomposition is exact integers and the identity
  ``dau = new + retained + resurrected`` holds row by row (asserted in
  pytest and implicitly by the oracle hash).
* **FK integrity audit** — orphan counts for every declared relationship
  (orders→customer, lineitem→orders, lineitem→part/supplier) via
  anti-join aggregation: the referential data-quality check any
  warehouse runs after load, complementing the in-flight
  ``DataFrame.observe`` invariants (observe.py) with a cross-table scan.

Scale notes (100 TB posture):
* Growth accounting: (user, day) dedup is one key shuffle; the lag
  window shares the same user partitioning; the final per-day rollup is
  O(days).  Cumulative-users is a running sum over the O(days) daily
  table — windowed over a bounded grain, not the fact.
* FK audit: each relationship is a LEFT ANTI join on its key — Spark
  broadcasts dimension sides when small and shuffles otherwise; counts
  aggregate map-side.  No row data survives the join, only counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..sources.fixtures import load_table


@register(
    "events_growth_accounting",
    oracle="""
    WITH user_days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    lagged AS (
        SELECT user_id, d,
               LAG(d) OVER (PARTITION BY user_id ORDER BY d) AS prev_d
        FROM user_days
    ),
    classified AS (
        SELECT d,
               COUNT(*) AS dau,
               COUNT(*) FILTER (WHERE prev_d IS NULL) AS new_users,
               COUNT(*) FILTER (WHERE prev_d = d - INTERVAL 1 DAY)
                   AS retained,
               COUNT(*) FILTER (WHERE prev_d IS NOT NULL
                                AND prev_d < d - INTERVAL 1 DAY)
                   AS resurrected
        FROM lagged GROUP BY d
    )
    SELECT CAST(d AS TIMESTAMP) AS day,
           CAST(dau AS BIGINT) AS dau,
           CAST(new_users AS BIGINT) AS new_users,
           CAST(retained AS BIGINT) AS retained,
           CAST(resurrected AS BIGINT) AS resurrected,
           CAST(COALESCE(LAG(dau) OVER (ORDER BY d), 0)
                - retained AS BIGINT) AS churned_from_prev,
           CAST(SUM(new_users) OVER (ORDER BY d) AS BIGINT)
               AS cumulative_users
    FROM classified
    ORDER BY day
    """,
)
def events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily growth accounting: dau = new + retained + resurrected, plus
    churned (previous day's actives who didn't return) and cumulative
    registered users — all from ONE user-partitioned lag window over
    deduped (user, day) activity.

    The two O(days) windows at the end (prev-day dau, running sum of
    new) run on the daily rollup — a bounded single-partition sort over
    the *day* grain, the same documented exception as the quantile
    spine, never over users or events.
    """
    events = load_table(spark, sf_dir, "events")
    user_days = events.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    lag_w = Window.partitionBy("user_id").orderBy("d")
    lagged = user_days.withColumn("prev_d", F.lag("d").over(lag_w))
    classified = lagged.groupBy("d").agg(
        F.count(F.lit(1)).alias("dau"),
        F.count(F.when(F.col("prev_d").isNull(), 1)).alias("new_users"),
        F.count(
            F.when(F.col("prev_d") == F.date_sub(F.col("d"), 1), 1)
        ).alias("retained"),
        F.count(
            F.when(
                F.col("prev_d").isNotNull()
                & (F.col("prev_d") < F.date_sub(F.col("d"), 1)),
                1,
            )
        ).alias("resurrected"),
    )
    # O(days) daily table asserted in-plan (VERDICT r10 task 3).
    from ..operators.guards import bounded_window_guard

    classified = bounded_window_guard(classified, "events_growth_accounting")
    day_w = Window.orderBy("d")
    return (
        classified.select(
            F.col("d").cast("timestamp").alias("day"),
            "dau",
            "new_users",
            "retained",
            "resurrected",
            (
                F.coalesce(F.lag("dau").over(day_w), F.lit(0))
                - F.col("retained")
            ).alias("churned_from_prev"),
            F.sum("new_users")
            .over(day_w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("cumulative_users"),
        )
        .orderBy("day")
    )


@register(
    "fk_integrity_audit",
    oracle="""
    SELECT * FROM (
        SELECT 'orders.custkey->customer' AS relationship,
               CAST((SELECT COUNT(*) FROM orders o
                     WHERE NOT EXISTS (SELECT 1 FROM customer c
                                       WHERE c.c_custkey = o.o_custkey))
                    AS BIGINT) AS orphans,
               CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_rows
        UNION ALL
        SELECT 'lineitem.orderkey->orders',
               CAST((SELECT COUNT(*) FROM lineitem l
                     WHERE NOT EXISTS (SELECT 1 FROM orders o
                                       WHERE o.o_orderkey = l.l_orderkey))
                    AS BIGINT),
               CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
        UNION ALL
        SELECT 'lineitem.partkey->part',
               CAST((SELECT COUNT(*) FROM lineitem l
                     WHERE NOT EXISTS (SELECT 1 FROM part p
                                       WHERE p.p_partkey = l.l_partkey))
                    AS BIGINT),
               CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
        UNION ALL
        SELECT 'lineitem.suppkey->supplier',
               CAST((SELECT COUNT(*) FROM lineitem l
                     WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                       WHERE s.s_suppkey = l.l_suppkey))
                    AS BIGINT),
               CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
        UNION ALL
        SELECT 'customer.nationkey->nation',
               CAST((SELECT COUNT(*) FROM customer c
                     WHERE NOT EXISTS (SELECT 1 FROM nation n
                                       WHERE n.n_nationkey = c.c_nationkey))
                    AS BIGINT),
               CAST((SELECT COUNT(*) FROM customer) AS BIGINT)
    )
    ORDER BY relationship
    """,
)
def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan count per declared FK
    relationship via LEFT ANTI joins, with the referencing table's total
    for rate context.  A healthy load shows zero everywhere; a non-zero
    row pinpoints which upstream extract broke."""
    t = {n: load_table(spark, sf_dir, n) for n in
         ("orders", "lineitem", "customer", "part", "supplier", "nation")}

    def audit(name, child, fk, parent, pk):
        # No forced broadcast: the parent KEY projection is dimension-sized
        # here, but orders/customer are fact-scale at 100 TB — Catalyst/AQE
        # picks broadcast vs shuffled anti join from actual sizes.
        orphans = (
            child.select(F.col(fk))
            .join(parent.select(F.col(pk).alias(fk)), fk, "left_anti")
            .agg(F.count(F.lit(1)).alias("orphans"))
        )
        total = child.agg(F.count(F.lit(1)).alias("n_rows"))
        return (
            orphans.join(F.broadcast(total))
            .select(
                F.lit(name).alias("relationship"), "orphans", "n_rows"
            )
        )

    rels = [
        audit("orders.custkey->customer", t["orders"], "o_custkey",
              t["customer"], "c_custkey"),
        audit("lineitem.orderkey->orders", t["lineitem"], "l_orderkey",
              t["orders"], "o_orderkey"),
        audit("lineitem.partkey->part", t["lineitem"], "l_partkey",
              t["part"], "p_partkey"),
        audit("lineitem.suppkey->supplier", t["lineitem"], "l_suppkey",
              t["supplier"], "s_suppkey"),
        audit("customer.nationkey->nation", t["customer"], "c_nationkey",
              t["nation"], "n_nationkey"),
    ]
    out = rels[0]
    for r in rels[1:]:
        out = out.unionAll(r)
    return out.orderBy("relationship")


@register(
    "events_daily_jaccard_retention",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    daily AS (
        SELECT d, CAST(COUNT(*) AS BIGINT) AS n FROM ud GROUP BY d
    ),
    inter AS (
        SELECT a.d AS d, CAST(COUNT(*) AS BIGINT) AS n_common
        FROM ud a JOIN ud b
          ON a.user_id = b.user_id AND b.d = a.d + INTERVAL 1 DAY
        GROUP BY a.d
    )
    SELECT CAST(da.d AS TIMESTAMP) AS day,
           da.n AS n_day, db.n AS n_next,
           COALESCE(i.n_common, 0) AS n_common,
           CAST(1000000 * COALESCE(i.n_common, 0)
                // (da.n + db.n - COALESCE(i.n_common, 0)) AS BIGINT)
               AS jaccard_ppm
    FROM daily da
    JOIN daily db ON db.d = da.d + INTERVAL 1 DAY
    LEFT JOIN inter i ON i.d = da.d
    ORDER BY day
    """,
)
def events_daily_jaccard_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day audience similarity: exact Jaccard between each day's
    active-user set and the next day's — the cohort-free retention pulse
    (a sudden dip flags a tracking break or a churn event; the HLL tier
    ``events_audience_overlap_hll`` is the approximate cousin across
    event types, this is the exact day axis).

    Plan: dedup to (user, day) — one key shuffle — then the intersection
    is a self-equi-join ON user_id with the day-shift as a join-time
    predicate (co-partitioned, no range join), rolled up to O(days)
    rows; the day-level joins at the end are dimension-sized.  Integer
    counts, one exact ppm division."""
    events = load_table(spark, sf_dir, "events")
    # The deduped (user, day) table forks three ways (daily counts, the
    # shifted join side, the intersection) — a lazy localCheckpoint cuts
    # the lineage so the dedup shuffle runs ONCE, not per branch (the
    # plan showed 8 exchanges / 4 scans without it).
    ud = (
        events.select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    daily = ud.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    b = ud.select("user_id", F.date_sub(F.col("d"), 1).alias("d"))
    inter = (
        ud.join(b, ["user_id", "d"])
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    da, db_, i = daily.alias("da"), daily.alias("db"), inter.alias("i")
    return (
        da.join(db_, F.col("db.d") == F.date_add(F.col("da.d"), 1))
        .join(i, F.col("i.d") == F.col("da.d"), "left")
        .select(
            F.col("da.d").cast("timestamp").alias("day"),
            F.col("da.n").alias("n_day"),
            F.col("db.n").alias("n_next"),
            F.coalesce(F.col("i.n_common"), F.lit(0)).alias("n_common"),
            F.expr(
                "1000000 * coalesce(i.n_common, 0) div "
                "(da.n + db.n - coalesce(i.n_common, 0))"
            ).alias("jaccard_ppm"),
        )
        .orderBy("day")
    )


@register(
    "events_dau_mau_stickiness",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    daily AS (
        SELECT date_trunc('month', d) AS m, d, CAST(COUNT(*) AS BIGINT) AS dau
        FROM ud GROUP BY 1, 2
    ),
    monthly AS (
        SELECT date_trunc('month', d) AS m,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
        FROM ud GROUP BY 1
    )
    SELECT CAST(da.m AS TIMESTAMP) AS month,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(da.dau) AS BIGINT) AS dau_sum,
           mo.mau AS mau,
           CAST(1000000 * SUM(da.dau) // (COUNT(*) * mo.mau) AS BIGINT)
               AS stickiness_ppm
    FROM daily da JOIN monthly mo ON mo.m = da.m
    GROUP BY da.m, mo.mau
    ORDER BY month
    """,
)
def events_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per month — mean daily actives over monthly
    actives, the standard engagement-depth ratio (a falling stickiness
    with flat MAU means the same audience shows up less often).

    Exact integers end to end: sum-of-DAU and MAU are counts, the ratio
    is one integer ppm division.  Plan: one (user, day) dedup shuffle
    feeds BOTH grains (daily counts and monthly distinct users); rollups
    are O(days) and O(months)."""
    events = load_table(spark, sf_dir, "events")
    ud = events.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    daily = ud.groupBy(
        F.date_trunc("month", "d").alias("m"), "d"
    ).agg(F.count(F.lit(1)).alias("dau"))
    monthly = ud.groupBy(F.date_trunc("month", "d").alias("m")).agg(
        F.countDistinct("user_id").alias("mau")
    )
    return (
        daily.join(monthly, "m")
        .groupBy("m", "mau")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("dau").alias("dau_sum"),
        )
        .select(
            F.col("m").cast("timestamp").alias("month"),
            "n_days",
            "dau_sum",
            "mau",
            F.expr("1000000 * dau_sum div (n_days * mau)").alias(
                "stickiness_ppm"
            ),
        )
        .orderBy("month")
    )
