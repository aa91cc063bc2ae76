"""Distributional statistics: concentration, weighted quantiles, digit-law
auditing.

* **Gini concentration** — per-nation inequality of customer order spend
  (the Lorenz-curve summary procurement and marketplace teams track).
  Computed from the closed form over ascending ranks,
  ``G = 2·Σ(i·xᵢ) / (n·Σx) − (n+1)/n`` — one rank window + one
  aggregate, no pairwise |xᵢ−xⱼ| join (that textbook form is O(n²) and
  dies at scale; the rank form is O(n log n) in the sort).
* **Weighted median** — the 50% point of a value distribution where each
  row carries a weight (price weighted by quantity here): the first
  value whose cumulative weight reaches half the total.  Ties in value
  merge their weights BEFORE the cumulative scan, so the result is a
  pure function of the distribution, not the row order.
* **Benford first-digit audit** — observed vs expected (log10(1+1/d))
  first-significant-digit distribution of order totals: the classic
  anomaly/fraud screen over financial feeds.  All counts exact integers;
  expectations rounded at 6 dp.

Scale notes (100 TB posture):
* Gini: the rank window shuffles once on the group key; sums are
  integer cents (exact in IEEE doubles far past this corpus); the
  closed form touches each row once.
* Weighted median: group-by-value pre-aggregation shrinks the window
  input to distinct values per group; the cumulative scan rides the
  same partitioning.
* Benford: map-side digit extraction, O(9·groups) reduce.

The reference engine (/root/reference/script.js) has no statistics
operators; this extends the mandated analytics surface (SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..sources.fixtures import load_table


@register(
    "nation_spend_gini",
    # rank closed form replayed verbatim: per-customer spend in integer
    # cents -> ascending (spend, custkey) rank -> one aggregate
    oracle="""
    WITH spend AS (
        SELECT c.c_nationkey AS nationkey,
               o.o_custkey,
               CAST(FLOOR(SUM(o.o_totalprice) * 100) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey, o.o_custkey
    ),
    ranked AS (
        SELECT nationkey, cents,
               ROW_NUMBER() OVER (
                   PARTITION BY nationkey ORDER BY cents, o_custkey
               ) AS rnk
        FROM spend
    )
    SELECT nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           ROUND(2.0 * SUM(rnk * cents) / (COUNT(*) * SUM(cents))
                 - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
    FROM ranked
    GROUP BY nationkey
    ORDER BY nationkey
    """,
)
def nation_spend_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Gini coefficient of customer order spend — revenue
    concentration as one rank window plus one aggregate.  Integer-cent
    spend keeps Σ(i·xᵢ) exactly representable (< 2⁵³) so the final
    double division is bit-identical across engines; ties rank by
    (spend, custkey) for a total order."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    spend = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders.o_custkey == customer.c_custkey,
        )
        .groupBy(
            F.col("c_nationkey").alias("nationkey"), F.col("o_custkey")
        )
        .agg(
            F.floor(F.sum("o_totalprice") * 100)
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.partitionBy("nationkey").orderBy("cents", "o_custkey")
    ranked = spend.select(
        "nationkey", "cents", F.row_number().over(w).alias("rnk")
    )
    n = F.count(F.lit(1))
    return (
        ranked.groupBy("nationkey")
        .agg(
            n.cast("long").alias("n_customers"),
            F.sum("cents").alias("total_cents"),
            F.round(
                2.0 * F.sum(F.col("rnk") * F.col("cents"))
                / (n * F.sum("cents"))
                - (n + F.lit(1.0)) / n,
                6,
            ).alias("gini"),
        )
        .orderBy("nationkey")
    )


@register(
    "lineitem_weighted_median_price",
    # per-flag weighted median of extendedprice weighted by quantity:
    # merge tie weights, cumulative scan, first value covering half
    oracle="""
    WITH by_value AS (
        SELECT l_returnflag,
               CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS price_cents,
               CAST(SUM(l_quantity) AS BIGINT) AS wt
        FROM lineitem
        GROUP BY l_returnflag, CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
    ),
    scanned AS (
        SELECT l_returnflag, price_cents, wt,
               SUM(wt) OVER (
                   PARTITION BY l_returnflag ORDER BY price_cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum_wt,
               SUM(wt) OVER (PARTITION BY l_returnflag) AS total_wt
        FROM by_value
    )
    SELECT l_returnflag,
           MIN(price_cents) AS median_price_cents,
           CAST(MIN(total_wt) AS BIGINT) AS total_weight
    FROM scanned
    WHERE 2 * cum_wt >= total_wt
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def lineitem_weighted_median_price(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quantity-weighted median unit price per returnflag: the first
    price (integer cents) whose cumulative quantity reaches half the
    flag's total — a weighted percentile no built-in aggregate covers.
    Tie weights merge before the cumulative window, so the input to the
    scan is distinct prices per flag (bounded), not raw lineitems."""
    li = load_table(spark, sf_dir, "lineitem")
    by_value = li.groupBy(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100)
        .cast("long")
        .alias("price_cents"),
    ).agg(F.sum("l_quantity").cast("long").alias("wt"))
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("price_cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("l_returnflag")
    scanned = by_value.select(
        "l_returnflag",
        "price_cents",
        F.sum("wt").over(w_cum).alias("cum_wt"),
        F.sum("wt").over(w_all).alias("total_wt"),
    )
    return (
        scanned.filter(2 * F.col("cum_wt") >= F.col("total_wt"))
        .groupBy("l_returnflag")
        .agg(
            F.min("price_cents").alias("median_price_cents"),
            F.min("total_wt").alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "orders_benford_audit",
    # first significant digit of o_totalprice vs log10(1 + 1/d)
    oracle="""
    WITH digits AS (
        SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                                AS VARCHAR), 1, 1) AS INT) AS digit
        FROM orders WHERE o_totalprice >= 1
    )
    SELECT d.digit,
           COALESCE(n.n_obs, 0) AS n_obs,
           ROUND(LOG10(1.0 + 1.0 / d.digit), 6) AS expected_freq,
           ROUND(COALESCE(n.n_obs, 0) * 1.0
                 / (SELECT COUNT(*) FROM digits), 6) AS observed_freq
    FROM (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9)) AS d(digit)
    LEFT JOIN (
        SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs
        FROM digits GROUP BY digit
    ) n ON d.digit = n.digit
    ORDER BY d.digit
    """,
)
def orders_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals: observed counts
    and frequencies per leading digit next to the log10(1+1/d)
    expectation — the financial-feed anomaly screen.  All nine digits
    always present (left join against the digit spine), counts exact,
    frequencies rounded at 6 dp."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") >= 1
    )
    digits = orders.select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    total = digits.count()
    counts = digits.groupBy("digit").agg(
        F.count(F.lit(1)).alias("n_obs")
    )
    spine = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    return (
        spine.join(F.broadcast(counts), "digit", "left")
        .select(
            "digit",
            F.coalesce(F.col("n_obs"), F.lit(0)).alias("n_obs"),
            F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6).alias(
                "expected_freq"
            ),
            F.round(
                F.coalesce(F.col("n_obs"), F.lit(0)) / F.lit(float(total)), 6
            ).alias("observed_freq"),
        )
        .orderBy("digit")
    )


@register(
    "events_lagged_crosscorr",
    # Pearson at each lag from EXACT integer sums (n, Σx, Σy, Σxy, Σx²,
    # Σy²) — no streaming covariance accumulator whose fp order could
    # differ between engines; the closed form over exact integers is
    # bit-identical
    oracle="""
    WITH v AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    p AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    pairs AS (
        SELECT l.lag, v.x, p.y
        FROM (VALUES (-3),(-2),(-1),(0),(1),(2),(3)) AS l(lag)
        JOIN v ON TRUE
        JOIN p ON p.day = v.day + l.lag * INTERVAL 1 DAY
    ),
    sums AS (
        SELECT lag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM pairs GROUP BY lag
    )
    SELECT lag, n,
           ROUND((n * sxy - sx * sy) /
                 NULLIF(SQRT((n * sxx - sx * sx) * 1.0)
                        * SQRT((n * syy - sy * sy) * 1.0), 0), 6)
               AS corr
    FROM sums ORDER BY lag
    """,
)
def events_lagged_crosscorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead–lag analysis: Pearson correlation between the daily view
    series and the daily purchase series at lags −3..+3 days — does
    viewing predict purchasing, and by how many days?  Correlations are
    computed from exact integer sufficient statistics (one aggregate per
    lag), not a floating accumulator, so both engines produce the same
    bits; the day-grain series are O(days) — the lag join is on bounded
    relations regardless of corpus size."""
    events = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("date").alias("day")
    v = (
        events.filter(F.col("event_type") == "view")
        .groupBy(day)
        .agg(F.count(F.lit(1)).alias("x"))
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(day)
        .agg(F.count(F.lit(1)).alias("y"))
    )
    lags = spark.range(-3, 4).select(F.col("id").cast("int").alias("lag"))
    pairs = (
        lags.crossJoin(v)
        .join(
            p.select(F.col("day").alias("p_day"), "y"),
            F.col("p_day") == F.date_add(F.col("day"), F.col("lag")),
        )
    )
    sums = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ) * F.sqrt(
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return sums.select(
        "lag",
        "n",
        F.round(num / F.nullif(den, F.lit(0.0)), 6).alias("corr"),
    ).orderBy("lag")
