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


@register(
    "orders_revenue_recognition",
    # 90-day straight-line recognition: month-overlap day counts drive a
    # largest-remainder split of the order's integer cents — per-order
    # sums are EXACT by construction, ties broken (remainder desc, month)
    oracle="""
    WITH o AS (
        SELECT o_orderkey,
               CAST(o_orderdate AS DATE) AS d0,
               CAST(o_orderdate AS DATE) + INTERVAL 90 DAY AS d1,
               CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    months AS (
        SELECT o.o_orderkey, o.cents,
               CAST(date_trunc('month', o.d0) + m.i * INTERVAL 1 MONTH
                    AS DATE) AS month_start,
               CAST(date_trunc('month', o.d0) + (m.i + 1) * INTERVAL 1 MONTH
                    AS DATE) AS month_end,
               o.d0, o.d1
        FROM o JOIN (VALUES (0),(1),(2),(3)) AS m(i) ON TRUE
    ),
    days AS (
        SELECT o_orderkey, cents, month_start,
               date_diff('day',
                   GREATEST(month_start, d0),
                   LEAST(month_end, CAST(d1 AS DATE))) AS n_days
        FROM months
        WHERE date_diff('day',
                  GREATEST(month_start, d0),
                  LEAST(month_end, CAST(d1 AS DATE))) > 0
    ),
    shares AS (
        SELECT *,
               SUM(n_days) OVER (PARTITION BY o_orderkey) AS total_days,
               (cents * n_days) // SUM(n_days) OVER (PARTITION BY o_orderkey)
                   AS floor_cents,
               (cents * n_days) % SUM(n_days) OVER (PARTITION BY o_orderkey)
                   AS rem
        FROM days
    ),
    ranked AS (
        SELECT *,
               SUM(floor_cents) OVER (PARTITION BY o_orderkey) AS floor_sum,
               ROW_NUMBER() OVER (
                   PARTITION BY o_orderkey
                   ORDER BY rem DESC, month_start) AS rr
        FROM shares
    )
    SELECT o_orderkey,
           month_start AS month,
           CAST(floor_cents
                + CASE WHEN rr <= cents - floor_sum THEN 1 ELSE 0 END
                AS BIGINT) AS rec_cents
    FROM ranked
    ORDER BY o_orderkey, month
    """,
)
def orders_revenue_recognition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendarized revenue recognition: each order's total (integer
    cents) recognised straight-line over the 90 days from its order
    date, split across the calendar months that window touches by
    day-count shares with LARGEST-REMAINDER exactness — per-order month
    rows sum to the order total to the penny, always (naive
    ROUND(cents·days/total) drifts by ±1 per month and books phantom
    pennies).  The month explode is a 4-row sequence per order (bounded),
    the remainder ranking one per-order window — all integer algebra, so
    the hash certifies penny-exactness across engines."""
    from ..session import spread

    orders = load_table(spark, sf_dir, "orders")
    # Establish the o_orderkey partitioning ONCE, before the ×4 month
    # explode: the downstream windows are keyed on o_orderkey, so this
    # exchange replaces the window's own shuffle (guide §2.4) while
    # moving the explode + date arithmetic off the scan's one partition.
    o = spread(orders, "o_orderkey").select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("d0"),
        F.date_add(F.col("o_orderdate").cast("date"), 90).alias("d1"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    m0 = F.trunc("d0", "month")
    months = o.select(
        "o_orderkey",
        "cents",
        "d0",
        "d1",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i"),
    ).select(
        "o_orderkey",
        "cents",
        F.add_months(m0, F.col("i")).alias("month_start"),
        F.add_months(m0, F.col("i") + 1).alias("month_end"),
        "d0",
        "d1",
    )
    n_days = F.datediff(
        F.least("month_end", "d1"), F.greatest("month_start", "d0")
    )
    days = months.select(
        "o_orderkey",
        "cents",
        "month_start",
        n_days.alias("n_days"),
    ).filter(F.col("n_days") > 0)
    w_o = Window.partitionBy("o_orderkey")
    shares = days.select(
        "o_orderkey",
        "cents",
        "month_start",
        F.expr("cents * n_days").alias("num"),
        F.sum("n_days").over(w_o).alias("total_days"),
    ).select(
        "o_orderkey",
        "cents",
        "month_start",
        F.expr("num div total_days").alias("floor_cents"),
        (F.col("num") % F.col("total_days")).alias("rem"),
    )
    w_rank = Window.partitionBy("o_orderkey").orderBy(
        F.col("rem").desc(), "month_start"
    )
    ranked = shares.select(
        "o_orderkey",
        "month_start",
        "floor_cents",
        F.sum("floor_cents").over(w_o).alias("floor_sum"),
        F.row_number().over(w_rank).alias("rr"),
        "cents",
    )
    return ranked.select(
        "o_orderkey",
        F.col("month_start").alias("month"),
        (
            F.col("floor_cents")
            + F.when(
                F.col("rr") <= F.col("cents") - F.col("floor_sum"), 1
            ).otherwise(0)
        ).cast("long").alias("rec_cents"),
    )
    # (trailing global sort dropped r11: order-insensitive driver compare,
    # r10 asof precedent — it range-shuffled all 600k output rows.)


@register(
    "events_transition_entropy",
    # per-user Shannon entropy of the event-type transition distribution
    oracle="""
    WITH seq AS (
        SELECT user_id,
               event_type AS cur,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    pairs AS (
        SELECT user_id, cur, nxt, CAST(COUNT(*) AS BIGINT) AS c
        FROM seq WHERE nxt IS NOT NULL
        GROUP BY user_id, cur, nxt
    ),
    tot AS (
        SELECT *, SUM(c) OVER (PARTITION BY user_id) AS t FROM pairs
    )
    SELECT user_id,
           CAST(SUM(c) AS BIGINT) AS n_transitions,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(SUM(-(c * 1.0 / t) * LOG2(c * 1.0 / t)), 6) AS entropy_bits
    FROM tot
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral predictability per user: Shannon entropy (bits) of the
    event-type transition distribution — the information-theoretic
    complement of the Markov transition matrix (low entropy = scripted
    bot-like sequences, high = diverse organic use).  One lag window on
    the (user, time) ordering the sessionize family already shuffles by,
    then exact integer pair counts; the entropy sum runs over O(type²)
    rows per user."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id",
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    pairs = seq.groupBy("user_id", "cur", "nxt").agg(
        F.count(F.lit(1)).alias("c")
    )
    t = F.sum("c").over(Window.partitionBy("user_id"))
    tot = pairs.select("user_id", "c", t.alias("t"))
    p = F.col("c") / F.col("t")
    return (
        tot.groupBy("user_id")
        .agg(
            F.sum("c").alias("n_transitions"),
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.sum(-p * F.log2(p)), 6).alias("entropy_bits"),
        )
        .orderBy("user_id")
    )


@register(
    "events_login_streaks",
    # gaps-and-islands on integer day numbers: a streak breaks when the
    # day gap exceeds 1; per user keep the longest streak
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id,
               CAST(date_diff('day', DATE '2024-01-01',
                              CAST(date_trunc('day', ts) AS DATE))
                    AS BIGINT) AS d
        FROM events
    ),
    flagged AS (
        SELECT user_id, d,
               CASE WHEN d - LAG(d) OVER (
                        PARTITION BY user_id ORDER BY d) = 1
                    THEN 0 ELSE 1 END AS brk
        FROM days
    ),
    streaks AS (
        SELECT user_id, d,
               SUM(brk) OVER (
                   PARTITION BY user_id ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS streak_id
        FROM flagged
    ),
    lens AS (
        SELECT user_id, streak_id,
               CAST(COUNT(*) AS BIGINT) AS len,
               MIN(d) AS start_d
        FROM streaks GROUP BY user_id, streak_id
    )
    SELECT user_id,
           MAX(len) AS longest_streak,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(SUM(len) AS BIGINT) AS active_days
    FROM lens
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_login_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-day activity streaks per user — the engagement staple
    (duolingo-style): distinct active days → break flags where the day
    gap exceeds 1 → running-sum streak ids → per-user longest streak,
    streak count, and total active days.  The (user, day) dedup is one
    key shuffle; the lag/sum windows ride the same partitioning — the
    sessionization cost shape on a day grain."""
    events = load_table(spark, sf_dir, "events")
    days = events.select(
        "user_id",
        F.datediff(
            F.date_trunc("day", "ts").cast("date"), F.lit("2024-01-01")
        ).cast("long").alias("d"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    flagged = days.select(
        "user_id",
        "d",
        F.when(F.col("d") - F.lag("d").over(w) == 1, 0)
        .otherwise(1)
        .alias("brk"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    streaks = flagged.select(
        "user_id", "d", F.sum("brk").over(w_run).alias("streak_id")
    )
    lens = streaks.groupBy("user_id", "streak_id").agg(
        F.count(F.lit(1)).alias("len")
    )
    return (
        lens.groupBy("user_id")
        .agg(
            F.max("len").alias("longest_streak"),
            F.count(F.lit(1)).alias("n_streaks"),
            F.sum("len").alias("active_days"),
        )
        .orderBy("user_id")
    )


@register(
    "orders_yoy_growth",
    # calendar-aligned self-join: month m joined to m - 12; growth in ppm
    # from integer cents so the division is engine-identical
    oracle="""
    WITH monthly AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT cur.month,
           cur.cents AS revenue_cents,
           cur.n_orders,
           prev.cents AS prev_year_cents,
           CAST((cur.cents - prev.cents) * 1000000 // prev.cents
                AS BIGINT) AS yoy_growth_ppm
    FROM monthly cur JOIN monthly prev
      ON cur.month = prev.month + INTERVAL 12 MONTH
    ORDER BY cur.month
    """,
)
def orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year monthly revenue growth: the calendar-aligned
    self-join every BI layer runs — month m against m−12, growth in ppm
    from integer cents (floor division, engine-identical).  The monthly
    rollup is O(months) — the self-join and everything after run on a
    bounded relation regardless of fact size."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias(
            "cents"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )
    cur = monthly.alias("cur")
    prev = monthly.select(
        F.add_months("month", 12).alias("month"),
        F.col("cents").alias("prev_year_cents"),
    ).alias("prev")
    return (
        cur.join(prev, "month")
        .select(
            "month",
            F.col("cents").alias("revenue_cents"),
            "n_orders",
            "prev_year_cents",
            F.expr(
                "(cents - prev_year_cents) * 1000000 div prev_year_cents"
            ).alias("yoy_growth_ppm"),
        )
        .orderBy("month")
    )


@register(
    "orders_target_encoding",
    # m-estimate smoothed target encoding from exact integer sums:
    # enc = (sum_cat + m * global_mean) / (n_cat + m), m = 20; both
    # engines divide the same exact integers, ROUND(6) seals the hash
    oracle="""
    WITH g AS (
        SELECT CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS gsum,
               CAST(COUNT(*) AS BIGINT) AS gn
        FROM orders
    ),
    cat AS (
        SELECT o_orderpriority,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS csum,
               CAST(COUNT(*) AS BIGINT) AS cn
        FROM orders GROUP BY o_orderpriority
    )
    SELECT c.o_orderpriority,
           c.cn AS n_rows,
           ROUND(c.csum * 1.0 / c.cn / 100, 6) AS raw_mean,
           ROUND((c.csum + 20.0 * g.gsum / g.gn) / (c.cn + 20) / 100, 6)
               AS encoded_mean
    FROM cat c CROSS JOIN g
    ORDER BY c.o_orderpriority
    """,
)
def orders_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target encoding (m-estimate, m=20) of order priority
    against order value — the categorical-ML-prep transform that
    replaces a category with its shrunk target mean so rare categories
    don't memorize noise.  Encodings derive from exact integer cent
    sums, so both engines compute identical doubles; at 100 TB this is
    one map-side aggregate per category plus a broadcast of the O(1)
    global prior."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    g = orders.agg(
        F.sum(cents).alias("gsum"), F.count(F.lit(1)).alias("gn")
    )
    cat = orders.groupBy("o_orderpriority").agg(
        F.sum(cents).alias("csum"), F.count(F.lit(1)).alias("cn")
    )
    return (
        cat.crossJoin(F.broadcast(g))
        .select(
            "o_orderpriority",
            F.col("cn").alias("n_rows"),
            F.round(F.col("csum") / F.col("cn") / 100.0, 6).alias("raw_mean"),
            F.round(
                (F.col("csum") + 20.0 * F.col("gsum") / F.col("gn"))
                / (F.col("cn") + 20)
                / 100.0,
                6,
            ).alias("encoded_mean"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "events_survival_km",
    # Kaplan-Meier estimator with right-censoring: per-user duration from
    # first event to first purchase (event) or last activity (censored);
    # survival = running product of (1 - d/n) computed as EXP of a running
    # SUM of LN terms — both engines sum identical doubles in frame order.
    # A time where d = n would be LN(0): guarded by an explicit zero flag
    # (DuckDB's LN(0) errors; Spark's returns null).
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(date_trunc('day', MIN(ts)) AS DATE) AS first_day,
               CAST(date_trunc('day', MAX(ts)) AS DATE) AS last_day,
               CAST(date_trunc('day',
                    MIN(CASE WHEN event_type = 'purchase' THEN ts END))
                    AS DATE) AS conv_day
        FROM events GROUP BY user_id
    ),
    durations AS (
        SELECT CASE WHEN conv_day IS NOT NULL
                    THEN date_diff('day', first_day, conv_day)
                    ELSE date_diff('day', first_day, last_day) END AS t,
               CASE WHEN conv_day IS NOT NULL THEN 1 ELSE 0 END AS is_event
        FROM per_user
    ),
    grouped AS (
        SELECT CAST(t AS BIGINT) AS t_days,
               CAST(SUM(is_event) AS BIGINT) AS d,
               CAST(COUNT(*) AS BIGINT) AS leaving
        FROM durations GROUP BY t
    ),
    risk AS (
        SELECT t_days, d,
               SUM(leaving) OVER (
                   ORDER BY t_days DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS n_risk
        FROM grouped
    )
    SELECT t_days,
           CAST(n_risk AS BIGINT) AS n_risk,
           d AS n_events,
           CASE WHEN MAX(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER w = 1
                THEN CAST(0.0 AS DOUBLE)
                ELSE ROUND(EXP(SUM(
                         CASE WHEN d > 0 AND d < n_risk
                              THEN LN(1.0 - d * 1.0 / n_risk) END) OVER w), 6)
           END AS survival
    FROM risk
    WHERE d > 0
    WINDOW w AS (ORDER BY t_days
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY t_days
    """,
)
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival with right-censoring — time from a user's
    first event to first purchase, censored at last activity for users
    who never convert: the churn/conversion curve product analytics is
    built on, and the estimator naive "conversion rate by day" gets
    WRONG when observation windows differ per user.  One per-user
    aggregate, an O(distinct durations) risk-set scan (descending
    cumulative count), and the product as EXP∘SUM∘LN in frame order —
    exact integer d/n makes both engines compute identical doubles."""
    events = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("date")
    per_user = events.groupBy("user_id").agg(
        F.min(day).alias("first_day"),
        F.max(day).alias("last_day"),
        F.min(
            F.when(F.col("event_type") == "purchase", day)
        ).alias("conv_day"),
    )
    durations = per_user.select(
        F.when(
            F.col("conv_day").isNotNull(),
            F.datediff("conv_day", "first_day"),
        )
        .otherwise(F.datediff("last_day", "first_day"))
        .cast("long")
        .alias("t_days"),
        F.col("conv_day").isNotNull().cast("long").alias("is_event"),
    )
    grouped = durations.groupBy("t_days").agg(
        F.sum("is_event").alias("d"), F.count(F.lit(1)).alias("leaving")
    )
    # Life table = O(distinct durations in days) — bounded by the
    # observation span, not the corpus; assert it before the global
    # cumulative windows (VERDICT r10 task 3).
    from ..operators.guards import bounded_window_guard

    grouped = bounded_window_guard(grouped, "events_survival_km")
    w_desc = (
        Window.orderBy(F.col("t_days").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = grouped.select(
        "t_days", "d", F.sum("leaving").over(w_desc).alias("n_risk")
    )
    w_asc = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ln_term = F.when(
        (F.col("d") > 0) & (F.col("d") < F.col("n_risk")),
        F.log(1.0 - F.col("d") / F.col("n_risk")),
    )
    hit_zero = F.max(
        F.when(F.col("d") == F.col("n_risk"), 1).otherwise(0)
    ).over(w_asc)
    survival = F.when(hit_zero == 1, F.lit(0.0)).otherwise(
        F.round(F.exp(F.sum(ln_term).over(w_asc)), 6)
    )
    return (
        risk.withColumn("n_events", F.col("d"))
        .withColumn("survival", survival)
        .filter(F.col("d") > 0)
        .select("t_days", "n_risk", "n_events", "survival")
        .orderBy("t_days")
    )


@register(
    "events_quantile_normalize",
    # rank within type -> cross-type mean per rank -> join back
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(SUM(FLOOR(value * 100)) AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ),
    ranked AS (
        SELECT event_type, d, cents,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY cents, d
               ) AS rnk
        FROM daily
    ),
    ref AS (
        SELECT rnk, SUM(cents) / COUNT(*) AS norm
        FROM ranked GROUP BY rnk
    )
    SELECT r.event_type, r.d, r.cents,
           CAST(r.rnk AS BIGINT) AS rnk,
           ROUND(f.norm, 6) AS norm_cents
    FROM ranked r JOIN ref f ON f.rnk = r.rnk
    ORDER BY r.event_type, r.d
    """,
)
def events_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of each type's daily-spend distribution —
    every group is mapped onto the cross-group mean distribution at the
    same rank (the bioinformatics/feature-prep classic that forces
    identical marginal distributions).  One rank window per group, one
    O(ranks) reference aggregate, one broadcast join back; integer-cent
    sums keep the reference means a single exact division.  At 100 TB
    the day-grain rollup bounds everything after the first map-side
    aggregation."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(
        F.sum(F.floor(F.col("value") * 100)).cast("long").alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("cents", "d")
    ranked = daily.withColumn("rnk", F.row_number().over(w))
    ref = ranked.groupBy("rnk").agg(
        (F.sum("cents") / F.count(F.lit(1))).alias("norm")
    )
    return (
        ranked.join(F.broadcast(ref), "rnk")
        .select(
            "event_type",
            "d",
            "cents",
            F.col("rnk").cast("long").alias("rnk"),
            F.round("norm", 6).alias("norm_cents"),
        )
        .orderBy("event_type", "d")
    )


@register(
    "nation_supplier_hhi",
    # HHI from exact integer revenue sums: 10000·Σr²/(Σr)² — shares are
    # never materialized individually, so no order-dependent float sum
    oracle="""
    WITH rev AS (
        SELECT s.s_nationkey AS nationkey, l.l_suppkey,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice
                                   * (1 - l.l_discount) * 100)
                             AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        GROUP BY 1, 2
    )
    SELECT nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           ROUND(10000.0 * SUM(1.0 * cents * cents)
                 / (1.0 * SUM(cents) * SUM(cents)), 6) AS hhi
    FROM rev
    GROUP BY nationkey
    ORDER BY nationkey
    """,
)
def nation_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration index of supplier revenue per
    nation (the antitrust-style market-concentration stat, companion to
    the Gini query): HHI = 10000·Σshare².  Computed as
    10000·Σr²/(Σr)² over integer cents, so both sums are exact and the
    single division is bit-stable — individual shares never exist as
    floats.  Σr² of int64 cents can exceed 2⁵³ in doubles at extreme
    scale; the 1.0· promotion matches DuckDB's HUGEINT→DOUBLE rounding
    on the same exact integer, keeping both engines on the identical
    nearest-double."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    rev = (
        li.join(
            F.broadcast(supp.select("s_suppkey", "s_nationkey")),
            li.l_suppkey == supp.s_suppkey,
        )
        .groupBy(
            F.col("s_nationkey").alias("nationkey"), F.col("l_suppkey")
        )
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * 100
                ).cast("long")
            )
            .cast("long")
            .alias("cents")
        )
    )
    return (
        rev.groupBy("nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.sum("cents").cast("long").alias("total_cents"),
            F.round(
                F.lit(10000.0)
                * F.sum(F.lit(1.0) * F.col("cents") * F.col("cents"))
                / (F.lit(1.0) * F.sum("cents") * F.sum("cents")),
                6,
            ).alias("hhi"),
        )
        .orderBy("nationkey")
    )


@register(
    "events_burstiness",
    # burstiness B = (σ−μ)/(σ+μ) over integer-µs inter-arrival gaps:
    # moment sums exact, σ via one sqrt, one division at the end
    oracle="""
    WITH gaps AS (
        SELECT event_type,
               CAST((epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
               )) // 1000 AS BIGINT) AS gap_ms
        FROM events
    ),
    moments AS (
        SELECT event_type,
               CAST(COUNT(gap_ms) AS BIGINT) AS n_gaps,
               CAST(SUM(gap_ms) AS BIGINT) AS sg,
               CAST(SUM(gap_ms * gap_ms) AS BIGINT) AS sgg
        FROM gaps WHERE gap_ms IS NOT NULL
        GROUP BY event_type
    )
    SELECT event_type, n_gaps,
           CAST(sg // n_gaps AS BIGINT) AS mean_gap_ms,
           ROUND((SQRT((1.0 * n_gaps * sgg - 1.0 * sg * sg)
                       / (1.0 * n_gaps * n_gaps))
                  - 1.0 * sg / n_gaps)
                 / (SQRT((1.0 * n_gaps * sgg - 1.0 * sg * sg)
                         / (1.0 * n_gaps * n_gaps))
                    + 1.0 * sg / n_gaps), 6) AS burstiness
    FROM moments
    ORDER BY event_type
    """,
)
def events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness index B = (σ−μ)/(σ+μ) of inter-arrival times per
    event type (Goh & Barabási): −1 ≈ periodic, 0 ≈ Poisson, →1 ≈
    extreme bursts — the one-number answer to "is this feed clumpy?".
    Gaps are exact integer MILLISECONDS (µs diffs floor-divided by
    1000 in both engines): at µs grain Σgap² overflows int64 once a
    type's gaps reach ~half an hour over a month-long fixture; ms keeps
    the exact-integer discipline with ~10⁶ headroom.  A multi-YEAR
    sparse feed would need second grain — same one-line change."""
    ev = load_table(spark, sf_dir, "events")
    gaps = ev.select(
        "event_type",
        F.expr(
            "(unix_micros(ts) - lag(unix_micros(ts)) over "
            "(partition by event_type order by ts, event_id)) div 1000"
        ).alias("gap_ms"),
    ).where(F.col("gap_ms").isNotNull())
    m = gaps.groupBy("event_type").agg(
        F.count("gap_ms").cast("long").alias("n_gaps"),
        F.sum("gap_ms").cast("long").alias("sg"),
        F.sum(F.col("gap_ms") * F.col("gap_ms")).cast("long").alias("sgg"),
    )
    n, sg, sgg = F.col("n_gaps"), F.col("sg"), F.col("sgg")
    sigma = F.sqrt(
        (F.lit(1.0) * n * sgg - F.lit(1.0) * sg * sg)
        / (F.lit(1.0) * n * n)
    )
    mu = F.lit(1.0) * sg / n
    return m.select(
        "event_type",
        "n_gaps",
        F.expr("sg div n_gaps").alias("mean_gap_ms"),
        F.round((sigma - mu) / (sigma + mu), 6).alias("burstiness"),
    ).orderBy("event_type")
