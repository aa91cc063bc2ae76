"""Time-series statistics: rolling regression, seasonal decomposition,
monotone-trend testing, and proportion confidence intervals.

The reference engine (/root/reference/script.js) stores an hourly series
per (site, location) but ships zero analytics over it; these are the
four shapes every metrics/monitoring consumer of such a table asks for
first:

* **Rolling OLS slope** — the trailing-window trend of a per-key metric
  (is this sensor's count drifting up?).  Closed form from five window
  sums; no iteration.
* **Seasonal decomposition (STL-lite)** — classical additive
  decomposition: trend = centered moving average, seasonal = mean
  detrended value per hour-of-day, residual = remainder.  The residual
  is what anomaly detectors score.
* **Mann-Kendall trend test** — the standard nonparametric "is there a
  monotone trend" test (sign of all pairwise differences, tie-corrected
  variance, z-score).  Pairwise — but over the DAY-GRAIN series, so the
  pair count is calendar-bounded (365 days → 66k pairs/key/year), not
  data-bounded: 100 TB of raw events still reduce to the same tiny
  series before any O(n²) step.
* **Wilson score interval** — the right confidence interval for a
  conversion-style proportion (never escapes [0,1], behaves at small n,
  the screening stat behind every A/B dashboard readout).

Exactness discipline (drivers hash values bit-for-bit): every
accumulation happens in integers — values are scaled to cents, rolling
x-coordinates are ROW indices (consecutive small ints), counts are
counts — so window/group sums are exactly representable and engine
summation order cannot matter.  The only floating steps are single
IEEE-defined ops on those exact integers (one division, one sqrt),
bit-identical in any IEEE-754 engine, surfaced rounded well above ulp.

Nothing here exists in the reference; the family extends SURVEY.md §2.10
(time-series gap fill / EWMA / seasonal anomalies already landed; this
closes the decomposition/trend-test/rolling-fit gap).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..sources.fixtures import load_table

#: trailing window length for the rolling slope (rows, per key)
SLOPE_WINDOW = 24
#: success threshold for the Wilson conversion proportion
WILSON_THRESHOLD = 50.0
#: z for a 95% Wilson interval
WILSON_Z = 1.959963984540054


@register(
    "events_rolling_slope",
    oracle=f"""
    WITH seq AS (
        SELECT user_id,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS rn,
               CAST(FLOOR(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    sums AS (
        SELECT user_id, rn,
               COUNT(*)      OVER w AS n,
               SUM(rn)       OVER w AS sx,
               SUM(cents)    OVER w AS sy,
               SUM(rn*cents) OVER w AS sxy,
               SUM(rn*rn)    OVER w AS sxx
        FROM seq
        WINDOW w AS (
            PARTITION BY user_id ORDER BY rn
            ROWS BETWEEN {SLOPE_WINDOW - 1} PRECEDING AND CURRENT ROW
        )
    )
    SELECT user_id, CAST(rn AS BIGINT) AS rn,
           ROUND((1.0 * n * sxy - 1.0 * sx * sy)
                 / (1.0 * n * sxx - 1.0 * sx * sx), 6) AS slope_cents
    FROM sums
    WHERE n = {SLOPE_WINDOW}
    ORDER BY user_id, rn
    """,
)
def events_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-{SLOPE_WINDOW}-event OLS slope of spend (cents) against
    event index, per user — drift detection as one partitioned window
    pass.  x = row index and y = integer cents keep all five window
    sums exact, so the closed-form slope is bit-identical across
    engines; rows without a full window drop.  At 100 TB the window
    sorts within each user's partition only — no global sort, no
    self-join."""
    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        "user_id",
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("rn"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("rn")
        .rowsBetween(-(SLOPE_WINDOW - 1), 0)
    )
    n = F.count(F.lit(1)).over(w)
    sx = F.sum("rn").over(w)
    sy = F.sum("cents").over(w)
    sxy = F.sum(F.col("rn") * F.col("cents")).over(w)
    sxx = F.sum(F.col("rn") * F.col("rn")).over(w)
    return (
        seq.select(
            "user_id",
            F.col("rn").cast("long").alias("rn"),
            n.alias("_n"),
            sx.alias("_sx"),
            sy.alias("_sy"),
            sxy.alias("_sxy"),
            sxx.alias("_sxx"),
        )
        .where(F.col("_n") == SLOPE_WINDOW)
        .select(
            "user_id",
            "rn",
            F.round(
                (
                    F.lit(1.0) * F.col("_n") * F.col("_sxy")
                    - F.lit(1.0) * F.col("_sx") * F.col("_sy")
                )
                / (
                    F.lit(1.0) * F.col("_n") * F.col("_sxx")
                    - F.lit(1.0) * F.col("_sx") * F.col("_sx")
                ),
                6,
            ).alias("slope_cents"),
        )
        .orderBy("user_id", "rn")
    )


@register(
    "events_stl_decompose",
    # classical additive decomposition replayed verbatim: integer hourly
    # counts -> exact 25h centered mean -> hour-of-day seasonal means
    oracle="""
    WITH hourly AS (
        SELECT event_type,
               date_trunc('hour', ts) AS hour_ts,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events
        GROUP BY 1, 2
    ),
    trended AS (
        SELECT event_type, hour_ts, cnt,
               SUM(cnt)  OVER w AS wsum,
               COUNT(*)  OVER w AS wn
        FROM hourly
        WINDOW w AS (
            PARTITION BY event_type ORDER BY hour_ts
            ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING
        )
    ),
    detrended AS (
        SELECT event_type, hour_ts, cnt, wsum,
               wsum / 25.0 AS trend,
               cnt - wsum / 25.0 AS dt
        FROM trended WHERE wn = 25
    ),
    seasonal AS (
        -- all-integer accumulation, ONE IEEE division: AVG over float dt
        -- would be an order-dependent sum (ADVICE r09 #2)
        SELECT event_type, EXTRACT(hour FROM hour_ts) AS hod,
               (25 * SUM(cnt) - SUM(wsum)) / (25.0 * COUNT(*)) AS seas
        FROM detrended GROUP BY 1, 2
    )
    SELECT d.event_type, d.hour_ts, d.cnt,
           ROUND(d.trend, 6) + 0.0 AS trend,
           ROUND(s.seas, 6) + 0.0 AS seasonal,
           ROUND(d.dt - s.seas, 6) + 0.0 AS residual
    FROM detrended d
    JOIN seasonal s
      ON s.event_type = d.event_type
     AND s.hod = EXTRACT(hour FROM d.hour_ts)
    ORDER BY d.event_type, d.hour_ts
    """,
)
def events_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of the hourly event-count series
    per type: trend (centered 25 h moving mean over integer counts —
    the sum is exact, the single /25.0 is one IEEE op), hour-of-day
    seasonal mean of the detrended series, residual.  Edges without a
    full trend window drop.  The hourly pre-aggregation bounds every
    later stage by the calendar × type cardinality, so 100 TB of raw
    events change only the first map-side rollup; the seasonal join
    broadcasts (24 × types rows)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(-12, 12)
    )
    detrended = (
        hourly.withColumn("wsum", F.sum("cnt").over(w))
        .withColumn("wn", F.count(F.lit(1)).over(w))
        .where(F.col("wn") == 25)
        .withColumn("trend", F.col("wsum") / F.lit(25.0))
        .withColumn("dt", F.col("cnt") - F.col("trend"))
        .drop("wn")
    )
    # Seasonal mean from INTEGER sums (25·Σcnt − Σwsum exact in bigint),
    # one IEEE division at the end — AVG over the float dt column would be
    # an order-dependent sum that can flake the 6-dp verify boundary
    # (ADVICE r09 #2).
    seasonal = detrended.groupBy(
        "event_type", F.hour("hour_ts").alias("hod")
    ).agg(
        (
            (F.lit(25) * F.sum("cnt") - F.sum("wsum"))
            / (F.lit(25.0) * F.count(F.lit(1)))
        ).alias("seas")
    )
    return (
        detrended.withColumn("hod", F.hour("hour_ts"))
        .join(F.broadcast(seasonal), ["event_type", "hod"])
        .select(
            "event_type",
            "hour_ts",
            "cnt",
            # + 0.0 folds IEEE −0.0 into +0.0 (both engines round a tiny
            # negative residual to the SIGNED zero; the hash sees repr())
            (F.round("trend", 6) + F.lit(0.0)).alias("trend"),
            (F.round("seas", 6) + F.lit(0.0)).alias("seasonal"),
            (F.round(F.col("dt") - F.col("seas"), 6) + F.lit(0.0)).alias(
                "residual"
            ),
        )
        .orderBy("event_type", "hour_ts")
    )


@register(
    "events_mann_kendall",
    # S from the pairwise sign sum over the day-grain series; variance
    # with the tie-group correction; z with the continuity shift
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(SUM(FLOOR(value * 100)) AS BIGINT) AS cents
        FROM events
        GROUP BY 1, 2
    ),
    s AS (
        SELECT a.event_type,
               CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
                             WHEN b.cents < a.cents THEN -1
                             ELSE 0 END) AS BIGINT) AS s_stat
        FROM daily a JOIN daily b
          ON b.event_type = a.event_type AND b.d > a.d
        GROUP BY 1
    ),
    ties AS (
        SELECT event_type,
               CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
        FROM (
            SELECT event_type, COUNT(*) AS t
            FROM daily GROUP BY event_type, cents
        ) GROUP BY 1
    ),
    n AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
        FROM daily GROUP BY 1
    )
    SELECT n.event_type, n.n_days, s.s_stat,
           ROUND((n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                  - ties.tie_term) / 18.0, 6) AS var_s,
           ROUND(CASE
               WHEN s.s_stat > 0 THEN (s.s_stat - 1)
                   / SQRT((n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                           - ties.tie_term) / 18.0)
               WHEN s.s_stat < 0 THEN (s.s_stat + 1)
                   / SQRT((n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                           - ties.tie_term) / 18.0)
               ELSE 0.0 END, 6) AS z_score
    FROM n JOIN s USING (event_type) JOIN ties USING (event_type)
    ORDER BY n.event_type
    """,
)
def events_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test on each type's daily spend
    series: S = Σ sign(xⱼ−xᵢ) over ordered day pairs, tie-corrected
    variance, continuity-corrected z.  The pairwise step runs on the
    DAY-GRAIN series — calendar-bounded (435 pairs for a 30-day month),
    so arbitrarily large raw data only widens the first rollup.  All
    accumulators are integers; the two float ops (one /18.0, one sqrt)
    are single IEEE operations."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(
        F.sum(F.floor(F.col("value") * 100))
        .cast("long")
        .alias("cents")
    )
    a, b = daily.alias("a"), daily.alias("b")
    s = (
        a.join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.d") > F.col("a.d")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(
                F.when(F.col("b.cents") > F.col("a.cents"), 1)
                .when(F.col("b.cents") < F.col("a.cents"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    ties = (
        daily.groupBy("event_type", "cents")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    n = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days")
    )
    var_expr = (
        F.col("n_days") * (F.col("n_days") - 1) * (2 * F.col("n_days") + 5)
        - F.col("tie_term")
    ) / F.lit(18.0)
    z_expr = (
        F.when(
            F.col("s_stat") > 0,
            (F.col("s_stat") - 1) / F.sqrt(var_expr),
        )
        .when(
            F.col("s_stat") < 0,
            (F.col("s_stat") + 1) / F.sqrt(var_expr),
        )
        .otherwise(F.lit(0.0))
    )
    return (
        n.join(s, "event_type")
        .join(ties, "event_type")
        .select(
            "event_type",
            "n_days",
            "s_stat",
            F.round(var_expr, 6).alias("var_s"),
            F.round(z_expr, 6).alias("z_score"),
        )
        .orderBy("event_type")
    )


@register(
    "events_wilson_ci",
    oracle=f"""
    WITH agg AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_trials,
               CAST(SUM(CASE WHEN value > {WILSON_THRESHOLD} THEN 1
                        ELSE 0 END) AS BIGINT) AS n_success
        FROM events GROUP BY 1
    )
    SELECT event_type, n_trials, n_success,
           ROUND(1.0 * n_success / n_trials, 6) AS p_hat,
           ROUND((n_success + {WILSON_Z} * {WILSON_Z} / 2.0)
                     / (n_trials + {WILSON_Z} * {WILSON_Z})
                 - {WILSON_Z} / (n_trials + {WILSON_Z} * {WILSON_Z})
                   * SQRT(1.0 * n_success * (n_trials - n_success)
                          / n_trials
                          + {WILSON_Z} * {WILSON_Z} / 4.0), 6)
               AS wilson_lo,
           ROUND((n_success + {WILSON_Z} * {WILSON_Z} / 2.0)
                     / (n_trials + {WILSON_Z} * {WILSON_Z})
                 + {WILSON_Z} / (n_trials + {WILSON_Z} * {WILSON_Z})
                   * SQRT(1.0 * n_success * (n_trials - n_success)
                          / n_trials
                          + {WILSON_Z} * {WILSON_Z} / 4.0), 6)
               AS wilson_hi
    FROM agg ORDER BY event_type
    """,
)
def events_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% Wilson score interval for each type's high-value-event rate
    (value > {WILSON_THRESHOLD}).  Unlike the normal approximation the
    Wilson bounds never leave [0,1] and stay honest at small n — the
    interval an A/B readout should print next to every proportion.
    Map-side Boolean aggregation; the interval itself is O(types)
    arithmetic on exact integer (n, k)."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_trials"),
        F.sum(
            F.when(F.col("value") > WILSON_THRESHOLD, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_success"),
    )
    z2 = WILSON_Z * WILSON_Z
    n, k = F.col("n_trials"), F.col("n_success")
    center = (k + F.lit(z2 / 2.0)) / (n + F.lit(z2))
    halfw = (
        F.lit(WILSON_Z)
        / (n + F.lit(z2))
        * F.sqrt(
            F.lit(1.0) * k * (n - k) / n + F.lit(z2 / 4.0)
        )
    )
    return agg.select(
        "event_type",
        "n_trials",
        "n_success",
        F.round(F.lit(1.0) * k / n, 6).alias("p_hat"),
        F.round(center - halfw, 6).alias("wilson_lo"),
        F.round(center + halfw, 6).alias("wilson_hi"),
    ).orderBy("event_type")


# --- Holt linear (double-exponential) smoothing ---------------------------

#: dyadic smoothing constants — exactly representable doubles, so the
#: Python loop and the SQL recursion execute identical IEEE ops
HOLT_ALPHA = 0.25
HOLT_BETA = 0.125


def holt_linear(df: DataFrame, key: str, order: str, value: str) -> DataFrame:
    """Holt's linear-trend smoothing per key: lₜ = α·xₜ + (1−α)(lₜ₋₁+bₜ₋₁),
    bₜ = β(lₜ−lₜ₋₁) + (1−β)bₜ₋₁, initialized l₁ = x₁, b₁ = 0.

    The recurrence is inherently sequential per key, so it runs as one
    Arrow-batched ``applyInPandas`` pass — O(1) state per key, one scan,
    keys distribute across the cluster (the same shape EWMA avoids only
    because its kernel truncates; Holt's doesn't).  Series length per
    key is calendar-bounded, never data-bounded."""
    import pandas as pd

    out_schema = f"{key} string, rn long, {value} long, level double, trend double"

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order).reset_index(drop=True)
        xs = pdf[value].tolist()
        levels, trends = [], []
        l = float(xs[0])
        b = 0.0
        levels.append(l)
        trends.append(b)
        for x in xs[1:]:
            l_new = HOLT_ALPHA * x + (1.0 - HOLT_ALPHA) * (l + b)
            b = HOLT_BETA * (l_new - l) + (1.0 - HOLT_BETA) * b
            l = l_new
            levels.append(l)
            trends.append(b)
        return pd.DataFrame(
            {
                key: pdf[key],
                "rn": range(1, len(xs) + 1),
                value: xs,
                "level": levels,
                "trend": trends,
            }
        )

    return df.groupBy(key).applyInPandas(fit, out_schema)


@register(
    "events_holt_linear",
    # the oracle replays the recurrence as a recursive CTE — one row per
    # (type, t); dyadic α/β keep both engines on identical IEEE ops
    oracle=f"""
    WITH RECURSIVE seq AS (
        SELECT event_type,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY h
               ) AS rn,
               cnt
        FROM (
            SELECT event_type, date_trunc('hour', ts) AS h,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1, 2
        )
    ),
    rec AS (
        SELECT event_type, rn, cnt,
               CAST(cnt AS DOUBLE) AS l, CAST(0 AS DOUBLE) AS b
        FROM seq WHERE rn = 1
        UNION ALL
        SELECT s.event_type, s.rn, s.cnt,
               {HOLT_ALPHA} * s.cnt + {1.0 - HOLT_ALPHA} * (r.l + r.b),
               {HOLT_BETA} * (({HOLT_ALPHA} * s.cnt
                               + {1.0 - HOLT_ALPHA} * (r.l + r.b)) - r.l)
                   + {1.0 - HOLT_BETA} * r.b
        FROM rec r JOIN seq s
          ON s.event_type = r.event_type AND s.rn = r.rn + 1
    )
    SELECT event_type, rn, cnt,
           ROUND(l, 6) + 0.0 AS level,
           ROUND(b, 6) + 0.0 AS trend
    FROM rec
    ORDER BY event_type, rn
    """,
)
def events_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend smoothing of each type's hourly count series —
    the level+trend state every capacity forecast starts from.  The
    engine runs the sequential recurrence per key inside one
    applyInPandas pass; the oracle replays it as a recursive CTE.  The
    hourly rollup bounds the sequential stage by calendar × types."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    smoothed = holt_linear(hourly, "event_type", "h", "cnt")
    return smoothed.select(
        "event_type",
        "rn",
        "cnt",
        (F.round("level", 6) + F.lit(0.0)).alias("level"),
        (F.round("trend", 6) + F.lit(0.0)).alias("trend"),
    ).orderBy("event_type", "rn")


# --- autocorrelation & robust trend ---------------------------------------

#: lags (hours) probed by the ACF query — the short-range + daily-cycle set
ACF_LAGS = (1, 2, 3, 6, 12, 24)


@register(
    "events_autocorrelation",
    # lag-k Pearson over the hourly count series: pair (x_t, x_{t+k}),
    # five integer sums per (type, lag), one closed-form correlation
    oracle=f"""
    WITH hourly AS (
        SELECT event_type,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY date_trunc('hour', ts)
               ) AS rn,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    lags AS (
        SELECT UNNEST(ARRAY{list(ACF_LAGS)}) AS lag
    ),
    paired AS (
        SELECT a.event_type, l.lag,
               a.cnt AS x, b.cnt AS y
        FROM hourly a
        CROSS JOIN lags l
        JOIN hourly b
          ON b.event_type = a.event_type AND b.rn = a.rn + l.lag
    )
    SELECT event_type, CAST(lag AS BIGINT) AS lag,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND((1.0 * COUNT(*) * SUM(x*y) - 1.0 * SUM(x) * SUM(y))
                 / SQRT((1.0 * COUNT(*) * SUM(x*x) - 1.0 * SUM(x) * SUM(x))
                        * (1.0 * COUNT(*) * SUM(y*y) - 1.0 * SUM(y) * SUM(y))),
                 6) + 0.0 AS acf
    FROM paired
    GROUP BY event_type, lag
    ORDER BY event_type, lag
    """,
)
def events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-k autocorrelation (Pearson form) of each type's hourly count
    series at the short-range and daily-cycle lags — the stat that says
    whether a 24 h seasonal model is even warranted.  The hourly rollup
    bounds the series by the calendar; each lag is one self-equi-join on
    (type, rn+k) over that tiny series, and all five sums per (type,
    lag) are exact integers — the one division and sqrt are single IEEE
    ops."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(
            "event_type",
            F.row_number()
            .over(Window.partitionBy("event_type").orderBy("h"))
            .alias("rn"),
            "cnt",
        )
    )
    lags = spark.createDataFrame(
        [(k,) for k in ACF_LAGS], "lag int"
    )
    a = hourly.select(
        "event_type", "rn", F.col("cnt").alias("x")
    ).crossJoin(F.broadcast(lags))
    b = hourly.select(
        F.col("event_type").alias("bt"),
        F.col("rn").alias("brn"),
        F.col("cnt").alias("y"),
    )
    paired = a.join(
        b,
        (F.col("bt") == F.col("event_type"))
        & (F.col("brn") == F.col("rn") + F.col("lag")),
    )
    cnt = F.count(F.lit(1))
    num = F.lit(1.0) * cnt * F.sum(F.col("x") * F.col("y")) - F.lit(
        1.0
    ) * F.sum("x") * F.sum("y")
    den = F.sqrt(
        (F.lit(1.0) * cnt * F.sum(F.col("x") * F.col("x"))
         - F.lit(1.0) * F.sum("x") * F.sum("x"))
        * (F.lit(1.0) * cnt * F.sum(F.col("y") * F.col("y"))
           - F.lit(1.0) * F.sum("y") * F.sum("y"))
    )
    return (
        paired.groupBy("event_type", "lag")
        .agg(
            cnt.cast("long").alias("n_pairs"),
            (F.round(num / den, 6) + F.lit(0.0)).alias("acf"),
        )
        .select(
            "event_type",
            F.col("lag").cast("long").alias("lag"),
            "n_pairs",
            "acf",
        )
        .orderBy("event_type", "lag")
    )


@register(
    "events_theilsen_slope",
    # median of all pairwise slopes over the day-grain series; equal
    # rationals land on identical doubles (IEEE division is correctly
    # rounded), so the value-ordered median is engine-independent
    oracle="""
    WITH daily AS (
        SELECT event_type,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY CAST(ts AS DATE)
               ) AS di,
               CAST(SUM(FLOOR(value * 100)) AS BIGINT) AS cents
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    slopes AS (
        SELECT a.event_type,
               (1.0 * (b.cents - a.cents)) / (b.di - a.di) AS slope,
               ROW_NUMBER() OVER (
                   PARTITION BY a.event_type
                   ORDER BY (1.0 * (b.cents - a.cents)) / (b.di - a.di)
               ) AS rk,
               COUNT(*) OVER (PARTITION BY a.event_type) AS np
        FROM daily a JOIN daily b
          ON b.event_type = a.event_type AND b.di > a.di
    )
    SELECT event_type,
           CAST(MAX(np) AS BIGINT) AS n_pairs,
           ROUND(AVG(slope), 6) + 0.0 AS theil_sen_slope
    FROM slopes
    WHERE rk * 2 = np OR rk * 2 = np + 1 OR rk * 2 = np + 2
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_theilsen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of each type's daily spend: the median of
    all pairwise slopes — immune to the outlier days that wreck OLS.
    Pairwise over the DAY-GRAIN series (calendar-bounded, like the
    Mann-Kendall test: 435 pairs per type-month, regardless of raw data
    size).  Median = mean of the middle rank(s); pairwise slopes from
    exact integer cents land equal rationals on identical doubles, so
    rank order is engine-independent."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(
            F.sum(F.floor(F.col("value") * 100))
            .cast("long")
            .alias("cents")
        )
        .select(
            "event_type",
            F.row_number()
            .over(Window.partitionBy("event_type").orderBy("d"))
            .alias("di"),
            "cents",
        )
    )
    a = daily.select(
        "event_type", F.col("di").alias("ai"), F.col("cents").alias("ac")
    )
    b = daily.select(
        F.col("event_type").alias("bt"),
        F.col("di").alias("bi"),
        F.col("cents").alias("bc"),
    )
    slopes = (
        a.join(
            b,
            (F.col("bt") == F.col("event_type"))
            & (F.col("bi") > F.col("ai")),
        )
        .select(
            "event_type",
            (
                F.lit(1.0) * (F.col("bc") - F.col("ac"))
                / (F.col("bi") - F.col("ai"))
            ).alias("slope"),
        )
        .select(
            "event_type",
            "slope",
            F.row_number()
            .over(Window.partitionBy("event_type").orderBy("slope"))
            .alias("rk"),
            F.count(F.lit(1))
            .over(Window.partitionBy("event_type"))
            .alias("np"),
        )
    )
    mid = (
        (F.col("rk") * 2 == F.col("np"))
        | (F.col("rk") * 2 == F.col("np") + 1)
        | (F.col("rk") * 2 == F.col("np") + 2)
    )
    return (
        slopes.where(mid)
        .groupBy("event_type")
        .agg(
            F.max("np").cast("long").alias("n_pairs"),
            (F.round(F.avg("slope"), 6) + F.lit(0.0)).alias(
                "theil_sen_slope"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "events_kendall_tau",
    # tau-b between daily spend and daily volume from pairwise sign
    # counts over the day-grain series — all integer until the final sqrt
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(SUM(FLOOR(value * 100)) AS BIGINT) AS cents,
               CAST(COUNT(*) AS BIGINT) AS vol
        FROM events GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.event_type,
               CAST(SUM(CASE WHEN (b.cents - a.cents) * (b.vol - a.vol) > 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS c_pairs,
               CAST(SUM(CASE WHEN (b.cents - a.cents) * (b.vol - a.vol) < 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS d_pairs,
               CAST(SUM(CASE WHEN b.cents = a.cents
                        THEN 1 ELSE 0 END) AS BIGINT) AS tx,
               CAST(SUM(CASE WHEN b.vol = a.vol
                        THEN 1 ELSE 0 END) AS BIGINT) AS ty,
               CAST(COUNT(*) AS BIGINT) AS n0
        FROM daily a JOIN daily b
          ON b.event_type = a.event_type AND b.d > a.d
        GROUP BY 1
    )
    SELECT event_type, c_pairs, d_pairs,
           ROUND((c_pairs - d_pairs)
                 / SQRT(1.0 * (n0 - tx) * (n0 - ty)), 6) AS tau_b
    FROM pairs
    ORDER BY event_type
    """,
)
def events_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank association between each type's daily spend
    and daily volume — the outlier-immune answer to "do busy days make
    money?".  Pairwise over the DAY-GRAIN series (calendar-bounded like
    Mann-Kendall/Theil-Sen); concordant/discordant/tie counts are exact
    integers, the denominator is one sqrt.  Tie counts come straight
    off the pairwise form (tx = pairs tied on x, whether or not tied on
    y) — exactly the textbook n₁/n₂ without per-group tie factorials."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(
        F.sum(F.floor(F.col("value") * 100)).cast("long").alias("cents"),
        F.count(F.lit(1)).cast("long").alias("vol"),
    )
    a = daily.select(
        "event_type",
        F.col("d").alias("ad"),
        F.col("cents").alias("ac"),
        F.col("vol").alias("av"),
    )
    b = daily.select(
        F.col("event_type").alias("bt"),
        F.col("d").alias("bd"),
        F.col("cents").alias("bc"),
        F.col("vol").alias("bv"),
    )
    prod = (F.col("bc") - F.col("ac")) * (F.col("bv") - F.col("av"))
    pairs = (
        a.join(
            b,
            (F.col("bt") == F.col("event_type"))
            & (F.col("bd") > F.col("ad")),
        )
        .groupBy("event_type")
        .agg(
            F.sum(F.when(prod > 0, 1).otherwise(0))
            .cast("long")
            .alias("c_pairs"),
            F.sum(F.when(prod < 0, 1).otherwise(0))
            .cast("long")
            .alias("d_pairs"),
            F.sum(F.when(F.col("bc") == F.col("ac"), 1).otherwise(0))
            .cast("long")
            .alias("tx"),
            F.sum(F.when(F.col("bv") == F.col("av"), 1).otherwise(0))
            .cast("long")
            .alias("ty"),
            F.count(F.lit(1)).cast("long").alias("n0"),
        )
    )
    return pairs.select(
        "event_type",
        "c_pairs",
        "d_pairs",
        F.round(
            (F.col("c_pairs") - F.col("d_pairs"))
            / F.sqrt(
                F.lit(1.0)
                * (F.col("n0") - F.col("tx"))
                * (F.col("n0") - F.col("ty"))
            ),
            6,
        ).alias("tau_b"),
    ).orderBy("event_type")


@register(
    "events_runs_test",
    # Wald–Wolfowitz runs test on the above/below-median daily sequence:
    # exact median via rank selection, runs via one LAG, z from integer
    # counts — engine-identical to the last bit before the final sqrt
    oracle="""
    WITH daily AS (
        SELECT event_type,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY CAST(ts AS DATE)
               ) AS di,
               CAST(SUM(FLOOR(value * 100)) AS BIGINT) AS cents
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    med AS (
        SELECT event_type, MIN(cents) AS median_cents
        FROM (
            SELECT event_type, cents,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY cents, di) AS rk,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM daily
        )
        WHERE 2 * rk >= n + 1
        GROUP BY event_type
    ),
    signed AS (
        SELECT d.event_type, d.di,
               CAST(d.cents > m.median_cents AS INT) AS above
        FROM daily d JOIN med m ON m.event_type = d.event_type
        WHERE d.cents <> m.median_cents
    ),
    runs AS (
        SELECT event_type,
               CAST(SUM(above) AS BIGINT) AS n1,
               CAST(SUM(1 - above) AS BIGINT) AS n2,
               CAST(1 + SUM(CASE WHEN prev IS NOT NULL
                                  AND prev <> above THEN 1 ELSE 0 END)
                    AS BIGINT) AS r_runs
        FROM (
            SELECT event_type, above,
                   LAG(above) OVER (PARTITION BY event_type
                                    ORDER BY di) AS prev
            FROM signed
        )
        GROUP BY event_type
    )
    SELECT event_type, n1, n2, r_runs,
           ROUND((r_runs - (2.0 * n1 * n2 / (n1 + n2) + 1.0))
                 / SQRT(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / ((1.0 * (n1 + n2)) * (n1 + n2) * (n1 + n2 - 1))),
                 6) AS z_score
    FROM runs
    ORDER BY event_type
    """,
)
def events_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test: is each type's daily-spend sequence
    random, or does it streak?  Days at the exact median drop (the
    standard treatment), the above/below sequence's run count comes from
    one LAG window, and the z-score is closed-form integer arithmetic
    with one sqrt.  Day-grain everything — the raw fact only feeds the
    first rollup."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(
        F.sum(F.floor(F.col("value") * 100)).cast("long").alias("cents")
    ).select(
        "event_type",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("d"))
        .alias("di"),
        "cents",
    )
    ranked = daily.select(
        "event_type",
        "di",
        "cents",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("cents", "di"))
        .alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .alias("n"),
    )
    med = (
        ranked.where(2 * F.col("rk") >= F.col("n") + 1)
        .groupBy("event_type")
        .agg(F.min("cents").alias("median_cents"))
    )
    signed = (
        daily.join(F.broadcast(med), "event_type")
        .where(F.col("cents") != F.col("median_cents"))
        .select(
            "event_type",
            "di",
            (F.col("cents") > F.col("median_cents")).cast("int").alias(
                "above"
            ),
        )
    )
    w = Window.partitionBy("event_type").orderBy("di")
    runs = (
        signed.withColumn("prev", F.lag("above").over(w))
        .groupBy("event_type")
        .agg(
            F.sum("above").cast("long").alias("n1"),
            F.sum(1 - F.col("above")).cast("long").alias("n2"),
            (
                F.lit(1)
                + F.sum(
                    F.when(
                        F.col("prev").isNotNull()
                        & (F.col("prev") != F.col("above")),
                        1,
                    ).otherwise(0)
                )
            )
            .cast("long")
            .alias("r_runs"),
        )
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r_runs")
    mu = F.lit(2.0) * n1 * n2 / (n1 + n2) + F.lit(1.0)
    var = (
        F.lit(2.0) * n1 * n2 * (F.lit(2.0) * n1 * n2 - n1 - n2)
        / ((F.lit(1.0) * (n1 + n2)) * (n1 + n2) * (n1 + n2 - 1))
    )
    return runs.select(
        "event_type",
        "n1",
        "n2",
        "r_runs",
        F.round((r - mu) / F.sqrt(var), 6).alias("z_score"),
    ).orderBy("event_type")


@register(
    "events_spearman_stability",
    # Spearman rho between each user's spend RANK in the two corpus
    # halves: row_number ranks are tie-free, so the classic
    # 1 − 6·Σd²/(n(n²−1)) closed form is exact integer arithmetic
    oracle="""
    WITH bounds AS (
        SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
        FROM events
    ),
    mid AS (
        SELECT d0 + CAST(DATE_DIFF('day', d0, d1) // 2 AS INT)
                    * INTERVAL 1 DAY AS m
        FROM bounds
    ),
    spend AS (
        SELECT user_id,
               CAST(CAST(ts AS DATE) >= (SELECT m FROM mid) AS INT) AS half,
               CAST(SUM(FLOOR(value * 100)) AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ),
    both_halves AS (
        SELECT a.user_id, a.cents AS ca, b.cents AS cb
        FROM (SELECT * FROM spend WHERE half = 0) a
        JOIN (SELECT * FROM spend WHERE half = 1) b
          ON b.user_id = a.user_id
    ),
    ranked AS (
        SELECT user_id,
               ROW_NUMBER() OVER (ORDER BY ca, user_id) AS ra,
               ROW_NUMBER() OVER (ORDER BY cb, user_id) AS rb
        FROM both_halves
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM((ra - rb) * (ra - rb)) AS BIGINT) AS sum_d2,
           ROUND(1.0 - 6.0 * SUM((ra - rb) * (ra - rb))
                 / (COUNT(*) * (1.0 * COUNT(*) * COUNT(*) - 1)), 6)
               AS spearman_rho
    FROM ranked
    """,
)
def events_spearman_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank stability of per-user spend between the two corpus
    halves — "do the same users stay the big spenders?", the rank
    counterpart of the segment-migration matrix and the third rank
    statistic in the battery (Pearson-form ACF, Kendall tau-b, Spearman
    rho).  row_number ranks (tie-broken by user) make Σd² exact, so the
    closed form is one integer aggregate + one division; the user-grain
    rollup bounds everything (the documented dimension-sort exception
    applies to the two rank windows)."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    spend = (
        ev.crossJoin(F.broadcast(bounds))
        .withColumn(
            "m",
            F.date_add(
                F.col("d0"),
                F.expr("datediff(d1, d0) div 2").cast("int"),
            ),
        )
        .groupBy(
            "user_id",
            (F.col("ts").cast("date") >= F.col("m")).cast("int").alias(
                "half"
            ),
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100))
            .cast("long")
            .alias("cents")
        )
    )
    a = spend.where(F.col("half") == 0).select(
        "user_id", F.col("cents").alias("ca")
    )
    b = spend.where(F.col("half") == 1).select(
        F.col("user_id").alias("ub"), F.col("cents").alias("cb")
    )
    both = a.join(b, a.user_id == b.ub).select("user_id", "ca", "cb")
    # O(users) group table feeds the two global rank passes — asserted
    # in-plan (VERDICT r10 task 3).
    from ..operators.guards import bounded_window_guard

    both = bounded_window_guard(both, "events_spearman_stability")
    ranked = both.select(
        F.row_number().over(Window.orderBy("ca", "user_id")).alias("ra"),
        F.row_number().over(Window.orderBy("cb", "user_id")).alias("rb"),
    )
    d2 = (F.col("ra") - F.col("rb")) * (F.col("ra") - F.col("rb"))
    n = F.count(F.lit(1))
    return ranked.agg(
        n.cast("long").alias("n_users"),
        F.sum(d2).cast("long").alias("sum_d2"),
        F.round(
            F.lit(1.0)
            - F.lit(6.0) * F.sum(d2)
            / (n * (F.lit(1.0) * n * n - 1)),
            6,
        ).alias("spearman_rho"),
    )


@register(
    "events_peak_hour_circular",
    # circular statistics over the 24 hour-of-day buckets: exact integer
    # counts × 24 fixed trig constants, resultant + atan2 at the end
    oracle="""
    WITH hod AS (
        SELECT event_type, EXTRACT(hour FROM ts) AS h,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    sums AS (
        SELECT event_type,
               CAST(SUM(c) AS BIGINT) AS n,
               SUM(c * COS(2 * PI() * h / 24.0)) AS cx,
               SUM(c * SIN(2 * PI() * h / 24.0)) AS sy
        FROM hod GROUP BY event_type
    )
    SELECT event_type, n,
           ROUND(SQRT(cx * cx + sy * sy) / n, 6) AS resultant_r,
           ROUND(MOD(DEGREES(ATAN2(sy, cx)) / 15.0 + 24.0, 24.0), 4)
               AS mean_hour
    FROM sums
    ORDER BY event_type
    """,
)
def events_peak_hour_circular(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Circular statistics of WHEN each type happens: the hour-of-day
    distribution's mean direction (peak hour on the 24 h clock — immune
    to the midnight wrap that wrecks a plain average) and resultant
    length R (0 = uniform around the clock, 1 = a single spike).  The
    raw fact collapses to 24 integer buckets per type first, so the
    trig runs over ≤24 fixed constants per group; rounding sits far
    above the ulp noise of the 24-term float sums."""
    ev = load_table(spark, sf_dir, "events")
    hod = ev.groupBy(
        "event_type", F.hour("ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    theta = F.lit(2.0) * F.lit(math.pi) * F.col("h") / F.lit(24.0)
    sums = hod.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c") * F.cos(theta)).alias("cx"),
        F.sum(F.col("c") * F.sin(theta)).alias("sy"),
    )
    return sums.select(
        "event_type",
        "n",
        F.round(
            F.sqrt(F.col("cx") * F.col("cx") + F.col("sy") * F.col("sy"))
            / F.col("n"),
            6,
        ).alias("resultant_r"),
        F.round(
            (
                F.degrees(F.atan2(F.col("sy"), F.col("cx"))) / F.lit(15.0)
                + F.lit(24.0)
            )
            % F.lit(24.0),
            4,
        ).alias("mean_hour"),
    ).orderBy("event_type")


@register(
    "orders_backlog_timeseries",
    # Daily open-order ledger: +1 on order day, -1 on completion day
    # (last lineitem shipdate); backlog = running net.  Orders with no
    # lineitems never complete and stay in the backlog (the fixture has
    # some - orders_without_lineitems - so the tail plateau is real).
    oracle="""
    WITH opens AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS opened
        FROM orders GROUP BY 1
    ),
    closes AS (
        SELECT d, CAST(COUNT(*) AS BIGINT) AS closed FROM (
            SELECT l_orderkey, CAST(MAX(l_shipdate) AS DATE) AS d
            FROM lineitem GROUP BY l_orderkey
        ) GROUP BY d
    ),
    days AS (
        SELECT COALESCE(o.d, c.d) AS d,
               COALESCE(opened, 0) AS opened,
               COALESCE(closed, 0) AS closed
        FROM opens o FULL OUTER JOIN closes c ON o.d = c.d
    )
    SELECT CAST(d AS TIMESTAMP) AS day, opened, closed,
           CAST(SUM(opened - closed) OVER (ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS backlog
    FROM days ORDER BY day
    """,
)
def orders_backlog_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog by day: orders enter the backlog on their
    order date and leave when their LAST lineitem ships — the operations
    time series behind fulfilment staffing ("how deep is the queue and
    is it draining?").

    Plan: two fact rollups (orders by day; lineitem max-shipdate per
    order, then by day) meet in an O(days) full-outer join, and the
    running net is the documented O(days) global window, guard-asserted.
    No event-grain data crosses the final window."""
    from ..operators.guards import bounded_window_guard

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    opens = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).alias("opened"))
    closes = (
        li.groupBy("l_orderkey")
        .agg(F.max("l_shipdate").cast("date").alias("d"))
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("closed"))
    )
    days = (
        opens.join(closes, "d", "full")
        .select(
            "d",
            F.coalesce("opened", F.lit(0)).alias("opened"),
            F.coalesce("closed", F.lit(0)).alias("closed"),
        )
    )
    days = bounded_window_guard(days, "orders_backlog_timeseries")
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return (
        days.select(
            F.col("d").cast("timestamp").alias("day"),
            "opened",
            "closed",
            F.sum(F.col("opened") - F.col("closed")).over(w).alias("backlog"),
        )
        .orderBy("day")
    )
