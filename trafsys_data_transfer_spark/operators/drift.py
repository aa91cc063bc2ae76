"""Data-drift and change-point detection over the fixture tables.

Two monitoring operators a production pipeline runs beside the ETL the
reference implements (script.js moves counts; nothing watches them):

* **Distribution drift** — compare the value distribution of two periods
  bin-by-bin.  The statistic is a chi-square-style divergence computed in
  EXACT integer ppm arithmetic (``(a_ppm − b_ppm)² div (a_ppm + b_ppm)``)
  — no logarithms, so the output hash-checks across engines, unlike PSI
  whose ``ln`` would differ in the last ulp.
* **CUSUM change-point detection** — the one-sided cumulative-sum control
  chart ``s_t = max(0, s_{t−1} + (x_t − μ))`` per series.  The recurrence
  is inherently sequential per key, so it runs as an exact integer fold
  (scaled by the series length H so the mean never becomes a float)
  inside ``F.aggregate`` over the per-key sorted series — JVM-side, no
  Python.  The DuckDB oracle is a recursive CTE stepping the same
  recurrence (the `dedup_components` precedent).

Scale notes (100 TB posture):
* Drift is two narrow aggregations over the fact table (one shuffle on
  the O(bins) grain after map-side partials) plus an O(bins) join.
* CUSUM collects ONE bounded series per key (hours of a fixed window —
  here 30 days ≈ 720 points; never the raw events).  The per-key fold is
  O(H) with an O(flags) result.  Keys process in parallel; the pattern
  holds for millions of series as long as each series is
  window-bounded — the same contract as `traffic_resample_ffill`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.fixtures import load_table

#: Drift: fixed price-bin width and the per-bin ppm-share delta that
#: flags a bin as drifted (2 percentage points).
BIN_WIDTH = 50_000
DRIFT_FLAG_PPM = 20_000
#: Orders before this date are period A, on/after are period B.
PIVOT_DATE = "1998-01-01"

#: CUSUM control limit in estimated-sigma units: flag when the reflected
#: cumulative excess exceeds C·σ̂·√H-equivalents (compared exactly as
#: s² > C²·tot·H — no floats in the comparison).
CUSUM_SIGMA_LIMIT_SQ = 25


@register(
    "orders_drift_chi2",
    oracle=f"""
    WITH binned AS (
        SELECT CAST(FLOOR(o_totalprice / {BIN_WIDTH}) AS BIGINT) AS price_bin,
               COUNT(*) FILTER (WHERE o_orderdate <  DATE '{PIVOT_DATE}') AS n_a,
               COUNT(*) FILTER (WHERE o_orderdate >= DATE '{PIVOT_DATE}') AS n_b
        FROM orders GROUP BY 1
    ),
    tot AS (SELECT SUM(n_a) AS tot_a, SUM(n_b) AS tot_b FROM binned),
    shares AS (
        SELECT price_bin, n_a, n_b,
               n_a * 1000000 // tot_a AS a_ppm,
               n_b * 1000000 // tot_b AS b_ppm
        FROM binned, tot
    )
    SELECT price_bin,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(a_ppm AS BIGINT) AS a_ppm, CAST(b_ppm AS BIGINT) AS b_ppm,
           CAST(CASE WHEN a_ppm + b_ppm > 0
                     THEN (a_ppm - b_ppm) * (a_ppm - b_ppm) // (a_ppm + b_ppm)
                     ELSE 0 END AS BIGINT) AS chi2_contrib_ppm,
           ABS(a_ppm - b_ppm) > {DRIFT_FLAG_PPM} AS drifted
    FROM shares
    ORDER BY price_bin
    """,
)
def orders_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between two order periods: per fixed price bin,
    both periods' counts and ppm shares, the exact-integer chi-square
    contribution, and a drift flag on |Δshare| > 2 pp.

    Scale: one conditional aggregation produces both periods' histograms
    in a single fact-table pass (no second scan, no join of two rollups);
    the totals join is a 1-row broadcast.
    """
    orders = load_table(spark, sf_dir, "orders")
    pivot = F.lit(PIVOT_DATE).cast("timestamp")
    binned = orders.groupBy(
        F.floor(F.col("o_totalprice") / BIN_WIDTH).alias("price_bin")
    ).agg(
        F.count(F.when(F.col("o_orderdate") < pivot, 1)).alias("n_a"),
        F.count(F.when(F.col("o_orderdate") >= pivot, 1)).alias("n_b"),
    )
    tot = binned.agg(
        F.sum("n_a").alias("tot_a"), F.sum("n_b").alias("tot_b")
    )
    shares = binned.join(F.broadcast(tot)).select(
        "price_bin",
        "n_a",
        "n_b",
        F.expr("n_a * 1000000 div tot_a").alias("a_ppm"),
        F.expr("n_b * 1000000 div tot_b").alias("b_ppm"),
    )
    return shares.select(
        "price_bin",
        "n_a",
        "n_b",
        "a_ppm",
        "b_ppm",
        F.expr(
            "CASE WHEN a_ppm + b_ppm > 0"
            "     THEN (a_ppm - b_ppm) * (a_ppm - b_ppm) div (a_ppm + b_ppm)"
            "     ELSE CAST(0 AS BIGINT) END"
        ).alias("chi2_contrib_ppm"),
        (F.abs(F.col("a_ppm") - F.col("b_ppm")) > DRIFT_FLAG_PPM).alias(
            "drifted"
        ),
    ).orderBy("price_bin")


@register(
    "events_cusum_changepoints",
    oracle=f"""
    WITH RECURSIVE hourly AS (
        SELECT event_type, CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS h,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hourly),
    spine AS (
        SELECT t.event_type, gs.h
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (SELECT UNNEST(generate_series(h0, h1)) AS h FROM bounds) gs
    ),
    x AS (
        SELECT s.event_type, s.h, COALESCE(hourly.n, 0) AS n,
               ROW_NUMBER() OVER (PARTITION BY s.event_type ORDER BY s.h) - 1
                   AS i
        FROM spine s LEFT JOIN hourly USING (event_type, h)
    ),
    stats AS (
        SELECT event_type, SUM(n) AS tot, COUNT(*) AS big_h,
               CAST(FLOOR(SQRT(CAST(SUM(n) * COUNT(*) AS DOUBLE)) / 2)
                    AS BIGINT) AS k
        FROM x GROUP BY 1
    ),
    rec AS (
        SELECT x.event_type, x.i, x.h,
               GREATEST(0, st.big_h * x.n - st.tot - st.k) AS s
        FROM x JOIN stats st USING (event_type) WHERE x.i = 0
        UNION ALL
        SELECT x.event_type, x.i, x.h,
               GREATEST(0, r.s + st.big_h * x.n - st.tot - st.k) AS s
        FROM rec r
        JOIN x ON x.event_type = r.event_type AND x.i = r.i + 1
        JOIN stats st ON st.event_type = x.event_type
    )
    SELECT r.event_type, r.h AS epoch_hour, CAST(r.s AS BIGINT) AS cusum_scaled
    FROM rec r JOIN stats st USING (event_type)
    WHERE r.s * r.s > {CUSUM_SIGMA_LIMIT_SQ} * st.tot * st.big_h
    ORDER BY event_type, epoch_hour
    """,
)
def events_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM control chart per event type over the hourly count
    series (zero-filled spine): flags hours where the reflected cumulative
    excess over the series mean crosses the threshold.

    All arithmetic is integer, scaled by the series length H so the mean
    ``tot/H`` never floats: ``s_t = max(0, s_{{t-1}} + H·x_t − tot)``,
    flagged when ``s_t > H·threshold``.  The sequential recurrence runs as
    one ``F.aggregate`` fold per key over the sorted bounded series —
    exactly the shape that cannot be a window function (the reflection at
    0 breaks prefix-sum decomposition).
    """
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type",
        F.expr("CAST(unix_timestamp(ts) div 3600 AS BIGINT)").alias("h"),
    ).agg(F.count(F.lit(1)).alias("n"))
    bounds = hourly.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    types = events.select("event_type").distinct()
    spine = types.join(F.broadcast(bounds)).select(
        "event_type", F.explode(F.sequence("h0", "h1")).alias("h")
    )
    x = spine.join(hourly, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce("n", F.lit(0)).cast("bigint").alias("n")
    )
    per_type = x.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("h", "n"))).alias("xs"),
        F.sum("n").alias("tot"),
        F.count(F.lit(1)).alias("big_h"),
    ).withColumn(
        # 0.5·σ̂ slack allowance, scaled by H: σ̂·H = √(tot·H) under the
        # Poisson noise model.  IEEE sqrt is correctly rounded, so the
        # floor is engine-identical.
        "k",
        F.expr(
            "CAST(FLOOR(SQRT(CAST(tot * big_h AS DOUBLE)) / 2) AS BIGINT)"
        ),
    )
    # Exact integer fold: accumulator = (running s, flagged rows so far).
    folded = per_type.select(
        "event_type",
        F.expr(
            f"""
            aggregate(
              xs,
              struct(CAST(0 AS BIGINT) AS s,
                     CAST(array() AS ARRAY<STRUCT<h: BIGINT, s: BIGINT>>)
                         AS out),
              (acc, e) -> struct(
                greatest(CAST(0 AS BIGINT),
                         acc.s + big_h * e.n - tot - k) AS s,
                CASE WHEN power_check.flagged
                     THEN array_append(
                         acc.out,
                         struct(e.h AS h, power_check.s AS s))
                     ELSE acc.out END),
              acc -> acc.out
            )
            """.replace(
                "power_check.flagged",
                f"greatest(CAST(0 AS BIGINT), acc.s + big_h * e.n - tot - k)"
                f" * greatest(CAST(0 AS BIGINT), acc.s + big_h * e.n - tot - k)"
                f" > {CUSUM_SIGMA_LIMIT_SQ} * tot * big_h",
            ).replace(
                "power_check.s",
                "greatest(CAST(0 AS BIGINT), acc.s + big_h * e.n - tot - k)",
            )
        ).alias("flags"),
    )
    return (
        folded.select("event_type", F.explode("flags").alias("f"))
        .select(
            "event_type",
            F.col("f.h").alias("epoch_hour"),
            F.col("f.s").alias("cusum_scaled"),
        )
        .orderBy("event_type", "epoch_hour")
    )
