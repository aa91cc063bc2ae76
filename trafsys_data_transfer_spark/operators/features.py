"""Feature-store materialization: the per-entity snapshot build.

The ML-platform shape behind churn/LTV/ranking models: one scheduled job
folds raw events into a per-user feature vector (recency, frequency,
monetary, activity breadth, trend), written as the feature-store
snapshot that training joins point-in-time against (the PIT join itself
is ``events_scd2_pit_join``; this is the batch-materialization half).

Exactness: every feature is either an integer count/date-diff or an
exact integer moment pair; the activity-trend slope over daily counts is
emitted as the ``(n·Sxy − Sx·Sy, n·Sxx − Sx²)`` integer pair plus a
6-dp quotient — the abtest.py CUPED discipline.

Scale shape: one (user, day) pre-aggregation, then one user-keyed fold —
both map-side combinable; the corpus-wide time anchor is a broadcast
1-row aggregate.  Output is O(users), the snapshot a feature store
actually stores.

The reference (/root/reference/script.js) has no feature engineering;
this extends the mandated pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.fixtures import load_table

#: Cap on users materialized in the registered query (keeps the oracle
#: comparison small; the build itself is unbounded).
SNAPSHOT_MAX_USERS = 200


def user_feature_snapshot(events: DataFrame) -> DataFrame:
    """Per-user feature vector: counts, monetary, recency, breadth, and
    the daily-activity trend slope as an exact integer moment pair."""
    anchor = events.agg(
        F.max(F.to_date("ts")).alias("anchor_day"),
        F.min(F.to_date("ts")).alias("epoch_day"),
    )
    daily = (
        events.crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            "event_type",
            F.floor(F.col("value") * 1000000.0 + F.lit(0.5))
            .cast("long")
            .alias("v_micro"),
            F.datediff(F.to_date("ts"), F.col("epoch_day"))
            .cast("long")
            .alias("day_idx"),
            F.datediff(F.col("anchor_day"), F.to_date("ts"))
            .cast("long")
            .alias("age_days"),
        )
    )
    per_day = daily.groupBy("user_id", "day_idx").agg(
        F.count(F.lit(1)).alias("d_n"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("v_micro")).otherwise(0)
        ).alias("d_monetary"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("d_purchases"),
        F.min("age_days").alias("d_age"),
    )
    breadth = daily.groupBy("user_id").agg(
        F.countDistinct("event_type").alias("n_event_types")
    )
    folded = per_day.groupBy("user_id").agg(
        F.sum("d_n").alias("n_events"),
        F.sum("d_purchases").alias("n_purchases"),
        F.sum("d_monetary").alias("monetary_micro"),
        F.min("d_age").alias("recency_days"),
        F.count(F.lit(1)).alias("active_days"),
        F.count(F.lit(1)).alias("sn"),
        F.sum("day_idx").alias("sx"),
        F.sum("d_n").alias("sy"),
        F.sum(F.col("day_idx") * F.col("d_n")).alias("sxy"),
        F.sum(F.col("day_idx") * F.col("day_idx")).alias("sxx"),
    )
    return (
        folded.join(breadth, "user_id")
        .select(
            "user_id",
            "n_events",
            "n_purchases",
            "monetary_micro",
            "recency_days",
            "active_days",
            "n_event_types",
            (F.col("sn") * F.col("sxy") - F.col("sx") * F.col("sy")).alias(
                "slope_num"
            ),
            (F.col("sn") * F.col("sxx") - F.col("sx") * F.col("sx")).alias(
                "slope_den"
            ),
        )
        .withColumn(
            "trend_slope",
            F.when(
                F.col("slope_den") > 0,
                F.round(F.col("slope_num") / F.col("slope_den"), 6),
            ).otherwise(F.lit(0.0)),
        )
        .orderBy("user_id")
    )


_SNAPSHOT_ORACLE = f"""
WITH base AS (
    SELECT * FROM events WHERE user_id < {SNAPSHOT_MAX_USERS}
),
anchor AS (
    -- anchored on the SAME filtered relation the Spark side folds
    SELECT MAX(CAST(ts AS DATE)) AS anchor_day,
           MIN(CAST(ts AS DATE)) AS epoch_day
    FROM base
),
daily AS (
    SELECT user_id, event_type,
           CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS v_micro,
           CAST(CAST(ts AS DATE) - epoch_day AS BIGINT) AS day_idx,
           CAST(anchor_day - CAST(ts AS DATE) AS BIGINT) AS age_days
    FROM base CROSS JOIN anchor
),
per_day AS (
    SELECT user_id, day_idx,
           CAST(COUNT(*) AS BIGINT) AS d_n,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                    THEN v_micro ELSE 0 END) AS BIGINT) AS d_monetary,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                    THEN 1 ELSE 0 END) AS BIGINT) AS d_purchases,
           MIN(age_days) AS d_age
    FROM daily GROUP BY user_id, day_idx
),
breadth AS (
    SELECT user_id, CAST(COUNT(DISTINCT event_type) AS BIGINT)
               AS n_event_types
    FROM daily GROUP BY user_id
),
folded AS (
    SELECT user_id,
           CAST(SUM(d_n) AS BIGINT) AS n_events,
           CAST(SUM(d_purchases) AS BIGINT) AS n_purchases,
           CAST(SUM(d_monetary) AS BIGINT) AS monetary_micro,
           CAST(MIN(d_age) AS BIGINT) AS recency_days,
           CAST(COUNT(*) AS BIGINT) AS active_days,
           CAST(COUNT(*) AS BIGINT) AS sn,
           CAST(SUM(day_idx) AS BIGINT) AS sx,
           CAST(SUM(d_n) AS BIGINT) AS sy,
           CAST(SUM(day_idx * d_n) AS BIGINT) AS sxy,
           CAST(SUM(day_idx * day_idx) AS BIGINT) AS sxx
    FROM per_day GROUP BY user_id
)
SELECT f.user_id, n_events, n_purchases, monetary_micro, recency_days,
       active_days, n_event_types,
       CAST(sn * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(sn * sxx - sx * sx AS BIGINT) AS slope_den,
       CASE WHEN sn * sxx - sx * sx > 0
            THEN ROUND(CAST(sn * sxy - sx * sy AS DOUBLE)
                       / (sn * sxx - sx * sx), 6)
            ELSE 0.0 END AS trend_slope
FROM folded f JOIN breadth b ON f.user_id = b.user_id
ORDER BY f.user_id
"""


@register("features_user_snapshot", oracle=_SNAPSHOT_ORACLE)
def features_user_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store snapshot for users < 200 (bounded oracle compare)."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") < SNAPSHOT_MAX_USERS
    )
    return user_feature_snapshot(events)
