"""Range join — points matched to containing time intervals, per key.

Spark plans a raw ``ON p.k = i.k AND p.ts >= i.start AND p.ts < i.end`` as
an equi-join on ``k`` with the range as a post-join filter — correct, but a
hot key degenerates to that key's |points|×|intervals| cross product.  The
scale shape is **bucketed range join**: quantise time into fixed-width
buckets, explode each interval over the buckets it covers, equi-join on
(key, bucket), then apply the exact containment predicate.  Each point owns
exactly one bucket, so no post-join dedup is needed; the cross product is
bounded per (key, bucket) cell instead of per key.

Bucket width tunes fan-out vs cell size: ~the typical interval length keeps
the explode factor ≤2 while splitting hot keys by time.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.fixtures import load_table


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point to every interval (same key) containing it:
    ``start <= ts < end``.  Returns point columns + interval columns."""
    on = list(on)
    b = F.lit(bucket_seconds).cast("long")

    def epoch(c):  # TIMESTAMP_NTZ has no direct long cast; go via UTC ts
        return F.col(c).cast("timestamp").cast("long")

    pts = points.withColumn("__bucket", (epoch(point_ts) / b).cast("long"))
    ivl = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (epoch(start_col) / b).cast("long"),
                (epoch(end_col) / b).cast("long"),
            )
        ),
    )
    return (
        pts.join(ivl, on + ["__bucket"], how)
        .filter(
            (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col))
        )
        .drop("__bucket")
    )


@register(
    "events_range_join_purchase_window",
    oracle="""
    SELECT e.event_id, p.event_id AS purchase_id, e.event_type
    FROM (SELECT * FROM events WHERE event_type != 'purchase') e
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id
     AND e.ts >= p.ts
     AND e.ts < p.ts + INTERVAL 2 HOUR
    ORDER BY e.event_id, purchase_id
    """,
)
def events_range_join_purchase_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed range join: every non-purchase event landing within 2 hours
    after a purchase by the same user (post-purchase attribution window).
    Bucket width = interval length (2 h), so each interval explodes to ≤2
    buckets."""
    events = load_table(spark, sf_dir, "events")
    points = events.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts", "event_type"
    )
    intervals = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOUR")).alias("win_end"),
    )
    joined = range_join(
        points,
        intervals,
        on=["user_id"],
        point_ts="ts",
        start_col="win_start",
        end_col="win_end",
        bucket_seconds=2 * 3600,
    )
    return joined.select("event_id", "purchase_id", "event_type").orderBy(
        "event_id", "purchase_id"
    )
