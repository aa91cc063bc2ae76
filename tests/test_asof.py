"""As-of join semantics on planted rows: backward match, tie-at-timestamp
inclusion, left-outer nulls."""

from __future__ import annotations

from pyspark.sql import functions as F

from trafsys_data_transfer_spark.operators.asof import asof_join


def test_asof_backward_match_and_nulls(spark):
    left = spark.createDataFrame(
        [
            (1, "2024-01-01T09:00:00", "before-any"),
            (1, "2024-01-01T10:00:00", "tie"),
            (1, "2024-01-01T12:30:00", "mid"),
            (2, "2024-01-01T23:00:00", "other-key"),
        ],
        "k long, ts_s string, label string",
    ).select("k", F.to_timestamp("ts_s").alias("ts"), "label")
    right = spark.createDataFrame(
        [
            (1, "2024-01-01T10:00:00", 100),
            (1, "2024-01-01T12:00:00", 200),
            (1, "2024-01-01T13:00:00", 300),
            (2, "2024-01-01T00:00:00", 900),
        ],
        "k long, ts_s string, v int",
    ).select("k", F.to_timestamp("ts_s").alias("rts"), "v")

    out = {
        r["label"]: r["v"]
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="rts", right_payload=["v"]
        ).collect()
    }
    assert out == {
        "before-any": None,  # no right row at or before → null (left outer)
        "tie": 100,          # right row AT the timestamp is visible (<=)
        "mid": 200,          # latest earlier row, not the later 300
        "other-key": 900,    # keys never bleed across partitions
    }


def test_asof_tolerance_nulls_stale_matches(spark, sf_dir):
    """Every tolerance match must also be an unbounded-asof match, and
    every non-null match must be at most 30 days old; rows whose
    unbounded match is older must carry NULL."""
    from pyspark.sql import functions as F

    from trafsys_data_transfer_spark.registry import all_queries

    q = all_queries()
    tol = q["events_asof_tolerance"].build(spark, sf_dir)
    anyage = q["events_asof_latest_order"].build(spark, sf_dir)
    j = tol.alias("t").join(
        anyage.alias("a"), F.col("t.event_id") == F.col("a.event_id")
    )
    bad_extra = j.where(
        F.col("t.recent_orderkey").isNotNull()
        & (F.col("t.recent_orderkey") != F.col("a.last_orderkey"))
    ).count()
    assert bad_extra == 0  # tolerance can only null out, never re-match
    n_null = tol.where(F.col("recent_orderkey").isNull()).count()
    n_any_null = anyage.where(F.col("last_orderkey").isNull()).count()
    # STRICT inequality (ADVICE r10 #3): the sf fixtures contain >30-day-
    # stale matches, so the tolerance must actually null at least one row —
    # ">=" alone would pass even if the tolerance were a no-op.
    assert n_null > n_any_null, (
        f"tolerance nulled nothing: {n_null} nulls vs {n_any_null} unbounded"
    )
