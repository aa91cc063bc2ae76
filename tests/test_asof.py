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
