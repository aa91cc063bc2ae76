"""Salting helpers: identical results to unsalted plans, spread partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from trafsys_data_transfer_spark.operators.skew import (
    SALT_COL,
    salted_aggregate,
    salted_join,
    with_salt,
)


def _skewed_df(spark):
    """90% of rows share one hot key."""
    return spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("HOT")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 97).cast("string"))
        ).alias("k"),
        F.col("id").alias("id"),
        (F.col("id") % 7).cast("double").alias("v"),
    )


def test_salted_aggregate_matches_plain_groupby(spark):
    df = _skewed_df(spark)
    plain = {
        (r["k"]): (r["v"], r["n"])
        for r in df.groupBy("k").agg(F.sum("v").alias("v"), F.count(F.lit(1)).alias("n")).collect()
    }
    salted = {
        (r["k"]): (r["v"], r["n"])
        for r in salted_aggregate(
            df, keys=["k"], sum_cols=["v"], fingerprint_cols=["id"], count_alias="n"
        ).collect()
    }
    assert salted == plain


def test_salt_spreads_hot_key(spark):
    df = with_salt(_skewed_df(spark), ["id"], buckets=16)
    per_bucket = (
        df.filter(F.col("k") == "HOT").groupBy(SALT_COL).count().collect()
    )
    counts = [r["count"] for r in per_bucket]
    assert len(counts) == 16  # every bucket hit
    assert max(counts) < 9000 * 0.15  # no bucket owns the hot key


def test_salted_join_matches_plain_join(spark):
    big = _skewed_df(spark)
    small = spark.createDataFrame(
        [("HOT", 1.5), ("k3", 2.0), ("k42", 3.0)], ["k", "weight"]
    )
    plain = {
        (r["id"], r["weight"])
        for r in big.join(small, "k").select("id", "weight").collect()
    }
    salted = {
        (r["id"], r["weight"])
        for r in salted_join(big, small, ["k"], ["id"]).select("id", "weight").collect()
    }
    assert salted == plain
