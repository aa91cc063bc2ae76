"""Bucketed co-located join: the join of two tables bucketed on the same
key must plan with ZERO exchanges — the property that amortises the
nightly fact-fact shuffle away at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trafsys_data_transfer_spark.operators.bucketing import read_table, write_bucketed
from trafsys_data_transfer_spark.sources.fixtures import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_bucketed(li, "li_bucketed", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    write_bucketed(orders, "orders_bucketed", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    yield "li_bucketed", "orders_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_cobucketed_join_has_no_exchange(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    # Turn broadcast off so the join would otherwise shuffle both sides.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, li_t).join(
            read_table(spark, o_t),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_cobucketed_join_results_match_plain_join(spark, sf_dir, bucketed_tables):
    li_t, o_t = bucketed_tables
    bucketed = (
        read_table(spark, li_t)
        .join(read_table(spark, o_t), F.col("l_orderkey") == F.col("o_orderkey"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("rev"),
        )
        .collect()[0]
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    plain = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("rev"),
        )
        .collect()[0]
    )
    assert (bucketed["n"], bucketed["rev"]) == (plain["n"], plain["rev"])


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables):
    """Grouping on the bucket column must plan the HashAggregate directly
    over the co-located scan — a map-only aggregation."""
    li_t, _ = bucketed_tables
    agg = (
        read_table(spark, li_t)
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_bucketed_agg_matches_plain_agg(spark, sf_dir, bucketed_tables):
    li_t, _ = bucketed_tables
    got = dict(
        read_table(spark, li_t)
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    want = dict(
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert got == want
