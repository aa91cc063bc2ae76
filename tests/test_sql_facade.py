"""SQL entry surface: registered fixture views + spark.sql must agree with
the DataFrame API — a user of the engine can work purely in SQL."""

from __future__ import annotations

from pyspark.sql import functions as F

from trafsys_data_transfer_spark.sources.fixtures import load_table, register_views


def test_spark_sql_over_views_matches_dataframe_api(spark, sf_dir):
    register_views(spark, sf_dir)
    via_sql = spark.sql(
        """
        SELECT l_returnflag, COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
        FROM lineitem WHERE l_shipdate > TIMESTAMP '1996-01-01'
        GROUP BY l_returnflag ORDER BY l_returnflag
        """
    ).collect()
    via_df = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.lit("1996-01-01"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
        .orderBy("l_returnflag")
        .collect()
    )
    assert [tuple(r) for r in via_sql] == [tuple(r) for r in via_df]


def test_views_cover_every_fixture_table(spark, sf_dir):
    from trafsys_data_transfer_spark.schemas import FIXTURE_TABLES

    register_views(spark, sf_dir)
    for name in FIXTURE_TABLES:
        assert spark.sql(f"SELECT * FROM {name} LIMIT 1").count() >= 0
