"""Bucketed tables — shuffle-free co-located joins.

A repeated big-big equi-join (fact ⋈ fact on the same key, every night)
should not pay the shuffle every run: write both sides bucketed by the join
key once, and every subsequent join reads co-located buckets directly —
Catalyst sees `bucketSpec` on both scans and plans a SortMergeJoin with
**no Exchange** on either side.

This is the batch analogue of the reference's "push work to where the data
lives" instinct (its API-side filters, script.js:143-149), applied to the
join: at 100 TB the lineitem ⋈ orders shuffle is the single largest network
cost in the nightly pipeline, and bucketing amortises it to zero.

Bucketed writes go through ``saveAsTable`` (bucket metadata lives in the
session catalog — plain ``.parquet(path)`` cannot record it).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.errors import AnalysisException, SparkRuntimeException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fsutil import delete_path
from ..registry import register
from ..sources.fixtures import load_table


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by the join key.
    Sorting within buckets lets the later SortMergeJoin skip its sort too —
    scan → zip-merge, nothing else.

    ``mode("overwrite")`` replaces a table this session already owns.  The
    one stale case — the catalog is fresh (new process) but a previous
    process left the warehouse directory behind — surfaces as
    LOCATION_ALREADY_EXISTS; only THEN is the leftover directory removed
    and the write retried.  An unconditional pre-write cleanup would let
    two concurrent sessions using the same table name delete each other's
    live files mid-read."""
    spark = df.sparkSession
    cols = list(bucket_cols)
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, cols[0], *cols[1:]
    )
    if sort_cols:
        sc = list(sort_cols)
        writer = writer.sortBy(sc[0], *sc[1:])
    try:
        writer.saveAsTable(table)
    except (AnalysisException, SparkRuntimeException) as e:
        if "LOCATION_ALREADY_EXISTS" not in str(e):
            raise
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        delete_path(spark, os.path.join(warehouse, table.lower()))
        writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


@register(
    "bucketed_colocated_join",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           CAST(ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS DOUBLE) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    ORDER BY 1
    """,
)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located (bucketed) fact-fact join == the plain join (the oracle).

    Both sides are written ``bucketBy(8, orderkey)`` + ``sortBy`` once,
    then joined with broadcast disabled: Catalyst sees matching bucket
    specs and plans a SortMergeJoin with ZERO Exchange operators (the
    plan property is asserted in tests/test_bucketing.py).  At 100 TB
    this amortises the nightly lineitem ⋈ orders shuffle — the single
    largest network cost in the pipeline — down to a co-located scan.
    """
    suffix = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    li_t, o_t = f"li_bkt_{suffix}", f"orders_bkt_{suffix}"
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    write_bucketed(li, li_t, ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    write_bucketed(orders, o_t, ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, li_t).join(
            read_table(spark, o_t), F.col("l_orderkey") == F.col("o_orderkey")
        )
        out = (
            joined.groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                ).alias("revenue"),
            )
            .orderBy("o_orderpriority")
        )
        # Materialise under the no-broadcast conf so the executed plan is
        # the exchange-free SMJ; what returns to the driver is tiny.
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


@register(
    "bucketed_colocated_agg",
    oracle="""
    SELECT l_orderkey,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS price_cents
    FROM lineitem
    GROUP BY l_orderkey
    ORDER BY l_orderkey
    """,
)
def bucketed_colocated_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free AGGREGATION on a bucketed table: grouping on the
    bucket column lets Catalyst plan the HashAggregate directly over the
    co-located scan — ZERO Exchange operators (plan-asserted in
    tests/test_bucketing.py), the aggregation analogue of the co-located
    join.  At 100 TB a per-orderkey rollup over bucketed lineitem is a
    map-only job: the nightly per-key aggregate's shuffle — paid once at
    write time — amortises across every downstream groupBy on the key.
    """
    suffix = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    li_t = f"li_aggbkt_{suffix}"
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    write_bucketed(li, li_t, ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    return (
        read_table(spark, li_t)
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                F.floor(F.col("l_extendedprice") * 100).cast("long")
            ).alias("price_cents"),
        )
        .orderBy("l_orderkey")
    )
