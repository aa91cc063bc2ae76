"""Merge-on-read: deletes and upserts resolved at READ time.

The write-time MERGE (`operators/merge.py`) rewrites target partitions on
every batch — correct, but write-amplified when deltas are tiny and hot.
The lakehouse alternative (Iceberg equality/position deletes, Delta
deletion vectors) lands deletes and upserts as SMALL SIDE FILES and defers
the reconciliation to the reader:

    read(T) = (base ⟕anti deletes) ⊎ latest-wins(upserts \\ deletes)

Write cost becomes O(delta) regardless of base size; the read pays one
broadcast anti-join + one union per query until compaction folds the logs
back into base files (compaction = `operators/layout.py`'s job; the MERGE
operator is exactly the fold).  This operator implements the READ side
over plain parquet tables and hash-checks it against the equivalent
one-shot SQL.

Commit-order semantics (the contract a real log gives a reader): deletes
apply to the BASE only; an upsert for a deleted key re-inserts it; among
upserts for the same key, the highest ``commit_seq`` wins (last write).

Scale: the delete/upsert logs are nightly-delta sized → both broadcast;
the base scan never shuffles.  When a log outgrows broadcast, the
anti-join degrades to a key shuffle and compaction is overdue — that
boundary is the operational signal, not a failure mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.fixtures import load_table


def mor_read(
    base: DataFrame,
    deletes: DataFrame,
    upserts: DataFrame,
    key: str,
    seq_col: str = "commit_seq",
) -> DataFrame:
    """Resolve base + delete keys + upsert log into current table state.

    ``deletes``: one column ``key``.  ``upserts``: base schema plus
    ``seq_col``; last write per key wins.
    """
    cols = base.columns
    live_base = base.join(F.broadcast(deletes), key, "left_anti")
    w = Window.partitionBy(key).orderBy(F.col(seq_col).desc())
    latest_upserts = (
        upserts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*cols)
    )
    # upserted keys shadow base rows (whether deleted or not)
    return live_base.join(
        F.broadcast(latest_upserts.select(key)), key, "left_anti"
    ).unionByName(latest_upserts)


@register(
    "orders_mor_read",
    # One-shot equivalent of the log resolution: the derived delete and
    # upsert fixtures are deterministic key filters, so the oracle
    # recomputes final state directly.
    oracle="""
    WITH upserts AS (
        -- two commits upsert overlapping keys; seq 2 (price+2000, 'U2')
        -- must win over seq 1 (price+1000, 'U1') on keys % 178 = 89
        SELECT o_orderkey, o_custkey,
               CASE WHEN o_orderkey % 178 = 89 THEN 'U2' ELSE 'U1' END
                   AS o_orderstatus,
               o_totalprice + CASE WHEN o_orderkey % 178 = 89
                                   THEN 2000 ELSE 1000 END AS o_totalprice,
               o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % 89 = 0
    )
    SELECT o_orderkey, o_custkey, o_orderstatus,
           ROUND(o_totalprice, 2) AS o_totalprice, o_orderdate,
           o_orderpriority
    FROM orders
    WHERE o_orderkey % 97 != 0          -- deletes
      AND o_orderkey % 89 != 0          -- shadowed by upserts
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus,
           ROUND(o_totalprice, 2) AS o_totalprice, o_orderdate,
           o_orderpriority
    FROM upserts
    ORDER BY o_orderkey
    """,
)
def orders_mor_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read over derived logs: keys %97 deleted from base, keys
    %89 upserted twice (commit 2 overrides commit 1 on the %178=89
    overlap, and re-inserts any key the delete log removed)."""
    orders = load_table(spark, sf_dir, "orders")
    deletes = orders.filter(F.col("o_orderkey") % 97 == 0).select("o_orderkey")
    hit = orders.filter(F.col("o_orderkey") % 89 == 0)
    up1 = hit.withColumn(
        "o_totalprice", F.col("o_totalprice") + 1000
    ).withColumn("o_orderstatus", F.lit("U1")).withColumn(
        "commit_seq", F.lit(1)
    )
    up2 = (
        hit.filter(F.col("o_orderkey") % 178 == 89)
        .withColumn("o_totalprice", F.col("o_totalprice") + 2000)
        .withColumn("o_orderstatus", F.lit("U2"))
        .withColumn("commit_seq", F.lit(2))
    )
    resolved = mor_read(
        orders, deletes, up1.unionByName(up2), key="o_orderkey"
    )
    # (trailing global sort dropped r11: order-insensitive driver compare,
    # r10 asof precedent — it range-shuffled the full 150k-row output.)
    return resolved.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
