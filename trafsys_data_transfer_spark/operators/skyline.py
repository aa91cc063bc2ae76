"""Group-wise Pareto frontier (skyline) — the "best tradeoffs" operator.

A row p is ON the frontier of its group iff no other row q in the group
dominates it: ``q.cost <= p.cost AND q.benefit >= p.benefit`` with at
least one strict.  The naive formulation is an all-pairs anti-join
(quadratic per group — DuckDB's NOT EXISTS oracle does exactly that);
the distributed plan here is the classic two-phase skyline:

1. **Local prune** — each Spark partition computes the skyline of just
   its own rows with two partitioned window passes (sort by cost, track
   the running max benefit).  Any point dominated locally is dominated
   globally, so this filter is a sound superset reduction and needs no
   shuffle beyond the windows' (partition_id, group) sort.
2. **Global finish** — the same two window passes over the survivors,
   now partitioned only by group.  Survivors are O(frontier) per
   partition, so the second pass runs on frontier-sized data, never the
   corpus.

Result is invariant to the input partitioning (phase 1 only ever drops
globally-dominated rows) — pinned by a pytest that repartitions the
input arbitrarily.  At 100 TB the expensive sort is phase 1's
per-partition window (map-side, no cross-partition shuffle of the raw
corpus); only frontier candidates reach the group-wide exchange.

The dominance-via-running-max trick: sort ascending by cost.  Every
earlier row is cheaper-or-equal, so p is dominated iff
``max(benefit) over strictly-cheaper rows >= p.benefit`` (range frame
up to cost-1) or ``max(benefit) over same-cost rows > p.benefit``
(strictness for ties).  Both frames are exact integer range windows —
whole-stage-codegen band, no UDF, no self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..sources.fixtures import load_table


def _skyline_pass(df: DataFrame, group_cols: list[str]) -> DataFrame:
    """One dominated-row elimination pass within ``group_cols`` scope.
    Requires integer ``_sky_cost`` and ``_sky_benefit`` columns; returns the subset
    of ``df`` not dominated by any row in the same scope."""
    by_cost = (
        Window.partitionBy(*group_cols)
        .orderBy("_sky_cost")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    same_cost = Window.partitionBy(*group_cols, "_sky_cost")
    pruned = (
        df.withColumn("_best_cheaper", F.max("_sky_benefit").over(by_cost))
        .withColumn("_best_same", F.max("_sky_benefit").over(same_cost))
        .filter(
            (F.col("_best_cheaper").isNull() | (F.col("_best_cheaper") < F.col("_sky_benefit")))
            & (F.col("_best_same") <= F.col("_sky_benefit"))
        )
        .drop("_best_cheaper", "_best_same")
    )
    return pruned


def pareto_frontier(
    df: DataFrame,
    group_cols: list[str],
    cost_col: str,
    benefit_col: str,
) -> DataFrame:
    """Rows of ``df`` on the (min ``cost_col``, max ``benefit_col``)
    Pareto frontier of their ``group_cols`` group.  Two-phase: local
    skyline per (input partition, group), then group-global skyline over
    the survivors.  Ties on both dimensions are kept (neither point
    dominates), matching SQL NOT-EXISTS-with-strictness semantics."""
    staged = df.withColumn("_sky_cost", F.col(cost_col).cast("long")).withColumn(
        "_sky_benefit", F.col(benefit_col).cast("long")
    )
    local = _skyline_pass(
        staged.withColumn("_pid", F.spark_partition_id()), ["_pid", *group_cols]
    ).drop("_pid")
    return _skyline_pass(local, group_cols).drop("_sky_cost", "_sky_benefit")


@register(
    "parts_pareto_frontier",
    oracle="""
    WITH cents AS (
        SELECT p_partkey, p_brand, p_size,
               CAST(FLOOR(p_retailprice * 100) AS BIGINT) AS price_cents
        FROM part
    )
    SELECT p_brand, p_partkey, p_size, price_cents
    FROM cents p
    WHERE NOT EXISTS (
        SELECT 1 FROM cents q
        WHERE q.p_brand = p.p_brand
          AND q.price_cents <= p.price_cents
          AND q.p_size >= p.p_size
          AND (q.price_cents < p.price_cents OR q.p_size > p.p_size)
    )
    ORDER BY p_brand, p_partkey
    """,
)
def parts_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand price/size Pareto frontier over ``part``: the parts for
    which no same-brand part is both cheaper-or-equal and larger-or-equal
    (strictly better in one).  The DuckDB oracle is the quadratic
    NOT EXISTS dominance anti-join; the Spark plan is the two-phase
    windowed skyline — same rows, hash-checked."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.floor(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
    )
    return (
        pareto_frontier(part, ["p_brand"], "price_cents", "p_size")
        .select("p_brand", "p_partkey", "p_size", "price_cents")
        .orderBy("p_brand", "p_partkey")
    )
