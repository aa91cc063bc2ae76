"""bounded_window_guard contract (VERDICT r10 task 3): in-plan assertion
that a global-window input is a bounded relation — passes under the bound
with rows intact, raises over it, adds no shuffle beyond the single-
partition exchange the guarded window needs anyway."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from trafsys_data_transfer_spark.operators.guards import bounded_window_guard


def test_guard_passes_under_bound(spark):
    df = spark.range(100).select(F.col("id"), (F.col("id") % 7).alias("g"))
    out = bounded_window_guard(df, "unit", max_rows=100)
    ranked = out.select(
        "id", F.row_number().over(Window.orderBy("id")).alias("rn")
    )
    rows = ranked.collect()
    assert len(rows) == 100
    assert [r["rn"] for r in rows[:3]] == [1, 2, 3]
    assert "__wguard" not in ranked.columns


def test_guard_raises_over_bound(spark):
    df = spark.range(101)
    out = bounded_window_guard(df, "unit_over", max_rows=100)
    with pytest.raises(Exception, match="bounded_window_guard:unit_over"):
        out.select(
            "id", F.row_number().over(Window.orderBy("id")).alias("rn")
        ).collect()


def test_guard_survives_optimizer_and_adds_no_exchange(spark):
    """The guard must not be pruned away (the assert literal stays in the
    optimized plan) and must not add a second SinglePartition exchange —
    it shares the guarded window's own."""
    df = spark.range(50).select(F.col("id"))
    guarded = bounded_window_guard(df, "plan_check", max_rows=10_000).select(
        "id", F.row_number().over(Window.orderBy("id")).alias("rn")
    )
    plan = guarded._jdf.queryExecution().executedPlan().toString()
    assert "bounded_window_guard:plan_check" in plan
    assert plan.count("Exchange SinglePartition") <= 1


def test_guard_over_bound_raises_even_after_downstream_filter(spark):
    """A downstream selective filter must not let an over-bound relation
    sneak past: the guard evaluates on the window INPUT."""
    df = spark.range(500)
    out = bounded_window_guard(df, "strict_input", max_rows=100)
    with pytest.raises(Exception, match="bounded_window_guard:strict_input"):
        out.where(F.col("id") < 5).collect()
