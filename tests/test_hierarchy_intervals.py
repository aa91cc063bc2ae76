"""Recursive hierarchy rollup + interval coalescing (r8 additions):
hand-computed closures/islands, termination contracts, edge semantics."""

from __future__ import annotations

import pytest

from trafsys_data_transfer_spark.operators.hierarchy import (
    ancestor_closure,
    hierarchy_rollup,
)
from trafsys_data_transfer_spark.operators.intervals import (
    coalesce_intervals,
)


def _forest(spark):
    # 1 ← 10 ← 100, 1 ← 11, 2 (isolated root)
    return spark.createDataFrame(
        [(1, None), (10, 1), (11, 1), (100, 10), (2, None)],
        "child long, parent long",
    )


def test_ancestor_closure_hand_oracle(spark):
    got = {
        (r.node, r.anc, r.depth)
        for r in ancestor_closure(_forest(spark)).collect()
    }
    self_rows = {(n, n, 0) for n in (1, 2, 10, 11, 100)}
    want = self_rows | {
        (10, 1, 1),
        (11, 1, 1),
        (100, 10, 1),
        (100, 1, 2),
    }
    assert got == want


def test_hierarchy_rollup_sums_whole_subtrees(spark):
    values = spark.createDataFrame(
        [(1, 5), (10, 7), (11, 11), (100, 13), (2, 3)],
        "key long, value long",
    )
    got = {
        r.child: (r.n_subtree, r.subtree_value)
        for r in hierarchy_rollup(_forest(spark), values).collect()
    }
    assert got == {
        1: (4, 36),  # 5 + 7 + 11 + 13
        10: (2, 20),  # 7 + 13
        11: (1, 11),
        100: (1, 13),
        2: (1, 3),
    }


def test_hierarchy_rollup_missing_values_count_as_zero(spark):
    values = spark.createDataFrame([(100, 13)], "key long, value long")
    got = {
        r.child: (r.n_subtree, r.subtree_value)
        for r in hierarchy_rollup(_forest(spark), values).collect()
    }
    assert got[1] == (4, 13) and got[11] == (1, 0)


def test_ancestor_closure_cycle_fails_loudly(spark):
    cyc = spark.createDataFrame(
        [(1, 2), (2, 1)], "child long, parent long"
    )
    with pytest.raises(RuntimeError, match="cycle"):
        ancestor_closure(cyc, max_depth=8)


def test_coalesce_intervals_hand_oracle(spark):
    iv = spark.createDataFrame(
        [
            # key a: [0,10] [5,12] [12,20] merge (overlap + touching);
            #        [25,30] separate
            ("a", 0, 10),
            ("a", 5, 12),
            ("a", 12, 20),
            ("a", 25, 30),
            # key b: containment — [0,100] swallows [10,20]
            ("b", 0, 100),
            ("b", 10, 20),
            # key c: zero-length interval on an island edge merges
            ("c", 1, 1),
            ("c", 1, 4),
        ],
        "key string, start long, end long",
    )
    got = {
        (r.key, r.island_start, r.island_end, r.n_merged)
        for r in coalesce_intervals(iv).collect()
    }
    assert got == {
        ("a", 0, 20, 3),
        ("a", 25, 30, 1),
        ("b", 0, 100, 2),
        ("c", 1, 4, 2),
    }


def test_coalesce_intervals_out_of_order_input_is_order_free(spark):
    rows = [("k", 12, 20), ("k", 0, 10), ("k", 25, 30), ("k", 5, 12)]
    a = coalesce_intervals(
        spark.createDataFrame(rows, "key string, start long, end long")
    )
    b = coalesce_intervals(
        spark.createDataFrame(rows[::-1], "key string, start long, end long")
    )
    key = lambda r: (r.key, r.island_start)  # noqa: E731
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_coalesce_intervals_plan_is_one_exchange(spark):
    """The window pass and the final groupBy must share the key
    partitioning: exactly one hash exchange in the physical plan."""
    iv = spark.createDataFrame(
        [("k", 0, 10)], "key string, start long, end long"
    )
    plan = (
        coalesce_intervals(iv)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
