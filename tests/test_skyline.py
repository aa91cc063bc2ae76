"""Pareto frontier: brute-force dominance equivalence + partitioning
invariance of the two-phase plan."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from trafsys_data_transfer_spark.operators.skyline import pareto_frontier


def _brute_frontier(rows):
    """O(n^2) reference: (group, cost, benefit, id) tuples on the frontier."""
    out = []
    for p in rows:
        dominated = any(
            q[0] == p[0]
            and q[1] <= p[1]
            and q[2] >= p[2]
            and (q[1] < p[1] or q[2] > p[2])
            for q in rows
        )
        if not dominated:
            out.append(p)
    return sorted(out)


def _run(spark, rows, partitions):
    df = spark.createDataFrame(
        rows, "grp string, cost long, benefit long, id long"
    ).repartition(partitions)
    got = pareto_frontier(df, ["grp"], "cost", "benefit").collect()
    return sorted((r.grp, r.cost, r.benefit, r.id) for r in got)


def test_frontier_matches_bruteforce(spark):
    rng = random.Random(7)
    rows = [
        (f"g{rng.randrange(3)}", rng.randrange(20), rng.randrange(20), i)
        for i in range(300)
    ]
    assert _run(spark, rows, 8) == _brute_frontier(rows)


def test_frontier_partitioning_invariant(spark):
    rng = random.Random(11)
    rows = [
        (f"g{rng.randrange(2)}", rng.randrange(15), rng.randrange(15), i)
        for i in range(200)
    ]
    expect = _brute_frontier(rows)
    for parts in (1, 3, 13):
        assert _run(spark, rows, parts) == expect


def test_frontier_keeps_exact_ties(spark):
    # Two identical (cost, benefit) points: neither dominates the other —
    # both stay; a strictly better third point kills both.
    rows = [("g", 5, 5, 1), ("g", 5, 5, 2), ("h", 5, 5, 3), ("h", 4, 6, 4)]
    got = _run(spark, rows, 2)
    assert got == [("g", 5, 5, 1), ("g", 5, 5, 2), ("h", 4, 6, 4)]
