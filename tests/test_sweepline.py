"""Sweep-line concurrency: brute-force step-function equivalence,
cross-midnight carry, closed-interval touch semantics."""

from __future__ import annotations

import datetime as dt
import random

from trafsys_data_transfer_spark.operators.sweepline import (
    interval_concurrency_daily,
)


def _brute_daily_peak(intervals):
    """Evaluate the step function at every boundary instant (and each day
    start) and take per-day maxima — O(n^2), closed-interval semantics."""
    times = sorted({t for s, e in intervals for t in (s, e)})
    days = sorted({t.date() for t in times})
    day_starts = [dt.datetime.combine(d, dt.time()) for d in days]
    peaks = {}
    for t in times + day_starts:
        c = sum(1 for s, e in intervals if s <= t <= e)
        d = t.date()
        if d in {x.date() for x in times}:  # only days with boundaries
            peaks[d] = max(peaks.get(d, 0), c)
    boundary_days = {t.date() for t in times}
    return {d: p for d, p in peaks.items() if d in boundary_days}


def _run(spark, intervals, partitions):
    df = spark.createDataFrame(
        intervals, "session_start timestamp, session_end timestamp"
    ).repartition(partitions)
    got = interval_concurrency_daily(df).collect()
    return {r.day: r.peak_concurrency for r in got}


def test_daily_peak_matches_bruteforce(spark):
    rng = random.Random(3)
    base = dt.datetime(2024, 5, 1)
    intervals = []
    for _ in range(150):
        s = base + dt.timedelta(minutes=rng.randrange(5 * 24 * 60))
        e = s + dt.timedelta(minutes=rng.randrange(1, 300))
        intervals.append((s, e))
    assert _run(spark, intervals, 8) == _brute_daily_peak(intervals)


def test_cross_midnight_carry(spark):
    # Three sessions open across midnight; day 2's only boundary is one
    # session ending — its peak must come from the CARRY, not the local max.
    d1 = dt.datetime(2024, 5, 1, 23, 0)
    intervals = [
        (d1, d1 + dt.timedelta(hours=3)),          # ends 02:00 day2
        (d1 + dt.timedelta(minutes=10), d1 + dt.timedelta(hours=4)),
        (d1 + dt.timedelta(minutes=20), d1 + dt.timedelta(hours=5)),
    ]
    got = _run(spark, intervals, 2)
    assert got[dt.date(2024, 5, 1)] == 3
    assert got[dt.date(2024, 5, 2)] == 3  # carry-in, all still open at 00:00


def test_touching_intervals_overlap(spark):
    # One ends exactly when the next starts: closed intervals — concurrent.
    t = dt.datetime(2024, 5, 1, 12, 0)
    intervals = [(t - dt.timedelta(hours=1), t), (t, t + dt.timedelta(hours=1))]
    got = _run(spark, intervals, 1)
    assert got[dt.date(2024, 5, 1)] == 2


def test_partitioning_invariant(spark):
    rng = random.Random(9)
    base = dt.datetime(2024, 5, 1)
    intervals = [
        (
            base + dt.timedelta(minutes=rng.randrange(2 * 24 * 60)),
            base + dt.timedelta(minutes=rng.randrange(2 * 24 * 60, 3 * 24 * 60)),
        )
        for _ in range(80)
    ]
    expect = _brute_daily_peak(intervals)
    for parts in (1, 5, 17):
        assert _run(spark, intervals, parts) == expect
