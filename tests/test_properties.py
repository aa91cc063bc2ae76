"""Property-based tests (SURVEY.md §5.4): the algebraic invariants the
engine's correctness rests on, checked over generated inputs.

Spark round-trips are expensive, so examples are capped — the properties
are about structure (idempotence, grain additivity), not scale.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from trafsys_data_transfer_spark.operators.merge import (
    dedupe_last_write,
    merge_additive,
    merge_dataframes,
)
from trafsys_data_transfer_spark.plans.traffic import rollup_traffic

KEYS = ["SiteCode", "Location", "PeriodEnding"]
COLS = KEYS + ["IsInternal", "Ins", "Outs"]


#: One traffic row: tiny key domains force PK collisions, which is the
#: interesting case for MERGE.
row_st = st.tuples(
    st.sampled_from(["S1", "S2"]),
    st.sampled_from(["door", "gate"]),
    st.integers(min_value=0, max_value=5),  # hour offset
    st.booleans(),
    st.integers(min_value=0, max_value=100),
    st.integers(min_value=0, max_value=100),
)


def _df(spark, rows):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    data = [
        (s, l, base + dt.timedelta(hours=h), int(i), ins, outs)
        for (s, l, h, i, ins, outs) in rows
    ]
    return spark.createDataFrame(
        data,
        "SiteCode string, Location string, PeriodEnding timestamp, "
        "IsInternal int, Ins long, Outs long",
    )


def _canon(df):
    return sorted(tuple(r[c] for c in COLS) for r in df.collect())


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    target_rows=st.lists(row_st, max_size=8),
    batch_rows=st.lists(row_st, max_size=8),
)
def test_merge_idempotent(spark, target_rows, batch_rows):
    """merge(merge(T,B),B) == merge(T,B): replaying any batch is a no-op —
    the invariant that turns at-least-once delivery into effectively-once
    (reference script.js:195-200)."""
    target = dedupe_last_write(_df(spark, target_rows), KEYS, ["Ins", "Outs"])
    batch = dedupe_last_write(_df(spark, batch_rows), KEYS, ["Ins", "Outs"])
    once = merge_dataframes(target, batch, KEYS)
    twice = merge_dataframes(once, batch, KEYS)
    assert _canon(once) == _canon(twice)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(row_st, min_size=1, max_size=12),
    split=st.integers(min_value=0, max_value=12),
)
def test_additive_merge_equals_one_shot(spark, rows, split):
    """Partition invariance of incremental aggregation: rolling up any two
    halves of a batch and additively merging the partials must equal the
    one-shot rollup — for EVERY split point, not just the parity split the
    correctness gate uses."""
    df = _df(spark, rows)
    whole = rollup_traffic(df, grain="hour")
    a = rollup_traffic(_df(spark, rows[:split]), grain="hour")
    b = rollup_traffic(_df(spark, rows[split:]), grain="hour")
    merged = merge_additive(
        a, b, keys=["SiteCode", "Location", "PeriodEnding"], sum_cols=["Ins", "Outs"]
    )
    cols = ["SiteCode", "Location", "PeriodEnding", "Ins", "Outs"]
    assert sorted(tuple(r[c] for c in cols) for r in merged.collect()) == sorted(
        tuple(r[c] for c in cols) for r in whole.collect()
    )


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=st.lists(row_st, min_size=1, max_size=12))
def test_hourly_rollup_sums_to_daily(spark, rows):
    """Grain consistency: summing the hourly rollup over each day equals the
    daily rollup (the DataSummedByDay knob must be a pure re-grouping)."""
    df = _df(spark, rows)
    hourly = rollup_traffic(df, grain="hour")
    daily = rollup_traffic(df, grain="day")
    re_daily = (
        hourly.groupBy(
            "SiteCode",
            "Location",
            (F.date_trunc("day", F.col("PeriodEnding") - F.expr("INTERVAL 1 SECOND"))
             + F.expr("INTERVAL 1 DAY")).alias("PeriodEnding"),
        )
        .agg(F.sum("Ins").alias("Ins"), F.sum("Outs").alias("Outs"))
    )
    cols = ["SiteCode", "Location", "PeriodEnding", "Ins", "Outs"]
    assert sorted(tuple(r[c] for c in cols) for r in re_daily.collect()) == sorted(
        tuple(r[c] for c in cols) for r in daily.collect()
    )


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),          # user_id
            st.integers(min_value=0, max_value=6 * 3600),   # seconds offset
        ),
        min_size=1,
        max_size=24,
    )
)
def test_session_window_native_equals_gaps_and_islands(spark, events):
    """Property: for ANY event set, the built-in session_window aggregate
    produces exactly the sessions of the gaps-and-islands plan — including
    duplicate timestamps and exactly-on-the-gap boundaries."""
    from pyspark.sql import functions as F

    from trafsys_data_transfer_spark.operators.sessions import sessionize_batch

    df = spark.createDataFrame(
        [(u, i, off) for i, (u, off) in enumerate(events)],
        "user_id long, event_id long, off long",
    ).select(
        "user_id",
        "event_id",
        (F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(secs=F.col("off"))).alias("ts"),
    )
    native = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in df.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .collect()
    }
    gi = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize_batch(df).collect()
    }
    assert native == gi
