"""Time-series stats family: reconstruction/ordering invariants beyond
the driver hash."""

from __future__ import annotations

from pyspark.sql import functions as F

from trafsys_data_transfer_spark.registry import all_queries


def test_stl_components_reconstruct_counts(spark, sf_dir):
    """trend + seasonal + residual == cnt (within the 6-dp rounding of
    the three surfaced components)."""
    out = all_queries()["events_stl_decompose"].build(spark, sf_dir)
    bad = out.where(
        F.abs(
            F.col("cnt")
            - (F.col("trend") + F.col("seasonal") + F.col("residual"))
        )
        > 2e-6
    ).count()
    assert bad == 0


def test_stl_drops_exactly_the_edges(spark, sf_dir):
    """Output rows per type == occupied hourly buckets − 24 when the
    series is dense enough (the 12-row guard trims each end)."""
    from trafsys_data_transfer_spark.sources.fixtures import load_table

    out = all_queries()["events_stl_decompose"].build(spark, sf_dir)
    per_type = dict(out.groupBy("event_type").count().collect())
    buckets = dict(
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts"))
        .count()
        .groupBy("event_type")
        .count()
        .collect()
    )
    for t, n_buckets in buckets.items():
        assert per_type.get(t, 0) == max(0, n_buckets - 24)


def test_mann_kendall_z_sign_matches_s(spark, sf_dir):
    out = all_queries()["events_mann_kendall"].build(spark, sf_dir)
    for r in out.collect():
        assert r.var_s > 0
        if r.s_stat > 0:
            assert r.z_score >= 0
        elif r.s_stat < 0:
            assert r.z_score <= 0
        else:
            assert r.z_score == 0.0
        # |S| can never exceed the pair count
        assert abs(r.s_stat) <= r.n_days * (r.n_days - 1) // 2


def test_wilson_bounds_bracket_p_hat(spark, sf_dir):
    out = all_queries()["events_wilson_ci"].build(spark, sf_dir)
    for r in out.collect():
        assert 0.0 <= r.wilson_lo <= r.p_hat <= r.wilson_hi <= 1.0
        assert r.n_success <= r.n_trials


def test_rolling_slope_on_linear_ramp(spark):
    """A perfectly linear per-key series (cents = 300·index) must yield
    slope_cents == 300 for every full window."""
    from trafsys_data_transfer_spark.plans import timeseries as ts
    import trafsys_data_transfer_spark.plans.timeseries as mod

    rows = [
        (i, f"2024-01-01 00:{i:02d}:00", 7, "view", 3.0 * i, "{}")
        for i in range(1, 60)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string,"
        " value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))

    real = mod.load_table
    try:
        mod.load_table = lambda spark, sf, name: df
        out = ts.events_rolling_slope.__wrapped__ if hasattr(
            ts.events_rolling_slope, "__wrapped__"
        ) else ts.events_rolling_slope
        res = out(spark, "ignored").collect()
    finally:
        mod.load_table = real
    assert len(res) == 59 - 23
    assert all(r.slope_cents == 300.0 for r in res)


def test_holt_linear_constant_series(spark):
    """A constant series has level == the constant and trend == 0 at
    every step."""
    from trafsys_data_transfer_spark.plans.timeseries import holt_linear

    df = spark.createDataFrame(
        [("k", i, 42) for i in range(1, 30)], "k string, h long, cnt long"
    )
    out = holt_linear(df, "k", "h", "cnt").collect()
    assert len(out) == 29
    assert all(r.level == 42.0 and r.trend == 0.0 for r in out)


def test_holt_linear_tracks_a_ramp(spark):
    """On cnt = 10·t the trend estimate converges toward 10."""
    from trafsys_data_transfer_spark.plans.timeseries import holt_linear

    df = spark.createDataFrame(
        [("k", i, 10 * i) for i in range(1, 200)],
        "k string, h long, cnt long",
    )
    last = sorted(
        holt_linear(df, "k", "h", "cnt").collect(), key=lambda r: r.rn
    )[-1]
    assert abs(last.trend - 10.0) < 0.5
    assert abs(last.level - 10.0 * 199) < 50


def _with_fake_events(spark, rows, fn):
    """Run a registered timeseries builder against a synthetic events
    table (monkeypatched load_table)."""
    import trafsys_data_transfer_spark.plans.timeseries as mod

    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    real = mod.load_table
    try:
        mod.load_table = lambda spark, sf, name: df
        return fn(spark, "ignored").collect()
    finally:
        mod.load_table = real


def test_acf_alternating_series_is_exactly_pm1(spark):
    """A strictly alternating hourly count series (1,2,1,2,…) has
    ACF(1) == −1 and ACF(2) == +1 exactly (Pearson of an exact linear
    relation)."""
    from trafsys_data_transfer_spark.plans.timeseries import (
        events_autocorrelation,
    )

    rows = []
    eid = 0
    for h in range(100):
        for _ in range(h % 2 + 1):
            eid += 1
            rows.append(
                (eid, f"2024-01-0{h // 24 + 1} {h % 24:02d}:05:00", 1,
                 "view", 1.0, "{}")
            )
    res = _with_fake_events(spark, rows, events_autocorrelation)
    by_lag = {r.lag: r.acf for r in res}
    assert by_lag[1] == -1.0
    assert by_lag[2] == 1.0


def test_theilsen_ignores_a_wild_outlier(spark):
    """Daily spend 1·day dollars with one absurd outlier day: the median
    pairwise slope is still exactly 100 cents/day."""
    from trafsys_data_transfer_spark.plans.timeseries import (
        events_theilsen_slope,
    )

    rows = []
    for d in range(1, 21):
        v = 10_000.0 if d == 10 else float(d)
        rows.append((d, f"2024-01-{d:02d} 12:00:00", 1, "view", v, "{}"))
    res = _with_fake_events(spark, rows, events_theilsen_slope)
    assert len(res) == 1
    assert res[0].theil_sen_slope == 100.0
    assert res[0].n_pairs == 20 * 19 // 2


def test_circular_mean_immune_to_midnight_wrap(spark):
    """Events clustered at 23:00 and 01:00 must yield a circular mean
    near midnight (0 h), where a plain average would say noon."""
    from trafsys_data_transfer_spark.plans.timeseries import (
        events_peak_hour_circular,
    )

    rows = []
    eid = 0
    for d in range(1, 11):
        for h in (23, 1):
            eid += 1
            rows.append(
                (eid, f"2024-01-{d:02d} {h:02d}:30:00", 1, "view", 1.0, "{}")
            )
    res = _with_fake_events(spark, rows, events_peak_hour_circular)
    assert len(res) == 1
    r = res[0]
    # mean of 23h and 1h on the clock circle is 0h (wrap), never 12h
    assert r.mean_hour < 0.01 or r.mean_hour > 23.99
    # equal weight ±1h from the mean: R = cos(2π/24) ≈ 0.9659
    assert abs(r.resultant_r - 0.965926) < 1e-4


def test_simpson_extremes(spark, sf_dir):
    """D ∈ (0, 1]; 1−D complements; repeat-heavy sources score higher D
    than the uniform bound 1/n_types."""
    from trafsys_data_transfer_spark.registry import all_queries

    out = all_queries()["text_simpson_diversity"].build(spark, sf_dir)
    for r in out.collect():
        assert 0.0 < r.simpson_d <= 1.0
        assert abs((r.simpson_d + r.simpson_diversity) - 1.0) < 2e-6
        # unbiased-form uniform minimum: (N−k)/(k(N−1)), not 1/k
        lo = (r.n_tokens - r.n_types) / (r.n_types * (r.n_tokens - 1))
        assert r.simpson_d >= lo - 1e-9
