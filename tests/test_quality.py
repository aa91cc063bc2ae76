"""DP-shaped noisy release: bounded influence, seeded determinism, and
noise-scale sanity."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from trafsys_data_transfer_spark.operators.quality import (
    DP_CAP,
    dp_noisy_counts,
)


def _toy(spark, drop_user=None):
    rows = []
    eid = 0
    for u in range(40):
        if u == drop_user:
            continue
        # user u writes u+1 rows to group g = u % 4 (some far over the cap)
        for i in range(u + 1):
            rows.append((eid, u, f"g{u % 4}", float(eid)))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, user_id long, grp string, ts double"
    )


def test_bounded_influence_of_any_single_user(spark):
    """Removing ANY user's rows moves each released count by <= cap:
    the capped count changes by at most cap, and the (group, seed)-keyed
    noise does not change at all."""
    base = {
        r.grp: r.noisy_n
        for r in dp_noisy_counts(
            _toy(spark), "grp", "user_id", ["ts", "event_id"]
        ).collect()
    }
    for drop in (0, 7, 39):  # light, mid, heaviest contributor
        got = {
            r.grp: r.noisy_n
            for r in dp_noisy_counts(
                _toy(spark, drop_user=drop), "grp", "user_id", ["ts", "event_id"]
            ).collect()
        }
        for g in base:
            assert abs(base[g] - got[g]) <= DP_CAP, (drop, g)


def test_cap_enforced_and_noise_deterministic(spark):
    df = _toy(spark)
    out1 = dp_noisy_counts(df, "grp", "user_id", ["ts", "event_id"]).collect()
    out2 = dp_noisy_counts(df, "grp", "user_id", ["ts", "event_id"]).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    # capped_n = noisy_n - noise must equal the hand-computed capped count
    caps = {r.grp: r.noisy_n - r.noise for r in out1}
    want = {}
    for u in range(40):
        want[f"g{u % 4}"] = want.get(f"g{u % 4}", 0) + min(u + 1, DP_CAP)
    assert caps == want
    # a different seed yields different noise somewhere
    out3 = dp_noisy_counts(
        df, "grp", "user_id", ["ts", "event_id"], seed="release-2"
    ).collect()
    assert {(r.grp, r.noise) for r in out3} != {(r.grp, r.noise) for r in out1}


def test_noise_scale_matches_mechanism(spark):
    """Across many groups, the empirical mean |noise| sits near the
    two-sided-geometric expectation 2p/((1+p)(1-p)) for p=e^{-eps/cap}."""
    rows = [(i, i, f"g{i}", float(i)) for i in range(4000)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, grp string, ts double"
    )
    out = dp_noisy_counts(
        df, "grp", "user_id", ["ts", "event_id"], cap=4, eps=1.0
    ).collect()
    p = math.exp(-1.0 / 4)
    expected = 2 * p / ((1 + p) * (1 - p))
    mean_abs = sum(abs(r.noise) for r in out) / len(out)
    assert 0.6 * expected <= mean_abs <= 1.4 * expected, (mean_abs, expected)
    # unbiased-ish: mean noise small relative to its std
    mean = sum(r.noise for r in out) / len(out)
    assert abs(mean) < 0.5
