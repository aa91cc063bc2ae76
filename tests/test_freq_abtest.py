"""Heavy hitters / CMS / skew profile / A/B z-test semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from trafsys_data_transfer_spark.operators import abtest, freq


def _ev(eid, uid, etype="view"):
    return Row(event_id=eid, user_id=uid, event_type=etype,
               ts=dt.datetime(2024, 1, 1) + dt.timedelta(minutes=eid % 1440),
               value=0.0, props="{}")


def _run(spark, module, fn, rows):
    df = spark.createDataFrame(rows)
    orig = module.load_table
    try:
        module.load_table = lambda _s, _d, name: df
        return fn(spark, "unused").collect()
    finally:
        module.load_table = orig


def test_heavy_hitters_exact_ranks_and_shares(spark):
    rows, eid = [], 0
    for uid, n in ((1, 50), (2, 30), (3, 20)):
        for _ in range(n):
            eid += 1
            rows.append(_ev(eid, uid))
    out = _run(spark, freq, freq.events_heavy_hitters, rows)
    assert [(r["rnk"], r["user_id"], r["cnt"]) for r in out] == [
        (1, 1, 50), (2, 2, 30), (3, 3, 20)]
    assert out[0]["share_ppm"] == 50 * 1_000_000 // 100


def test_cms_estimates_bound_exact_counts(spark, sf_dir):
    """The registered row is now a strict certificate: the in-band
    booleans assert the sketch guarantees (est >= exact always; overshoot
    capped by ceil(eps*N)) and must all be TRUE on the fixture."""
    out = freq.events_heavy_hitters_cms(spark, sf_dir).collect()
    assert len(out) == freq.TOP_K
    for r in out:
        assert r["est_ge_exact"], r  # CMS never under-counts
        assert r["est_within_eps"], r
        assert r["exact_cnt"] > 0


def test_skew_profile_buckets_and_top1(spark):
    # uid 1: 8 events (bucket len(bin(8))=4); uids 2..5: 1 event each
    # (bucket 1).
    rows, eid = [], 0
    for _ in range(8):
        eid += 1
        rows.append(_ev(eid, 1))
    for uid in (2, 3, 4, 5):
        eid += 1
        rows.append(_ev(eid, uid))
    out = {r["log2_bucket"]: r for r in
           _run(spark, freq, freq.events_key_skew_profile, rows)}
    assert set(out) == {1, 4}
    assert out[1]["n_keys"] == 4 and out[1]["n_rows"] == 4
    assert out[4]["n_keys"] == 1 and out[4]["n_rows"] == 8
    assert out[4]["top1_share_ppm"] == 8 * 1_000_000 // 12


def test_ab_test_flags_planted_effect_and_not_null_effect(spark):
    # 200 even users (variant 0) and 200 odd users (variant 1); every
    # user views; variant 0 converts ("purchase") at 60%, variant 1 at
    # 10% -> massive real effect. A second metric ("click") converts
    # identically in both arms -> must NOT be significant.
    rows, eid = [], 0
    for uid in range(400):
        eid += 1
        rows.append(_ev(eid, uid, "view"))
        variant = uid % 2
        idx = uid // 2
        if (variant == 0 and idx % 5 < 3) or (variant == 1 and idx % 10 == 0):
            eid += 1
            rows.append(_ev(eid, uid, "purchase"))
        if idx % 4 == 0:
            eid += 1
            rows.append(_ev(eid, uid, "click"))
    out = {r["event_type"]: r for r in
           _run(spark, abtest, abtest.events_ab_test, rows)}
    p = out["purchase"]
    assert p["n1"] == 200 and p["n2"] == 200
    assert p["c1"] == 120 and p["c2"] == 20
    assert p["rate1_ppm"] == 600_000 and p["rate2_ppm"] == 100_000
    assert p["significant"]
    assert not out["click"]["significant"]
    assert out["click"]["z2_ppm"] == 0  # identical arms: zero statistic
    v = out["view"]
    assert v["c1"] == v["n1"] and v["c2"] == v["n2"]  # everyone views
    assert not v["significant"]


def test_ab_test_fixture_uniform_generator_not_significant(spark, sf_dir):
    out = abtest.events_ab_test(spark, sf_dir).collect()
    assert out and not any(r["significant"] for r in out)


def test_ab_test_z2_exact_past_bigint_headroom(spark):
    """ADVICE r05 #5 regression: at arm sizes where the old BIGINT form
    overflowed (~55 k users/arm), the DECIMAL(38,0) expression must
    return the exact floor-divided statistic, matching Python's
    arbitrary-precision integers, in both engines."""
    import duckdb

    cases = [
        (600_000, 100_000, 1_000_000, 1_000_000),    # big effect, 1M/arm
        (100_000, 100_200, 70_000_000, 70_000_000),  # tiny diff, huge n
        (55_000, 1_000, 60_000, 60_000),             # just past old bound
    ]
    duck_expr = abtest.Z2_EXPR.replace(
        "DECIMAL(38,0)", "HUGEINT"
    ).replace(" div ", " // ")
    for c1, c2, n1, n2 in cases:
        want = ((c1 * n2 - c2 * n1) ** 2 * (n1 + n2) * 1_000_000) // (
            n1 * n2 * (c1 + c2) * (n1 + n2 - c1 - c2)
        )
        got = (
            spark.createDataFrame(
                [(c1, c2, n1, n2)], "c1 long, c2 long, n1 long, n2 long"
            )
            .selectExpr(f"{abtest.Z2_EXPR} AS z2")
            .first()["z2"]
        )
        assert got == want, (c1, c2, n1, n2, got, want)
        duck = duckdb.sql(
            f"SELECT CAST({duck_expr} AS BIGINT) AS z2 FROM (SELECT "
            f"{c1} AS c1, {c2} AS c2, {n1} AS n1, {n2} AS n2)"
        ).fetchone()[0]
        assert duck == want, (c1, c2, n1, n2, duck, want)


def test_misra_gries_partial_classic_bound():
    """Pure-python MG on a known stream: counters never exceed true
    counts and heavy keys survive."""
    from trafsys_data_transfer_spark.operators.freq import (
        misra_gries_partial,
    )

    stream = [1] * 60 + [2] * 25 + list(range(100, 160))  # n=145
    mg = misra_gries_partial(stream, k=4)
    assert mg.get(1, 0) <= 60 and mg.get(1, 0) >= 60 - 145 // 5
    assert mg.get(2, 0) <= 25
    assert len(mg) <= 4
    # any key with true count > n/(k+1)=29 MUST be present
    assert 1 in mg


def test_misra_gries_merge_keeps_guarantee():
    """Merging arbitrary splits of a stream preserves est <= true and
    true - est <= n/(k+1) for every key."""
    import random as _r

    from trafsys_data_transfer_spark.operators.freq import (
        misra_gries_merge,
        misra_gries_partial,
    )

    rng = _r.Random(7)
    stream = (
        [1] * 500 + [2] * 300 + [3] * 120
        + [rng.randrange(1000, 1400) for _ in range(1080)]
    )
    rng.shuffle(stream)
    k = 16
    truth: dict = {}
    for x in stream:
        truth[x] = truth.get(x, 0) + 1
    for n_parts in (2, 5, 9):
        cut = len(stream) // n_parts
        merged: dict = {}
        for i in range(n_parts):
            part = stream[i * cut : (i + 1) * cut if i < n_parts - 1 else len(stream)]
            merged = misra_gries_merge(
                merged, misra_gries_partial(part, k), k
            )
        assert len(merged) <= k
        bound = len(stream) // (k + 1)
        for key, t in truth.items():
            est = merged.get(key, 0)
            assert est <= t, (key, est, t)
            assert est >= t - bound, (key, est, t, bound)


def test_misra_gries_topk_certificate(spark, sf_dir):
    out = freq.events_misra_gries_topk(spark, sf_dir).collect()
    assert len(out) == freq.TOP_K
    for r in out:
        assert r["mg_le_exact"], r
        assert r["mg_within_bound"], r


def test_streaming_misra_gries_matches_batch_guarantees(spark, sf_dir):
    """The drained stored-partials fold must satisfy the same guarantee
    booleans as the batch tier (batch-split invariance across
    micro-batches)."""
    from trafsys_data_transfer_spark.streaming.queries import (
        streaming_misra_gries_topk,
    )

    out = streaming_misra_gries_topk(spark, sf_dir).collect()
    assert len(out) == 10
    for r in out:
        assert r["mg_le_exact"] and r["mg_within_bound"], r
