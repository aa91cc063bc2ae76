"""Boundary correctness of deterministic hash sampling.

Regression tests for the ``frac >= 1.0`` defect: the old
``format(int(1.0 * 16**8), "08x")`` produced the 9-char string
``'100000000'``; comparing it lexicographically against an 8-char md5
prefix keeps only hashes starting '0' (~6.25%), silently dropping ~94%
of rows that were supposed to be kept wholesale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from trafsys_data_transfer_spark.operators.sampling import (
    _hex_threshold,
    deterministic_sample,
    stratified_sample,
)
from trafsys_data_transfer_spark.sources.fixtures import load_table


def test_hex_threshold_boundaries():
    # keep-all sentinel sorts after every 8-char hex string
    assert _hex_threshold(1.0) == "g"
    assert _hex_threshold(1.5) == "g"
    assert "ffffffff" < _hex_threshold(1.0)
    # keep-none floor
    assert _hex_threshold(0.0) == "00000000"
    # interior fractions unchanged: 8 hex chars, monotone
    assert _hex_threshold(0.5) == "80000000"
    assert len(_hex_threshold(0.1)) == 8
    assert _hex_threshold(0.1) < _hex_threshold(0.9)


def test_deterministic_sample_frac_one_keeps_everything(spark):
    df = spark.range(0, 5000)
    assert deterministic_sample(df, F.col("id"), 1.0).count() == df.count()


def test_deterministic_sample_frac_zero_keeps_nothing(spark):
    df = spark.range(0, 1000)
    assert deterministic_sample(df, F.col("id"), 0.0).count() == 0


def test_stratified_sample_retains_full_rare_strata(spark):
    """A stratum with fraction 1.0 must survive intact — the whole point of
    stratified rebalancing is keeping every rare-class row."""
    df = spark.range(0, 3000).select(
        F.col("id"),
        F.when(F.col("id") % 100 == 0, F.lit("rare"))
        .otherwise(F.lit("common"))
        .alias("stratum"),
    )
    n_rare = df.filter(F.col("stratum") == "rare").count()
    sampled = stratified_sample(
        df, F.col("id"), F.col("stratum"), {"rare": 1.0, "common": 0.1}
    )
    assert sampled.filter(F.col("stratum") == "rare").count() == n_rare
    n_common = sampled.filter(F.col("stratum") == "common").count()
    assert 0.05 * 2970 < n_common < 0.2 * 2970  # ~10% of 2970, loose bound


def test_mixture_rates_downsample_dominant_domains_hardest(spark):
    from trafsys_data_transfer_spark.operators.sampling import mixture_rates

    df = spark.range(0, 1100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 1000, F.lit("big")).otherwise(F.lit("small")).alias("lang"),
    )
    rates = {r["lang"]: r["thr_hex"] for r in mixture_rates(df).collect()}
    # sqrt temperature: the dominant domain gets the lower keep-threshold
    assert rates["big"] < rates["small"]
    # rate_small = 550 * 10 / (41 * 100) > 1 → clamped to the keep-(almost)-all
    # threshold 'ffffffff', never a 9-char hex string
    assert rates["small"] == "ffffffff"
    assert len(rates["big"]) == 8


def test_mixture_sample_is_deterministic_across_runs(spark, sf_dir):
    from trafsys_data_transfer_spark.operators.sampling import docs_mixture_sample

    a = [tuple(r) for r in docs_mixture_sample(spark, sf_dir).collect()]
    b = [tuple(r) for r in docs_mixture_sample(spark, sf_dir).collect()]
    assert a == b and len(a) > 0


def test_stratified_event_sample_keeps_all_rare_events(spark, sf_dir):
    from trafsys_data_transfer_spark.operators.sampling import (
        stratified_event_sample,
    )

    events = load_table(spark, sf_dir, "events")
    rare = events.filter(
        F.col("event_type").isin("signup", "purchase", "error")
    ).count()
    out = stratified_event_sample(spark, sf_dir)
    kept_rare = out.filter(
        F.col("event_type").isin("signup", "purchase", "error")
    ).count()
    assert kept_rare == rare


def test_stratified_sample_exact_quota_and_min_one(spark, sf_dir):
    """Every stratum yields exactly floor(n/5) rows (min 1); rare strata
    survive."""
    from trafsys_data_transfer_spark.operators.sampling import (
        STRAT_SAMPLE_DEN,
        STRAT_SAMPLE_NUM,
        docs_stratified_sample,
    )
    from trafsys_data_transfer_spark.sources.fixtures import load_table

    out = docs_stratified_sample(spark, sf_dir)
    got = {
        r.lang: r.n
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    sizes = {
        r.lang: r.n
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(got) == set(sizes)  # no stratum dropped
    for lang, n in sizes.items():
        want = max(1, n * STRAT_SAMPLE_NUM // STRAT_SAMPLE_DEN)
        assert got[lang] == want, (lang, got[lang], want)


def test_epoch_upsample_accounting(spark, sf_dir):
    """Replica totals hit the schedule exactly: every doc appears
    floor(w) times, plus one more iff its hash bucket clears frac(w);
    per-source epoch mass matches the brute-force recount."""
    from trafsys_data_transfer_spark.operators.sampling import (
        _hex_threshold,
        docs_epoch_upsample,
    )
    from trafsys_data_transfer_spark.sources.fixtures import load_table
    import hashlib

    out = docs_epoch_upsample(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source"
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r.doc_id, []).append(r.rep_idx)
    for d in docs:
        num = int(d.source[3:])
        w10 = 10 + (num * 7) % 23
        h = hashlib.md5(str(d.doc_id).encode()).hexdigest()[:8]
        want = w10 // 10 + (1 if h < _hex_threshold((w10 % 10) / 10) else 0)
        assert sorted(got[d.doc_id]) == list(range(1, want + 1)), d.doc_id
