"""Inline observe-based quality gating: metrics ride the sink action, the
gate raises on violated invariants, clean batches pass through."""

from __future__ import annotations

import pytest

from trafsys_data_transfer_spark.operators.observe import (
    QualityViolation,
    assert_traffic_quality,
    observe_traffic_quality,
)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows,
        "SiteCode string, Location string, IsInternal int, "
        "PeriodEnding timestamp, Ins long, Outs long",
    )


def _rec(site="S1", loc="door", ins=5, outs=2, pe="2024-01-01 10:00:00"):
    import datetime as dt

    return (site, loc, 0, dt.datetime.fromisoformat(pe), ins, outs)


def test_clean_batch_passes_and_reports_watermark(spark):
    df, obs = observe_traffic_quality(
        _batch(spark, [_rec(), _rec(pe="2024-01-02 11:00:00")])
    )
    assert df.count() == 2  # the action that materializes the metrics
    m = assert_traffic_quality(obs.get)
    assert m["n_rows"] == 2 and m["n_null_pk"] == 0
    assert m["max_period_ending"].isoformat() == "2024-01-02T11:00:00"


def test_null_pk_batch_raises(spark):
    df, obs = observe_traffic_quality(_batch(spark, [_rec(site=None), _rec()]))
    df.count()
    with pytest.raises(QualityViolation, match="null PK"):
        assert_traffic_quality(obs.get)


def test_negative_counts_raise(spark):
    df, obs = observe_traffic_quality(_batch(spark, [_rec(ins=-1)]))
    df.count()
    with pytest.raises(QualityViolation, match="negative"):
        assert_traffic_quality(obs.get)


def test_observe_rides_the_sink_action(spark, tmp_path):
    """Metrics must come from the SAME action as the write — no extra
    scan: write the observed frame, then read the metrics."""
    df, obs = observe_traffic_quality(_batch(spark, [_rec(), _rec(ins=7)]))
    df.write.mode("overwrite").parquet(str(tmp_path / "sink"))
    m = assert_traffic_quality(obs.get)
    assert m["n_rows"] == 2
