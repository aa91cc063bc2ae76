"""End-to-end nightly-run pipeline tests: watermark precedence/chaining,
write-then-log ordering, replay + late-correction through the full path
(reference control flow, /root/reference/script.js:228-266)."""

from __future__ import annotations

import datetime as dt

import pytest

from trafsys_data_transfer_spark.plans.pipeline import read_target, run_pipeline
from trafsys_data_transfer_spark.plans.watermark import RunLog, resolve_window
from trafsys_data_transfer_spark.schemas import TRAFFIC_RAW_SCHEMA

TODAY = dt.date(2024, 2, 1)


def _fetcher(spark, rows_by_window):
    """Source stub: returns raw-shaped records per requested window —
    stands in for getTrafsysData (script.js:141-166)."""

    def fetch(date_from, date_to):
        rows = rows_by_window.get((date_from, date_to), [])
        return spark.createDataFrame(rows, schema=TRAFFIC_RAW_SCHEMA)

    return fetch


def _raw(site, loc, iso, ins, outs, internal=False):
    return {
        "SiteCode": site,
        "Location": loc,
        "IsInternal": internal,
        "PeriodEnding": iso,
        "Ins": ins,
        "Outs": outs,
    }


def test_resolve_window_precedence():
    # first run, no args: yesterday..yesterday (script.js:12, 54-55)
    assert resolve_window(None, today=TODAY) == ("2024-01-31", "2024-01-31")
    # CLI overrides everything (script.js:53-58)
    assert resolve_window(None, "2024-01-01", "2024-01-05", TODAY) == (
        "2024-01-01",
        "2024-01-05",
    )


def test_incremental_chain_and_correction(spark, tmp_path):
    target = str(tmp_path / "target")
    log_path = str(tmp_path / "runlog")
    windows = {
        ("2024-01-31", "2024-01-31"): [
            _raw("A", "door", "2024-01-31T10:00:00", 5, 1),
            _raw("A", "door", "2024-01-31T11:00:00", 6, 2, internal=True),
        ],
        # next run: from == previous ToDate (boundary refetched, corrected)
        ("2024-01-31", "2024-02-01"): [
            _raw("A", "door", "2024-01-31T11:00:00", 60, 20),
            _raw("B", "door", "2024-02-01T09:00:00", 3, 3),
        ],
    }
    fetch = _fetcher(spark, windows)

    info1 = run_pipeline(spark, fetch, target, log_path, today=TODAY)
    assert (info1["FromDate"], info1["ToDate"], info1["Records"]) == (
        "2024-01-31",
        "2024-01-31",
        2,
    )

    # watermark chains: next default from == last ToDate
    info2 = run_pipeline(
        spark, fetch, target, log_path, today=TODAY + dt.timedelta(days=1)
    )
    assert info2["FromDate"] == "2024-01-31"
    assert info2["ToDate"] == "2024-02-01"

    st = {
        (r.SiteCode, r.PeriodEnding): (r.IsInternal, r.Ins, r.Outs)
        for r in read_target(spark, target).collect()
    }
    assert len(st) == 3
    # late correction applied in place (last write wins)
    assert st[("A", dt.datetime(2024, 1, 31, 11))] == (None, 60, 20) or st[
        ("A", dt.datetime(2024, 1, 31, 11))
    ][1:] == (60, 20)
    # untouched row survives, bool→int cast happened
    assert st[("A", dt.datetime(2024, 1, 31, 10))][1:] == (5, 1)
    assert st[("B", dt.datetime(2024, 2, 1, 9))][1:] == (3, 3)


def test_failed_run_does_not_advance_watermark(spark, tmp_path):
    """Write-then-log ordering (script.js:255-256): a failing sink leaves
    no log row, so the same window is retried next run."""
    target = str(tmp_path / "target")
    log_path = str(tmp_path / "runlog")

    def broken_fetch(date_from, date_to):
        raise RuntimeError("api down")

    with pytest.raises(RuntimeError):
        run_pipeline(spark, broken_fetch, target, log_path, today=TODAY)

    assert RunLog(spark, log_path).latest() is None

    # recovery run over the same window succeeds and logs
    fetch = _fetcher(
        spark,
        {("2024-01-31", "2024-01-31"): [_raw("A", "door", "2024-01-31T10:00:00", 1, 1)]},
    )
    info = run_pipeline(spark, fetch, target, log_path, today=TODAY)
    assert info["FromDate"] == "2024-01-31"
    assert RunLog(spark, log_path).latest()["Records"] == 1


def test_empty_batch_advances_watermark_without_sink(spark, tmp_path):
    """T5 (script.js:183): empty batch skips the sink but still logs the
    run — matching the reference, which logs runInfo unconditionally on
    the success path (script.js:256)."""
    target = str(tmp_path / "target")
    log_path = str(tmp_path / "runlog")
    fetch = _fetcher(spark, {})  # every window empty
    info = run_pipeline(spark, fetch, target, log_path, today=TODAY)
    assert info["Records"] == 0
    import os

    assert not os.path.exists(target)  # sink never created
    assert RunLog(spark, log_path).latest()["ToDate"] == "2024-01-31"


def test_approx_percentile_within_tolerance_of_exact(spark, sf_dir):
    """The t-digest estimate must land near the exact percentile (the
    rows-only bench query's accuracy claim)."""
    from pyspark.sql import functions as F
    from trafsys_data_transfer_spark.sources.fixtures import load_table

    events = load_table(spark, sf_dir, "events")
    row = events.agg(
        F.percentile("value", F.lit(0.95)).alias("exact"),
        F.approx_percentile("value", F.lit(0.95), F.lit(1000)).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / max(abs(row["exact"]), 1e-9) < 0.05


def test_approx_quantile_certificate_load_bearing(spark, sf_dir):
    """The strict per-group certificate holds on the real estimates, and
    a deliberately wrong estimate fails through the SAME helper — the
    within booleans are load-bearing, not decorative."""
    from pyspark.sql import functions as F
    from trafsys_data_transfer_spark.plans.relational import (
        approx_quantile_certificate,
        events_value_approx_quantiles,
    )
    from trafsys_data_transfer_spark.sources.fixtures import load_table

    good = events_value_approx_quantiles(spark, sf_dir).collect()
    assert good and all(r.p50_within and r.p95_within for r in good)

    events = load_table(spark, sf_dir, "events")
    vmax = events.agg(F.max("value")).first()[0]
    bogus = events.groupBy("event_type").agg(
        (F.max("value") + F.lit(1.0)).alias("p50_approx"),
        F.lit(float(vmax) + 1.0).alias("p95_approx"),
    )
    bad = approx_quantile_certificate(events, bogus).collect()
    assert all(not r.p50_within for r in bad)


def test_equidepth_certificate_band_is_tight(spark, sf_dir):
    """The depth band (2·ε·N + 1) is far narrower than an empty or doubled
    bucket's deviation (N/8), so a broken sketch CAN emit FALSE — the
    certificate boolean is reachable-negative, not tautological."""
    from trafsys_data_transfer_spark.operators.quantiles import EPS
    from trafsys_data_transfer_spark.sources.fixtures import load_table

    n = load_table(spark, sf_dir, "events").count()
    assert 2 * EPS * n + 1 < n / 8


def test_binary_file_ingestion(spark, tmp_path):
    from trafsys_data_transfer_spark.operators.multimodal import read_media_dir

    (tmp_path / "a.png").write_bytes(b"\x89PNG fake")
    (tmp_path / "b.wav").write_bytes(b"RIFF fake wav")
    (tmp_path / "notes.txt").write_text("not media")
    df = read_media_dir(spark, str(tmp_path), glob="*.{png,wav}")
    rows = {r["extension"]: bytes(r["payload"]) for r in df.collect()}
    assert rows == {"png": b"\x89PNG fake", "wav": b"RIFF fake wav"}
