"""Custom Spark DataSource for the TrafSys API: partitioned reads, option
validation, executor-side 401 retry — all against a stub transport
(instances are pickled to the Python worker, so the stub rides a class
attribute exactly as production's urllib transport does)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from trafsys_data_transfer_spark.plans.traffic import normalize_traffic
from trafsys_data_transfer_spark.sources.datasource import TrafsysDataSource

BASE = "https://example.test/rest"


def _record(day: str, site: str = "S1", ins: int = 5):
    return {
        "SiteCode": site,
        "Location": "door",
        "IsInternal": False,
        "PeriodEnding": f"{day}T10:00:00",
        "Ins": ins,
        "Outs": 2,
    }


def _stub_transport(fail_first_get: bool = False):
    state = {"gets": 0}

    def transport(method, url, params=None, data=None, headers=None):
        if method == "POST" and url.endswith("token"):
            return 200, json.dumps(
                {
                    "access_token": "tok",
                    ".expires": "Mon, 06 Jan 2125 12:00:00 GMT",
                }
            )
        assert headers["Authorization"].startswith("Bearer ")
        state["gets"] += 1
        if fail_first_get and state["gets"] == 1:
            return 401, "expired"
        # one record per window start-day; DateFrom drives the payload
        return 200, json.dumps([_record(params["DateFrom"])])

    return transport


class StubSource(TrafsysDataSource):
    transport_factory = staticmethod(lambda: _stub_transport())

    @classmethod
    def name(cls):
        return "trafsys_stub"


class Stub401Source(TrafsysDataSource):
    transport_factory = staticmethod(lambda: _stub_transport(fail_first_get=True))

    @classmethod
    def name(cls):
        return "trafsys_stub_401"


def _read(spark, source, date_from="2024-01-01", date_to="2024-01-20", **opts):
    # DataSource classes are pickled BY REFERENCE (module + qualname), so
    # the Python worker must be able to import this test module.
    spark.sparkContext.addPyFile(__file__)
    spark.dataSource.register(source)
    reader = (
        spark.read.format(source.name())
        .option("url", BASE)
        .option("user", "u")
        .option("password", "p")
        .option("date_from", date_from)
        .option("date_to", date_to)
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


def test_partitioned_read_covers_window(spark):
    """A 20-day window at 7 days/chunk → 3 partitions, one GET each; the
    union is schema-typed raw records ready for normalize_traffic."""
    df = _read(spark, StubSource)
    rows = df.collect()
    assert {r["PeriodEnding"] for r in rows} == {
        "2024-01-01T10:00:00", "2024-01-08T10:00:00", "2024-01-15T10:00:00"
    }
    assert df.rdd.getNumPartitions() == 3
    assert [f.name for f in df.schema.fields] == [
        "SiteCode", "Location", "IsInternal", "PeriodEnding", "Ins", "Outs"
    ]
    norm = normalize_traffic(df)
    assert norm.filter(F.col("PeriodEnding").isNull()).count() == 0
    assert norm.schema["IsInternal"].dataType.simpleString() == "int"


def test_single_day_window_is_one_partition(spark):
    df = _read(spark, StubSource, date_from="2024-02-01", date_to="2024-02-01")
    assert df.rdd.getNumPartitions() == 1
    assert df.count() == 1


def test_executor_side_401_retry(spark):
    """First GET in the worker answers 401: the reader sleeps, re-auths and
    retries once (script.js:243-254) — the rows still arrive."""
    df = _read(
        spark, Stub401Source, date_from="2024-03-01", date_to="2024-03-01"
    )
    assert df.count() == 1


def test_stream_reader_offsets_are_the_watermark(spark):
    """readStream over the API: the checkpoint offset is the reference's
    NeDB watermark.  First drain fetches every complete window; a second
    drain from the SAME checkpoint fetches nothing new (offset held);
    extending date_to and re-draining fetches only the new days."""
    import tempfile

    from trafsys_data_transfer_spark.sources.offline import OfflineTrafsysSource

    # The streaming source runner imports the class by MODULE PATH (no
    # cloudpickle-by-value), so the offline source lives in the package.
    spark.dataSource.register(OfflineTrafsysSource)
    ckpt = tempfile.mkdtemp(prefix="t_ds_stream_ckpt_")
    out = tempfile.mkdtemp(prefix="t_ds_stream_out_") + "/sink"

    def drain(date_to):
        q = (
            spark.readStream.format("trafsys_offline")
            .option("url", BASE)
            .option("user", "u")
            .option("password", "p")
            .option("date_from", "2024-01-01")
            .option("date_to", date_to)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r["PeriodEnding"] for r in spark.read.parquet(out).collect()}

    first = drain("2024-01-20")
    assert first == {
        "2024-01-01T10:00:00", "2024-01-08T10:00:00", "2024-01-15T10:00:00"
    }
    assert drain("2024-01-20") == first  # caught up → no new rows
    # Watermark resumes at Jan 21 (day after the drained Jan 1-20 window):
    # new 7-day windows start Jan 21 and Jan 28 — only the new days fetch.
    extended = drain("2024-02-01")
    assert extended == first | {"2024-01-21T10:00:00", "2024-01-28T10:00:00"}


def test_api_stream_feeds_nightly_merge_pipeline(spark):
    """Capstone: the registered streaming API source drains straight into
    the nightly MERGE sink — fetch → normalize → dedupe → last-write-wins
    upsert, with incremental pickup riding the source's checkpoint offset.
    A re-drain over an extended window adds only the new days and leaves
    prior state untouched (the reference's whole nightly loop, one query)."""
    import tempfile

    from trafsys_data_transfer_spark.sources.offline import OfflineTrafsysSource
    from trafsys_data_transfer_spark.streaming.incremental import run_stream_merge

    spark.dataSource.register(OfflineTrafsysSource)
    ckpt = tempfile.mkdtemp(prefix="t_api_merge_ckpt_")
    target = tempfile.mkdtemp(prefix="t_api_merge_tgt_") + "/target"

    def stream(date_to):
        return (
            spark.readStream.format("trafsys_offline")
            .option("url", BASE)
            .option("user", "u")
            .option("password", "p")
            .option("date_from", "2024-01-01")
            .option("date_to", date_to)
            .load()
        )

    run_stream_merge(stream("2024-01-14"), target, ckpt)
    first = {
        r["PeriodEnding"].isoformat(): r["Ins"]
        for r in spark.read.parquet(target).collect()
    }
    assert first == {"2024-01-01T10:00:00": 5, "2024-01-08T10:00:00": 5}

    run_stream_merge(stream("2024-01-21"), target, ckpt)
    final = {
        r["PeriodEnding"].isoformat(): r["Ins"]
        for r in spark.read.parquet(target).collect()
    }
    assert final == dict(first, **{"2024-01-15T10:00:00": 5})


def test_stream_backfill_caps_micro_batches(spark, tmp_path):
    """max_days_per_batch bounds each committed batch of a backfill: with
    Trigger.AvailableNow each INVOCATION advances the watermark by at most
    the cap (the Simple-reader prefetch is snapshotted per run), so a
    21-day window at a 7-day cap catches up over 3 scheduled runs instead
    of one giant batch — the reference's own nightly cadence."""
    import tempfile

    from trafsys_data_transfer_spark.sources.offline import OfflineTrafsysSource

    spark.dataSource.register(OfflineTrafsysSource)
    ckpt = tempfile.mkdtemp(prefix="t_cap_ckpt_")
    out = tempfile.mkdtemp(prefix="t_cap_out_") + "/sink"

    def drain():
        q = (
            spark.readStream.format("trafsys_offline")
            .option("url", BASE)
            .option("user", "u")
            .option("password", "p")
            .option("date_from", "2024-01-01")
            .option("date_to", "2024-01-21")
            .option("max_days_per_batch", "7")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r["PeriodEnding"] for r in spark.read.parquet(out).collect()}

    assert drain() == {"2024-01-01T10:00:00"}
    assert drain() == {"2024-01-01T10:00:00", "2024-01-08T10:00:00"}
    assert drain() == {
        "2024-01-01T10:00:00", "2024-01-08T10:00:00", "2024-01-15T10:00:00"
    }
    assert len(drain()) == 3  # caught up: further runs are no-ops


def test_cli_stream_mode_offline(spark, monkeypatch, tmp_path):
    """`python -m trafsys_data_transfer_spark --mode stream` with the
    offline transport: the reference CLI surface drives the streaming
    source through the MERGE sink end to end, and a second invocation
    resumes from the checkpoint watermark (no duplicate work)."""
    from trafsys_data_transfer_spark.__main__ import main

    target = str(tmp_path / "target")
    runlog = str(tmp_path / "runlog")
    for k, v in {
        "TRAFSYS_URL": BASE,
        "TRAFSYS_USER": "u",
        "TRAFSYS_PASSWORD": "p",
        "TRAFSYS_TARGET_PATH": target,
        "TRAFSYS_RUN_LOG_PATH": runlog,
        "TRAFSYS_OFFLINE": "1",
    }.items():
        monkeypatch.setenv(k, v)

    assert main(["--mode", "stream", "--from", "2024-01-01", "--to", "2024-01-14"]) == 0
    days = {r["PeriodEnding"].isoformat() for r in spark.read.parquet(target).collect()}
    assert days == {"2024-01-01T10:00:00", "2024-01-08T10:00:00"}

    assert main(["--mode", "stream", "--from", "2024-01-01", "--to", "2024-01-21"]) == 0
    days2 = {r["PeriodEnding"].isoformat() for r in spark.read.parquet(target).collect()}
    assert days2 == days | {"2024-01-15T10:00:00"}


def test_missing_options_fail_loudly(spark):
    spark.dataSource.register(StubSource)
    with pytest.raises(Exception, match="missing options"):
        (
            spark.read.format("trafsys_stub")
            .option("url", BASE)
            .option("date_from", "2024-01-01")
            .option("date_to", "2024-01-02")
            .load()
            .collect()
        )
