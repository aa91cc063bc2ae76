"""Format federation: adversarial text round-trip and leg accounting."""

from __future__ import annotations

import datetime as dt
import os
import tempfile
import uuid

from pyspark.sql import functions as F


def _stage_custom(spark, rows):
    """Stage an events-shaped table through the federation writer."""
    from trafsys_data_transfer_spark.sources import federation as fed

    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = os.path.join(tempfile.gettempdir(), f"fed_t_{uuid.uuid4().hex[:8]}")
    df.write.parquet(os.path.join(d, "events.parquet"))
    return fed.stage_federated_events(spark, d), df


def test_adversarial_text_and_precision_roundtrip(spark):
    """Commas, RFC-4180 doubled quotes, unicode, empty strings and
    full-precision doubles survive every leg."""
    from trafsys_data_transfer_spark.sources.federation import (
        read_federated_events,
    )

    t0 = dt.datetime(2024, 3, 1, 12, 0, 0, 123456)
    nasty = [
        '{"a": "x,y"}',
        'he said "hi, there"',
        "tab\tand ; semi",
        "",
        "ünïcodé ✓",
        '{"nested": {"q": "\\"deep\\""}}',
    ]
    rows = [
        (i, t0 + dt.timedelta(seconds=i), i, "t", 1.0 / 3 + i * 1e-13, nasty[i])
        for i in range(6)
    ]
    root, df = _stage_custom(spark, rows)
    back = read_federated_events(spark, root)
    got = sorted(
        (r.event_id, r.ts, r.user_id, r.event_type, r.value, r.props)
        for r in back.collect()
    )
    want = sorted(map(tuple, df.collect()))
    assert got == want
    # each leg non-empty under the %3 slicing
    fmts = {r.src_format for r in back.collect()}
    assert fmts == {"parquet", "csv", "json"}


def test_leg_accounting_on_fixture(spark, sf_dir):
    from trafsys_data_transfer_spark.sources.federation import (
        read_federated_events,
        stage_federated_events,
    )
    from trafsys_data_transfer_spark.sources.fixtures import load_table

    root = stage_federated_events(spark, sf_dir)
    back = read_federated_events(spark, root)
    n = load_table(spark, sf_dir, "events").count()
    per = {r.src_format: r.n for r in back.groupBy("src_format").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(per.values()) == n
    assert all(v > 0 for v in per.values())
