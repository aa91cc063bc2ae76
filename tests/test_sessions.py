"""Sessionization: batch gaps-and-islands vs stateful streaming — the two
implementations must agree on closed sessions."""

from __future__ import annotations

import json
import os
import tempfile
import uuid

from pyspark.sql import functions as F

from trafsys_data_transfer_spark.operators.sessions import sessionize_batch
from trafsys_data_transfer_spark.sources.fixtures import load_table
from trafsys_data_transfer_spark.streaming.sessionize import sessionize_stream


def test_batch_sessionize_splits_on_gap(spark):
    rows = [
        (1, 100, "2024-01-01T10:00:00"),
        (1, 101, "2024-01-01T10:10:00"),
        (1, 102, "2024-01-01T11:30:00"),  # > 30 min gap → new session
        (2, 200, "2024-01-01T09:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts_s string").select(
        "user_id", "event_id", F.to_timestamp("ts_s").alias("ts")
    )
    out = {
        (r.user_id, r.session_no): (r.session_start.isoformat(), r.n_events)
        for r in sessionize_batch(df).collect()
    }
    assert out == {
        (1, 1): ("2024-01-01T10:00:00", 2),
        (1, 2): ("2024-01-01T11:30:00", 1),
        (2, 1): ("2024-01-01T09:00:00", 1),
    }


def test_session_window_native_matches_gaps_and_islands(spark, sf_dir):
    """The built-in session_window operator must produce exactly the
    sessions of the gaps-and-islands plan, including the boundary rule:
    events exactly GAP apart merge (> gap ⇒ new session)."""
    from trafsys_data_transfer_spark.registry import all_queries
    from trafsys_data_transfer_spark.sources.fixtures import load_table

    native = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in all_queries()["events_session_window_native"]
        .build(spark, sf_dir)
        .collect()
    }
    gi = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize_batch(load_table(spark, sf_dir, "events")).collect()
    }
    assert native == gi and len(native) > 0


def test_session_window_boundary_exactly_gap_merges(spark):
    rows = [
        (1, "2024-01-01T10:00:00"),
        (1, "2024-01-01T10:30:00"),  # exactly 30 min later → SAME session
        (1, "2024-01-01T11:00:01"),  # 30 min + 1 s → new session
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_s string").select(
        "user_id", F.to_timestamp("ts_s").alias("ts")
    )
    out = sorted(
        (r.session_start.isoformat(), r.n_events)
        for r in df.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .collect()
    )
    assert out == [("2024-01-01T10:00:00", 2), ("2024-01-01T11:00:01", 1)]


def test_streaming_sessionize_matches_batch(spark):
    """Drive the stateful operator across two checkpointed AvailableNow
    passes; closed sessions must equal the batch computation's (open
    sessions excluded — flushed with a far-future sentinel)."""
    source = tempfile.mkdtemp(prefix="t_sess_src_")
    ckpt = tempfile.mkdtemp(prefix="t_sess_ckpt_")
    out_dir = tempfile.mkdtemp(prefix="t_sess_out_") + "/out"

    def drop(records, name):
        with open(os.path.join(source, name), "w") as f:
            for user, ts in records:
                f.write(json.dumps({"user_id": user, "ts": ts}) + "\n")

    batch1 = [
        (1, "2024-01-01T10:00:00"), (1, "2024-01-01T10:05:00"),
        (2, "2024-01-01T10:00:00"),
    ]
    batch2 = [
        (1, "2024-01-01T12:00:00"),  # closes user 1's first session
        (2, "2024-01-01T10:20:00"),  # extends user 2's session
    ]
    sentinel = [(1, "2030-01-01T00:00:00"), (2, "2030-01-01T00:00:00")]

    stream = spark.readStream.schema("user_id long, ts timestamp").json(source)
    writer = (
        sessionize_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
    )

    drop(batch1, "b1.json")
    q = writer.trigger(availableNow=True).start(); q.awaitTermination()
    drop(batch2, "b2.json")
    drop(sentinel, "b3.json")
    q = writer.trigger(availableNow=True).start(); q.awaitTermination()

    streamed = {
        (r.user_id, r.session_start.isoformat(), r.session_end.isoformat(), r.n_events)
        for r in spark.read.parquet(out_dir).collect()
    }

    all_rows = [
        (u, i, ts) for i, (u, ts) in enumerate(batch1 + batch2 + sentinel)
    ]
    bdf = spark.createDataFrame(all_rows, "user_id long, event_id long, ts_s string").select(
        "user_id", "event_id", F.to_timestamp("ts_s").alias("ts")
    )
    batch_closed = {
        (r.user_id, r.session_start.isoformat(), r.session_end.isoformat(), r.n_events)
        for r in sessionize_batch(bdf).collect()
        if r.session_start.year < 2030  # sentinel-only sessions stay open
    }
    assert streamed == batch_closed
    # Sanity on the actual content, not just equality:
    assert (1, "2024-01-01T10:00:00", "2024-01-01T10:05:00", 2) in streamed
    assert (2, "2024-01-01T10:00:00", "2024-01-01T10:20:00", 2) in streamed


def test_idle_session_flushed_by_event_time_timeout(spark):
    """User 1 goes idle; only OTHER users' events advance the watermark.
    The idle session must still be emitted (state bounded at scale)."""
    import json as _json

    source = tempfile.mkdtemp(prefix="t_tmo_src_")
    ckpt = tempfile.mkdtemp(prefix="t_tmo_ckpt_")
    out_dir = tempfile.mkdtemp(prefix="t_tmo_out_") + "/out"

    def drop(records, name):
        with open(os.path.join(source, name), "w") as f:
            for user, ts in records:
                f.write(_json.dumps({"user_id": user, "ts": ts}) + "\n")

    stream = spark.readStream.schema("user_id long, ts timestamp").json(source)
    writer = (
        sessionize_stream(stream, lateness="10 minutes")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
    )

    drop([(1, "2024-01-01T10:00:00"), (1, "2024-01-01T10:05:00")], "b1.json")
    q = writer.trigger(availableNow=True).start(); q.awaitTermination()
    # Watermark pushed far past user 1's gap horizon by user 2 only.
    drop([(2, "2024-01-02T00:00:00")], "b2.json")
    q = writer.trigger(availableNow=True).start(); q.awaitTermination()
    # One more pass: timeouts fire on the batch AFTER the watermark advance.
    drop([(2, "2024-01-03T00:00:00")], "b3.json")
    q = writer.trigger(availableNow=True).start(); q.awaitTermination()

    rows = {
        (r.user_id, r.session_start.isoformat(), r.session_end.isoformat(), r.n_events)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert (1, "2024-01-01T10:00:00", "2024-01-01T10:05:00", 2) in rows


def test_sessionize_incremental_equals_full_recompute_any_cutoff(spark, sf_dir):
    """Property: for several cutoffs (including degenerate ones) the
    incremental apply is row-identical to the full recompute —
    carried-session extension, renumbering, new-user and quiet-user
    paths all covered by the fixture."""
    from trafsys_data_transfer_spark.operators.sessions import (
        sessionize_batch,
        sessionize_incremental,
    )

    events = load_table(spark, sf_dir, "events")
    lo, hi = events.agg(
        F.min(F.col("ts").cast("long")), F.max(F.col("ts").cast("long"))
    ).first()
    full = {
        tuple(r) for r in sessionize_batch(events).collect()
    }
    for frac in (0.0, 0.33, 0.66, 0.95, 1.0):
        cutoff = int(lo + (hi - lo + 1) * frac)
        prior = sessionize_batch(
            events.filter(F.col("ts").cast("long") < cutoff)
        )
        inc = sessionize_incremental(
            prior, events.filter(F.col("ts").cast("long") >= cutoff), cutoff
        )
        assert {tuple(r) for r in inc.collect()} == full, frac
