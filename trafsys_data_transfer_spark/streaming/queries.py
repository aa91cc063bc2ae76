"""Correctness-gate queries for the streaming layer.

Both queries stage a deterministic traffic-shaped JSON drop derived from the
``events`` fixture, drain it through a real Structured Streaming query
(file source → checkpointed offsets → AvailableNow trigger), and return the
result as a batch DataFrame.  The DuckDB oracles are the *batch* semantics
over the same input — the assertion is stream == batch, the defining
property of a correctly incremental pipeline.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.traffic import normalize_traffic
from ..plans.traffic_queries import _TRAFFIC_CTE, traffic_raw_from_events
from ..registry import register
from ..sources.fixtures import load_table
from .incremental import (
    run_incremental_merge,
    run_rollup_to_memory,
    run_stream_dedup_to_memory,
    run_stream_stream_join_to_memory,
)


def _stage_raw_json(raw: DataFrame, prefix: str) -> str:
    """Land a raw traffic batch as a single JSON-lines file (one file → one
    deterministic micro-batch under AvailableNow)."""
    staging = tempfile.mkdtemp(prefix=prefix)
    raw.coalesce(1).write.mode("overwrite").json(staging)
    return staging


def _denormalize(df: DataFrame) -> DataFrame:
    """Normalized traffic → API-shaped raw rows (inverse of T1/T2), for
    staging derived batches back through the stream source."""
    return df.select(
        "SiteCode",
        "Location",
        F.col("IsInternal").cast("boolean").alias("IsInternal"),
        F.date_format("PeriodEnding", "yyyy-MM-dd'T'HH:mm:ss").alias("PeriodEnding"),
        "Ins",
        "Outs",
    )


@register(
    "streaming_hourly_rollup",
    oracle=f"""
    WITH {_TRAFFIC_CTE}
    SELECT SiteCode, Location,
           date_trunc('hour', PeriodEnding - INTERVAL 1 SECOND) + INTERVAL 1 HOUR AS PeriodEnding,
           CAST(SUM(Ins) AS BIGINT) AS Ins, CAST(SUM(Outs) AS BIGINT) AS Outs
    FROM traffic
    GROUP BY 1, 2, 3
    """,
)
def streaming_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 tumbling-window rollup via readStream: the streamed hour-ending
    sums must equal the batch rollup (traffic_hourly_rollup) on the same
    input."""
    raw = traffic_raw_from_events(load_table(spark, sf_dir, "events"))
    staging = _stage_raw_json(raw, "tds_stream_rollup_")
    table = f"stream_rollup_{uuid.uuid4().hex[:8]}"
    return run_rollup_to_memory(spark, staging, table)


@register(
    "streaming_dedup_events",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props FROM events
    """,
)
def streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming keyed dedup over an at-least-once feed: the events fixture
    is staged TWICE (two parquet drops — a full redelivery), drained through
    ``dropDuplicatesWithinWatermark(event_id)``, and the surviving stream
    must equal the original table exactly.  State expires with the
    watermark, so the operator holds keys-per-lateness-window, not the
    whole corpus — the §2.8 replay-tolerance invariant without an upsert
    sink."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    staging = tempfile.mkdtemp(prefix="tds_stream_dedup_")
    # Two identical drops = a full at-least-once redelivery of the feed.
    # The second drop is a byte-level copy of the first file (what a real
    # redelivery is), not a second write job.
    events.coalesce(1).write.mode("append").parquet(staging)
    part = next(
        f for f in os.listdir(staging)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    shutil.copyfile(
        os.path.join(staging, part), os.path.join(staging, f"redelivered-{part}")
    )
    table = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    return run_stream_dedup_to_memory(
        spark, staging, table, events.schema, keys=["event_id"]
    )


@register(
    "streaming_view_click_join",
    oracle="""
    SELECT v.event_id AS view_id, c.event_id AS click_id,
           v.user_id AS user_id, v.ts AS view_ts, c.ts AS click_ts
    FROM events v JOIN events c
      ON v.user_id = c.user_id
     AND v.event_type = 'view' AND c.event_type = 'click'
     AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 10 MINUTE
    """,
)
def streaming_view_click_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream attribution join: a view stream joined to a click
    stream on user with the click inside a 10-minute post-view window,
    both sides watermarked.  The fully-drained stream must emit exactly
    the batch inner join of the same inputs — the defining stream-stream
    correctness property.  Join state holds only rows within
    watermark + range bound per user, so the operator runs on unbounded
    feeds."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    views_dir = tempfile.mkdtemp(prefix="tds_ss_views_")
    clicks_dir = tempfile.mkdtemp(prefix="tds_ss_clicks_")
    events.filter(F.col("event_type") == "view").coalesce(1).write.mode(
        "append"
    ).parquet(views_dir)
    events.filter(F.col("event_type") == "click").coalesce(1).write.mode(
        "append"
    ).parquet(clicks_dir)
    table = f"stream_ssjoin_{uuid.uuid4().hex[:8]}"
    join_expr = (
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("r.ts") >= F.col("l.ts"))
        & (F.col("r.ts") <= F.col("l.ts") + F.expr("INTERVAL 10 MINUTES"))
    )
    select_cols = [
        F.col("l.event_id").alias("view_id"),
        F.col("r.event_id").alias("click_id"),
        F.col("l.user_id").alias("user_id"),
        F.col("l.ts").alias("view_ts"),
        F.col("r.ts").alias("click_ts"),
    ]
    return run_stream_stream_join_to_memory(
        spark, views_dir, clicks_dir, table, events.schema, join_expr, select_cols
    )


@register(
    "streaming_enrich_join",
    oracle="""
    SELECT e.event_id, e.user_id, e.event_type, e.value,
           c.c_name AS customer_name, c.c_mktsegment AS segment
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def streaming_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment — the most common production streaming
    shape: an unbounded event stream inner-joined to a bounded dimension
    table.  The join is STATELESS (no watermark, no state store): the
    static side is broadcast into every micro-batch, the stream side never
    shuffles, and output rows appear with per-batch latency.  The batch
    oracle certifies the drained stream equals the batch join exactly."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    customers = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("segment"),
    )
    staging = tempfile.mkdtemp(prefix="tds_stream_enrich_")
    events.coalesce(1).write.mode("append").parquet(staging)
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).parquet(staging)
    enriched = stream.join(F.broadcast(customers), "user_id").select(
        "event_id", "user_id", "event_type", "value", "customer_name", "segment"
    )
    table = f"stream_enrich_{uuid.uuid4().hex[:8]}"
    from .incremental import _stream_partitions

    with _stream_partitions(spark):
        q = (
            enriched.writeStream.format("memory")
            .queryName(table)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(table)


@register(
    "streaming_session_window",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > 1800
                         OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    numbered AS (
        SELECT user_id, ts,
               CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
        FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, session_no
    """,
)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in streaming ``session_window`` aggregation: the events fixture
    is staged as TWO parquet drops split by event-id parity, so every
    session needs rows from BOTH micro-batches (``maxFilesPerTrigger=1``)
    — surviving the batch oracle proves cross-batch session-state merging,
    not just within-batch grouping.  Complete output mode emits every
    session on drain regardless of watermark position (the bounded-input
    twin of an always-on pipeline whose tail sessions stay in state)."""
    events = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    staging = tempfile.mkdtemp(prefix="tds_stream_sesswin_")
    for parity in (0, 1):
        events.filter(F.col("event_id") % 2 == parity).select(
            "user_id", "ts"
        ).coalesce(1).write.mode("append").parquet(staging)
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    sessions = (
        stream.withWatermark("ts", "10 days")
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )
    table = f"stream_sesswin_{uuid.uuid4().hex[:8]}"
    from .incremental import _stream_partitions

    with _stream_partitions(spark):
        q = (
            sessions.writeStream.format("memory")
            .queryName(table)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(table)


@register(
    "streaming_merge_restate",
    oracle=f"""
    WITH {_TRAFFIC_CTE},
    b1 AS (
        SELECT * FROM (
            SELECT t.*, ROW_NUMBER() OVER (
                PARTITION BY SiteCode, Location, PeriodEnding
                ORDER BY Ins DESC, Outs DESC, IsInternal DESC) AS rn
            FROM traffic t WHERE PeriodEnding < TIMESTAMP '2024-01-20 00:00:00'
        ) WHERE rn = 1
    ),
    b2 AS (
        SELECT * FROM (
            SELECT SiteCode, Location, IsInternal, PeriodEnding,
                   Ins + 1000 AS Ins, Outs,
                   ROW_NUMBER() OVER (
                       PARTITION BY SiteCode, Location, PeriodEnding
                       ORDER BY Ins + 1000 DESC, Outs DESC, IsInternal DESC) AS rn
            FROM traffic WHERE PeriodEnding >= TIMESTAMP '2024-01-15 00:00:00'
        ) WHERE rn = 1
    )
    SELECT SiteCode, Location, IsInternal, PeriodEnding, Ins, Outs FROM b1
    WHERE NOT EXISTS (
        SELECT 1 FROM b2 WHERE b2.SiteCode = b1.SiteCode
          AND b2.Location = b1.Location AND b2.PeriodEnding = b1.PeriodEnding)
    UNION ALL
    SELECT SiteCode, Location, IsInternal, PeriodEnding, Ins, Outs FROM b2
    """,
)
def streaming_merge_restate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 late-correction replay through the checkpointed streaming MERGE
    sink: batch 1 (Jan <20) lands, then a corrected batch 2 (Jan ≥15,
    Ins+1000) is dropped into the same source and a second AvailableNow
    pass picks up only the new file.  Final table state must equal the
    batch MERGE (traffic_merge_upsert) — same b1/b2 derivation, same
    oracle."""
    t = normalize_traffic(traffic_raw_from_events(load_table(spark, sf_dir, "events")))
    b1 = t.filter(F.col("PeriodEnding") < F.lit("2024-01-20"))
    b2 = t.filter(F.col("PeriodEnding") >= F.lit("2024-01-15")).withColumn(
        "Ins", F.col("Ins") + 1000
    )

    source = tempfile.mkdtemp(prefix="tds_stream_merge_src_")
    target = tempfile.mkdtemp(prefix="tds_stream_merge_tgt_") + "/target"
    checkpoint = tempfile.mkdtemp(prefix="tds_stream_merge_ckpt_")

    _denormalize(b1).coalesce(1).write.mode("append").json(source)
    run_incremental_merge(spark, source, target, checkpoint)
    _denormalize(b2).coalesce(1).write.mode("append").json(source)
    run_incremental_merge(spark, source, target, checkpoint)

    return (
        spark.read.parquet(target)
        .select("SiteCode", "Location", "IsInternal", "PeriodEnding", "Ins", "Outs")
    )


@register(
    "streaming_sessionize",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > 1800
                         OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    numbered AS (
        SELECT user_id, ts,
               CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
        FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, session_no
    """,
)
def streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState) against
    the batch gaps-and-islands SQL oracle — the strongest check a
    non-windowed stateful op can get.

    The whole events fixture is staged as a JSON drop plus one far-future
    sentinel event per user; draining it through
    :func:`streaming.sessionize.sessionize_stream` closes every real
    session inline (the sentinel opens a new session > gap later, which
    stays in state and is never emitted).  Emitted closed sessions must
    equal the batch computation over the same events — session-boundary
    state machines in keyed state vs window functions, same answer.
    """
    from .sessionize import sessionize_stream

    events = load_table(spark, sf_dir, "events").select("user_id", "ts")
    sentinel = (
        events.select("user_id")
        .distinct()
        .withColumn("ts", F.lit("2030-01-01 00:00:00").cast("timestamp"))
    )
    staged = events.unionByName(sentinel).select(
        "user_id", F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("ts")
    )
    source = tempfile.mkdtemp(prefix="tds_stream_sess_")
    staged.coalesce(1).write.mode("overwrite").json(source)

    stream = spark.readStream.schema("user_id long, ts timestamp").json(source)
    table = f"stream_sess_{uuid.uuid4().hex[:8]}"
    from .incremental import _stream_partitions

    with _stream_partitions(spark):
        q = (
            sessionize_stream(stream)
            .writeStream.format("memory")
            .queryName(table)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # Sentinel-only sessions stay open in state; nothing to filter out of
    # the emitted rows, but guard anyway in case a future change flushes
    # them on drain.
    return spark.table(table).filter(F.col("session_start") < F.lit("2030-01-01"))


_SCD2_STREAM_ORACLE = """
WITH ordered AS (
    SELECT user_id, event_type, ts, event_id,
           LAG(event_type) OVER w AS _prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
changed AS (
    SELECT user_id, event_type, ts, event_id
    FROM ordered WHERE _prev IS NULL OR _prev <> event_type
)
SELECT user_id, event_type,
       ts AS valid_from,
       LEAD(ts) OVER w AS valid_to,
       CAST(ROW_NUMBER() OVER w AS INT) AS version,
       LEAD(ts) OVER w IS NULL AS is_current
FROM changed
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, version
"""


def _scd2_sink(target: str):
    """Idempotent foreachBatch sink: each micro-batch OVERWRITES its own
    ``batch_id=N`` subdirectory.  A plain append would double-emit closed
    versions when a crash lands between sink write and offset commit and
    the micro-batch replays (§2.8d; the MERGE sink is idempotent by
    construction, a file-append sink must be made so by batch-id keying).
    Replay-idempotence is unit-tested directly in tests/test_streaming.py.
    """

    def sink(batch: DataFrame, bid: int) -> None:
        batch.write.mode("overwrite").parquet(
            os.path.join(target, f"batch_id={bid}")
        )

    return sink


def _scd2_drain(spark: SparkSession, sf_dir: str, stream_op) -> DataFrame:
    """Shared two-drop harness for both streaming SCD2 APIs: the events
    fixture is split at its epoch midpoint into two time-ordered drops
    drained through ONE checkpoint (two AvailableNow passes) — versions
    opened by drop 1 and closed by drop 2 certify cross-micro-batch state
    continuity, exactly the ``events_scd2_apply_late_batch`` split pushed
    down into keyed state.  A far-future sentinel attribute closes every
    real open version on the second pass; the sentinel's own versions stay
    in state unemitted, and real last versions get their ``valid_to``
    nulled back (they closed at the sentinel, not at real data).
    """
    from .incremental import _stream_partitions

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    lo, hi = ev.agg(
        F.min(F.col("ts").cast("long")), F.max(F.col("ts").cast("long"))
    ).first()
    cutoff = (int(lo) + int(hi)) // 2
    sentinel = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.lit("2030-01-01 00:00:00").cast("timestamp").alias("ts"),
            F.lit(-1).cast("long").alias("event_id"),
            F.lit("__flush__").alias("event_type"),
        )
    )
    fmt = lambda df: df.select(  # noqa: E731 — timestamps as micros strings
        "user_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("ts"),
        "event_id",
        "event_type",
    )
    source = tempfile.mkdtemp(prefix="tds_stream_scd2_src_")
    target = tempfile.mkdtemp(prefix="tds_stream_scd2_tgt_") + "/out"
    checkpoint = tempfile.mkdtemp(prefix="tds_stream_scd2_ckpt_")

    def drain() -> None:
        stream = spark.readStream.schema(
            "user_id long, ts timestamp, event_id long, event_type string"
        ).json(source)
        with _stream_partitions(spark):
            q = (
                stream_op(stream)
                .writeStream.foreachBatch(_scd2_sink(target))
                .option("checkpointLocation", checkpoint)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

    fmt(ev.filter(F.col("ts").cast("long") < cutoff)).coalesce(1).write.mode(
        "append"
    ).json(source)
    drain()
    fmt(
        ev.filter(F.col("ts").cast("long") >= cutoff).unionByName(sentinel)
    ).coalesce(1).write.mode("append").json(source)
    drain()

    out = spark.read.parquet(target)
    sentinel_ts = F.lit("2030-01-01 00:00:00").cast("timestamp")
    return (
        out.withColumn(
            "valid_to",
            F.when(F.col("valid_to") >= sentinel_ts, F.lit(None)).otherwise(
                F.col("valid_to")
            ),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
        # explicit projection: the batch_id=N sink dirs surface as an
        # inferred partition column on read-back
        .select(
            "user_id", "event_type", "valid_from", "valid_to", "version",
            "is_current",
        )
        .orderBy("user_id", "version")
    )


@register("streaming_scd2", oracle=_SCD2_STREAM_ORACLE)
def streaming_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming SCD2 on ``applyInPandasWithState`` (see
    ``_scd2_drain`` for the two-drop cross-batch harness)."""
    from .scd2 import scd2_stream

    return _scd2_drain(spark, sf_dir, scd2_stream)


def streaming_scd2_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME operator on Spark 4's ``transformWithStateInPandas``
    (typed ValueState, RocksDB state-store provider) through the same
    two-drop harness and batch oracle — certifying semantics across the
    engine's stateful-API migration.

    NOT in the registry: the TWS Python worker protocol needs
    ``google.protobuf``, absent in this container (and installs are out of
    scope), so an end-to-end run here dies in worker init
    (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE).  The processor is
    certified by the shared-core equivalence unit test
    (tests/test_streaming.py) and by the skipif-gated e2e test that runs
    wherever protobuf exists.  The RocksDB provider conf is scoped to this
    call and restored afterwards."""
    from .scd2 import scd2_stream_tws

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        return _scd2_drain(spark, sf_dir, scd2_stream_tws)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


@register(
    "streaming_seasonal_anomalies",
    # Batch oracle: identical to traffic_seasonal_anomalies — the drained
    # stream must flag exactly the same buckets.
    oracle=f"""
    WITH {_TRAFFIC_CTE},
    rollup AS (
        SELECT SiteCode, Location,
               date_trunc('hour', PeriodEnding - INTERVAL 1 SECOND) + INTERVAL 1 HOUR AS PeriodEnding,
               CAST(SUM(Ins) AS BIGINT) AS Ins
        FROM traffic
        GROUP BY 1, 2, 3
    ),
    profile AS (
        SELECT SiteCode, Location,
               CAST(extract('hour' FROM PeriodEnding) AS INT) AS hod,
               COUNT(*) AS n, CAST(SUM(Ins) AS BIGINT) AS s,
               CAST(SUM(Ins * Ins) AS BIGINT) AS ss
        FROM rollup
        GROUP BY 1, 2, 3
    )
    SELECT SiteCode, Location, PeriodEnding, Ins, n_obs, dev_sq, thr_sq
    FROM (
        SELECT r.SiteCode, r.Location, r.PeriodEnding, r.Ins,
               p.n AS n_obs,
               ((p.n - 1) * r.Ins - (p.s - r.Ins))
                 * ((p.n - 1) * r.Ins - (p.s - r.Ins)) AS dev_sq,
               9 * ((p.n - 1) * (p.ss - r.Ins * r.Ins)
                    - (p.s - r.Ins) * (p.s - r.Ins)) AS thr_sq
        FROM rollup r
        JOIN profile p
          ON r.SiteCode = p.SiteCode AND r.Location = p.Location
         AND CAST(extract('hour' FROM r.PeriodEnding) AS INT) = p.hod
        WHERE p.n >= 4
    )
    WHERE dev_sq > thr_sq
    ORDER BY SiteCode, Location, PeriodEnding
    """,
)
def streaming_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``traffic_seasonal_anomalies``: the stateful
    hour-ending rollup runs INSIDE the stream, the stored (site, location,
    hour-of-day) profile joins in as a broadcast static dimension, and the
    leave-one-out 3σ flag fires per micro-batch — anomaly alerting at
    ingest latency instead of a nightly batch sweep.  The drained stream
    must flag exactly the batch operator's buckets (same oracle).

    Scale: inherits the rollup's bounded window state; the profile is
    O(sites·locations·24) static broadcast — no extra streaming state for
    the detection itself.
    """
    from ..plans.traffic import rollup_traffic
    from .incremental import (
        _stream_partitions,
        hourly_rollup_stream,
        read_traffic_stream,
    )

    raw = traffic_raw_from_events(load_table(spark, sf_dir, "events"))
    staging = _stage_raw_json(raw, "tds_stream_anom_")

    # the stored historical profile (batch-derived static dimension)
    rolled = rollup_traffic(
        normalize_traffic(raw), grain="hour"
    ).select("SiteCode", "Location", "PeriodEnding", "Ins")
    profile = (
        rolled.groupBy(
            "SiteCode", "Location", F.hour("PeriodEnding").alias("hod")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("Ins").alias("s"),
            F.sum(F.col("Ins") * F.col("Ins")).alias("ss"),
        )
        .filter(F.col("n") >= 4)
    )

    m = F.col("n") - F.lit(1)
    dev = m * F.col("Ins") - (F.col("s") - F.col("Ins"))
    thr = F.lit(9) * (
        m * (F.col("ss") - F.col("Ins") * F.col("Ins"))
        - (F.col("s") - F.col("Ins")) * (F.col("s") - F.col("Ins"))
    )
    flagged = (
        hourly_rollup_stream(read_traffic_stream(spark, staging))
        .withColumn("hod", F.hour("PeriodEnding"))
        .join(F.broadcast(profile), ["SiteCode", "Location", "hod"])
        .filter(dev * dev > thr)
        .select(
            "SiteCode",
            "Location",
            "PeriodEnding",
            "Ins",
            F.col("n").alias("n_obs"),
            (dev * dev).alias("dev_sq"),
            thr.alias("thr_sq"),
        )
    )
    table = f"stream_anom_{uuid.uuid4().hex[:8]}"
    with _stream_partitions(spark):
        q = (
            flagged.writeStream.format("memory")
            .queryName(table)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(table).orderBy("SiteCode", "Location", "PeriodEnding")


@register(
    "streaming_trending_topk",
    oracle="""
    WITH winned AS (
        SELECT CAST(FLOOR(epoch(ts) / 21600) * 21600 AS BIGINT)
                   AS window_start_epoch,
               user_id, COUNT(*) AS cnt
        FROM events GROUP BY 1, 2
    )
    SELECT window_start_epoch, CAST(rnk AS BIGINT) AS rnk, user_id,
           CAST(cnt AS BIGINT) AS cnt
    FROM (
        SELECT window_start_epoch, user_id, cnt,
               ROW_NUMBER() OVER (PARTITION BY window_start_epoch
                                  ORDER BY cnt DESC, user_id) AS rnk
        FROM winned
    )
    WHERE rnk <= 5
    ORDER BY window_start_epoch, rnk
    """,
)
def streaming_trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending items at ingest latency: the STREAM maintains per-(6 h
    tumbling window, user) counts — the stateful half — and the top-5
    ranking is a cheap batch read over the finalized windows (streaming
    can't rank across keys mid-flight; every production trending feature
    splits exactly here).  The fully-drained counts ranked batch-side
    must equal the one-shot batch window/rank of the same input.

    Scale: windowed-count state is (windows-in-lateness × active keys);
    the rank runs per window partition over the aggregated table —
    WindowGroupLimit keeps only each partition's top-5 candidates.
    """
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id"
    )
    staging = tempfile.mkdtemp(prefix="tds_stream_trend_")
    events.coalesce(1).write.mode("append").parquet(staging)
    table = f"stream_trend_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema(events.schema)
        .parquet(staging)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "6 hours").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drained = spark.table(table)
    from pyspark.sql.window import Window

    rnk_w = Window.partitionBy("w").orderBy(F.col("cnt").desc(), "user_id")
    return (
        drained.withColumn("rnk", F.row_number().over(rnk_w).cast("bigint"))
        .filter(F.col("rnk") <= 5)
        .select(
            F.unix_timestamp(F.col("w.start"))
            .cast("bigint")
            .alias("window_start_epoch"),
            "rnk",
            "user_id",
            "cnt",
        )
        .orderBy("window_start_epoch", "rnk")
    )


def _cusum_oracle() -> str:
    # Stream == batch: reuse the batch operator's recursive-CTE oracle
    # verbatim (drift registers before this module in _QUERY_MODULES, and
    # the direct import below guarantees registration under pytest too).
    from ..operators import drift as _drift  # noqa: F401
    from ..registry import _REGISTRY

    return _REGISTRY["events_cusum_changepoints"].oracle


@register("streaming_cusum_changepoints", oracle=_cusum_oracle())
def streaming_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``events_cusum_changepoints``: the reflected
    CUSUM fold runs inside the stream (keyed state = two integers per
    series), against a pre-computed control profile; the events are
    staged as THREE day-sliced drops (maxFilesPerTrigger=1 → three
    micro-batches), each carrying one sentinel row per series at the
    slice's final hour so every key folds exactly through the batch
    frontier — zero-count hours decay state across batch boundaries.
    The drained stream must flag exactly the batch operator's hours
    (same recursive-CTE oracle)."""
    import datetime as dt

    from .cusum import cusum_profile, cusum_stream

    events = load_table(spark, sf_dir, "events").select("event_type", "ts")
    profile = cusum_profile(events)
    types = sorted(profile["series"])

    d0, d1 = events.agg(
        F.min(F.col("ts").cast("date")), F.max(F.col("ts").cast("date"))
    ).first()
    n_days = (d1 - d0).days + 1
    step = max(1, n_days // 3)
    bounds = [d0 + dt.timedelta(days=i * step) for i in range(3)] + [
        d1 + dt.timedelta(days=1)
    ]

    staging = tempfile.mkdtemp(prefix="tds_stream_cusum_")
    # ONE partitioned write job stages every slice (three separate
    # filter+coalesce jobs measured 16 s of the 20 s lifecycle); sentinels
    # ride in tiny per-slice files that land AFTER their slice in mtime
    # order — a sentinel-only micro-batch folds through the frontier just
    # as well as an in-slice sentinel row.
    tmp = tempfile.mkdtemp(prefix="tds_cusum_slices_")
    (
        events.withColumn("is_sentinel", F.lit(False))
        .withColumn(
            "slice",
            F.least(
                F.floor(F.datediff(F.col("ts").cast("date"), F.lit(d0)) / step),
                F.lit(2),
            ),
        )
        .repartition("slice")
        .write.partitionBy("slice")
        .mode("overwrite")
        .parquet(tmp)
    )
    sentinel_rows = []
    for i in range(3):
        hi = bounds[i + 1]
        sentinel_ts = dt.datetime.combine(hi, dt.time()) - dt.timedelta(
            seconds=1
        )
        sentinel_rows.append(
            [(t, sentinel_ts, True) for t in types]
        )
    for i in range(3):
        sdir = os.path.join(tmp, f"slice={i}")
        if not os.path.isdir(sdir):
            continue
        base = 1_700_000_000 + i * 10
        for j, f in enumerate(sorted(os.listdir(sdir))):
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                dst = os.path.join(staging, f"slice-{i:03d}-{j:03d}.parquet")
                shutil.copyfile(os.path.join(sdir, f), dst)
                os.utime(dst, (base, base))
        # sentinel slice via driver-side pyarrow (r8): no Spark job at all
        # — a local-relation write was the dominant per-slice harness cost
        import pandas as _pd
        import pyarrow as _pa

        _write_sentinel_file(
            os.path.join(staging, f"slice-{i:03d}-sentinel.parquet"),
            _pd.DataFrame(
                sentinel_rows[i],
                columns=["event_type", "ts", "is_sentinel"],
            ),
            _pa.schema(
                [
                    ("event_type", _pa.string()),
                    ("ts", _pa.timestamp("us")),
                    ("is_sentinel", _pa.bool_()),
                ]
            ),
            mtime=base + 5,  # after the slice, before next
        )

    schema = "event_type string, ts timestamp, is_sentinel boolean"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    table = f"stream_cusum_{uuid.uuid4().hex[:8]}"
    from .incremental import _stream_partitions

    with _stream_partitions(spark):  # O(series) keys — right-size state
        q = (
            cusum_stream(stream, profile)
            .writeStream.format("memory")
            .queryName(table)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(table).orderBy("event_type", "epoch_hour")


@register(
    "streaming_view_click_leftjoin",
    oracle="""
    SELECT v.event_id AS view_id, c.event_id AS click_id,
           v.user_id AS user_id, v.ts AS view_ts, c.ts AS click_ts
    FROM events v LEFT JOIN events c
      ON v.user_id = c.user_id
     AND c.event_type = 'click'
     AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 10 MINUTE
    WHERE v.event_type = 'view'
    """,
)
def streaming_view_click_leftjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER attribution join: views with their clicks
    inside a 10-minute window, AND every unconverted view exactly once
    with a null click.  The outer side is the hard part of stream-stream
    joins — an unmatched view can only be emitted once the watermark
    proves no qualifying click can still arrive (view_ts + range +
    lateness), so correct output REQUIRES state eviction, not just
    buffering.  A far-future sentinel row staged as a second file per
    side (maxFilesPerTrigger=1 → its own batch) pushes the final
    watermark past every real view's horizon; sentinels join nothing
    (user −1) and are filtered from the output.  The drained stream must
    equal the batch LEFT JOIN of the same input."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    views_dir = tempfile.mkdtemp(prefix="tds_ssoj_views_")
    clicks_dir = tempfile.mkdtemp(prefix="tds_ssoj_clicks_")
    max_ts = events.agg(F.max("ts")).first()[0]
    import datetime as dt

    sentinel_ts = max_ts + dt.timedelta(hours=2)
    for d, et in ((views_dir, "view"), (clicks_dir, "click")):
        events.filter(F.col("event_type") == et).coalesce(1).write.mode(
            "append"
        ).parquet(d)
        import pandas as _pd
        import pyarrow as _pa

        _write_sentinel_file(
            os.path.join(d, "zz-sentinel.parquet"),
            _pd.DataFrame(
                [(-1, sentinel_ts, -1, et)],
                columns=["event_id", "ts", "user_id", "event_type"],
            ),
            _pa.schema(
                [
                    ("event_id", _pa.int64()),
                    ("ts", _pa.timestamp("us")),
                    ("user_id", _pa.int64()),
                    ("event_type", _pa.string()),
                ]
            ),
        )
    table = f"stream_ssoj_{uuid.uuid4().hex[:8]}"
    left = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(views_dir)
        .withWatermark("ts", "30 minutes")
        .alias("l")
    )
    right = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(clicks_dir)
        .withWatermark("ts", "30 minutes")
        .alias("r")
    )
    join_expr = (
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("r.ts") >= F.col("l.ts"))
        & (F.col("r.ts") <= F.col("l.ts") + F.expr("INTERVAL 10 MINUTES"))
    )
    from .incremental import _stream_partitions

    with _stream_partitions(spark):
        q = (
            left.join(right, join_expr, "left_outer")
            .select(
                F.col("l.event_id").alias("view_id"),
                F.col("r.event_id").alias("click_id"),
                F.col("l.user_id").alias("user_id"),
                F.col("l.ts").alias("view_ts"),
                F.col("r.ts").alias("click_ts"),
            )
            .writeStream.format("memory")
            .queryName(table)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(table).filter(F.col("view_id") != -1)


def _growth_oracle() -> str:
    from ..plans import growth as _growth  # noqa: F401
    from ..registry import _REGISTRY

    return _REGISTRY["events_growth_accounting"].oracle


@register("streaming_growth_accounting", oracle=_growth_oracle())
def streaming_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``events_growth_accounting``: each user's
    last-active-day is ONE integer of keyed state; (user, day)
    activations classify as new/retained/resurrected per micro-batch
    (three day-sliced drops), and the day-grain rollup + churn/cumulative
    windows run batch-side over the drained classifications.  Same
    oracle as the batch operator — the drained stream must reproduce the
    one-shot decomposition exactly."""
    import datetime as dt

    from .growth import growth_stream
    from .incremental import _stream_partitions

    events = load_table(spark, sf_dir, "events").select("user_id", "ts")
    d0, d1 = events.agg(
        F.min(F.col("ts").cast("date")), F.max(F.col("ts").cast("date"))
    ).first()
    n_days = (d1 - d0).days + 1
    step = max(1, n_days // 3)
    staging = tempfile.mkdtemp(prefix="tds_stream_growth_")
    tmp = tempfile.mkdtemp(prefix="tds_growth_slices_")
    (
        events.withColumn(
            "slice",
            F.least(
                F.floor(F.datediff(F.col("ts").cast("date"), F.lit(d0)) / step),
                F.lit(2),
            ),
        )
        .repartition("slice")
        .write.partitionBy("slice")
        .mode("overwrite")
        .parquet(tmp)
    )
    for i in range(3):
        sdir = os.path.join(tmp, f"slice={i}")
        if not os.path.isdir(sdir):
            continue
        base = 1_700_000_000 + i * 10
        for j, f in enumerate(sorted(os.listdir(sdir))):
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                dst = os.path.join(staging, f"slice-{i:03d}-{j:03d}.parquet")
                shutil.copyfile(os.path.join(sdir, f), dst)
                os.utime(dst, (base, base))
    table = f"stream_growth_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    with _stream_partitions(spark):
        q = (
            growth_stream(stream)
            .writeStream.format("memory")
            .queryName(table)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    drained = spark.table(table)
    classified = drained.groupBy("epoch_day").agg(
        F.count(F.lit(1)).alias("dau"),
        F.count(F.when(F.col("cls") == "new", 1)).alias("new_users"),
        F.count(F.when(F.col("cls") == "retained", 1)).alias("retained"),
        F.count(F.when(F.col("cls") == "resurrected", 1)).alias(
            "resurrected"
        ),
    )
    from pyspark.sql.window import Window as W

    day_w = W.orderBy("epoch_day")
    return (
        classified.select(
            F.expr("CAST(date_add(DATE '1970-01-01', CAST(epoch_day AS INT)) AS TIMESTAMP)")
            .alias("day"),
            "epoch_day",
            "dau",
            "new_users",
            "retained",
            "resurrected",
        )
        .withColumn(
            "churned_from_prev",
            F.coalesce(F.lag("dau").over(day_w), F.lit(0)) - F.col("retained"),
        )
        .withColumn(
            "cumulative_users",
            F.sum("new_users").over(
                day_w.rowsBetween(W.unboundedPreceding, 0)
            ),
        )
        .drop("epoch_day")
        .orderBy("day")
    )


def _decayed_oracle() -> str:
    # Stream == batch: reuse the batch operator's oracle verbatim.
    from ..operators import freq as _freq  # noqa: F401
    from ..registry import _REGISTRY

    return _REGISTRY["events_decayed_topk"].oracle


@register("streaming_decayed_topk", oracle=_decayed_oracle())
def streaming_decayed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``events_decayed_topk``: the decayed weight
    ``2^(day/half_life)`` is a pure function of EVENT TIME against the
    stored corpus-start constant (the CUSUM control-profile pattern), so
    the stream's stateful half is one weighted sum per (type, user) —
    decay needs no clock ticks or state rewrites, because the shared
    ``2^now`` scale cancels in ranking.  That reframing is the whole
    operator: a naive implementation multiplies every key's state by the
    decay factor per tick (unbounded rewrite churn); event-time weights
    make decayed ranking a plain streaming aggregation.  Three file
    drops exercise cross-batch accumulation; the drained sums ranked
    batch-side must equal the one-shot batch operator (same oracle)."""
    from ..operators.freq import DECAY_HALF_LIFE_DAYS, DECAYED_TOP_K

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "user_id"
    )
    from .incremental import _stream_partitions

    d0 = events.agg(F.min(F.col("ts").cast("date"))).first()[0]
    staging = tempfile.mkdtemp(prefix="tds_stream_decay_")
    events.repartition(3).write.mode("append").parquet(staging)
    table = f"stream_decay_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
        .select(
            "event_type",
            "user_id",
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), "
                f"CAST(datediff(CAST(ts AS DATE), DATE '{d0}') "
                f"div {DECAY_HALF_LIFE_DAYS} AS INT))"
            ).alias("w"),
        )
        .groupBy("event_type", "user_id")
        .agg(F.sum("w").alias("decayed_scaled"))
    )
    with _stream_partitions(spark):
        q = (
            stream.writeStream.format("memory")
            .queryName(table)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    from pyspark.sql.window import Window

    rnk_w = Window.partitionBy("event_type").orderBy(
        F.col("decayed_scaled").desc(), "user_id"
    )
    return (
        spark.table(table)
        .withColumn("rnk", F.row_number().over(rnk_w))
        .filter(F.col("rnk") <= DECAYED_TOP_K)
        .select("event_type", "user_id", "decayed_scaled", "rnk")
        .orderBy("event_type", "rnk")
    )


@register(
    "streaming_versioned_ingest",
    # Final versioned-table state == the raw input relation: nothing is
    # lost or duplicated across per-micro-batch commits.
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(FLOOR(value * 100) AS BIGINT) AS value_cents
    FROM events ORDER BY event_id
    """,
)
def streaming_versioned_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingestion INTO the snapshot-versioned table: each
    micro-batch lands as one CAS-claimed manifest commit
    (``foreachBatch`` → ``versioned_commit``), so the lakehouse tier's
    guarantees — time travel to any batch boundary, rollback, audit —
    hold for a live stream, and a crashed batch leaves only invisible
    staged files (the manifest is the commit point).  ``foreachBatch``
    is at-least-once, so exactly-once at the table level comes from the
    commit's ``txn=(app_id, batch_id)`` idempotence ledger: a batch
    replayed after a crash-between-commit-and-checkpoint is recognized
    by its batch_id in the manifest's txn map and skipped (the Delta
    txnAppId/txnVersion pattern; pinned by
    ``tests/test_timetravel.py::test_versioned_commit_txn_idempotent``).

    Three file drops under ``maxFilesPerTrigger=1`` force ≥3 real
    micro-batches; the inline assertions pin one version per non-empty
    batch and that version 1 re-reads as exactly the first batch's rows
    AFTER later commits landed.  The final read must hash-match the raw
    input relation (nothing lost or duplicated at commit seams)."""
    from ..operators.timetravel import (
        table_versions,
        versioned_commit,
        versioned_read,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    staging = tempfile.mkdtemp(prefix="tds_stream_vers_src_")
    events.repartition(3).write.mode("append").parquet(staging)
    table = os.path.join(
        tempfile.mkdtemp(prefix="tds_stream_vers_tbl_"), "t"
    )
    os.makedirs(os.path.join(table, "data"), exist_ok=True)
    checkpoint = tempfile.mkdtemp(prefix="tds_stream_vers_ckpt_")

    def commit_batch(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        versioned_commit(
            batch_df.sparkSession,
            batch_df,
            table,
            txn=("stream-ingest", int(batch_id)),
        )

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    q = (
        stream.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    versions = table_versions(spark, table)
    assert len(versions) >= 3, versions
    # time travel to the first batch boundary still reads exactly batch 1
    v1_rows = versioned_read(spark, table, versions[0]).count()
    assert 0 < v1_rows < events.count()
    return versioned_read(spark, table).orderBy("event_id")


@register(
    "streaming_interval_islands",
    # same oracle algebra as the batch twin events_interval_islands: the
    # drained streaming islands must hash-match the batch window pass
    oracle="""
    WITH iv AS (
        SELECT user_id,
               ts AS s,
               ts + INTERVAL 1 MINUTE * (event_id % 7 + 1) AS e
        FROM events
    ),
    flagged AS (
        SELECT user_id, s, e,
               CASE WHEN s > MAX(e) OVER (
                        PARTITION BY user_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS new_island
        FROM iv
    ),
    islands AS (
        SELECT user_id, s, e,
               SUM(new_island) OVER (
                   PARTITION BY user_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS island
        FROM flagged
    )
    SELECT user_id,
           MIN(s) AS island_start,
           MAX(e) AS island_end,
           CAST(COUNT(*) AS BIGINT) AS n_merged
    FROM islands
    GROUP BY user_id, island
    ORDER BY user_id, island_start
    """,
)
def streaming_interval_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval coalescing AT INGEST (the r8 batch operator's streaming
    twin, :mod:`.islands`): per-user activity spans merge into maximal
    islands in keyed state, each emitted the moment the watermark proves
    no future interval can extend it.  Day-sliced drops force islands
    whose merging spans micro-batches; the drained output must hash-match
    the batch window algebra (same oracle as ``events_interval_islands``).
    Drain: pyarrow far-future sentinel + paired slices + the final
    timeout sweep — the streaming_contribution_cap harness shape."""
    from .incremental import STREAM_SHUFFLE_PARTITIONS, _stream_partitions
    from .islands import islands_stream

    events = load_table(spark, sf_dir, "events")
    iv = events.select(
        "user_id",
        F.col("ts").alias("start"),
        (
            F.col("ts")
            + F.make_interval(mins=(F.col("event_id") % 7 + 1).cast("int"))
        ).alias("end"),
        "event_id",
    )
    d0, d1 = iv.agg(
        F.min(F.col("start").cast("date")), F.max(F.col("start").cast("date"))
    ).first()
    step = max(1, ((d1 - d0).days + 1) // 3)
    staging = tempfile.mkdtemp(prefix="tds_stream_isl_")
    tmp = tempfile.mkdtemp(prefix="tds_isl_slices_")
    (
        iv.withColumn(
            "slice",
            F.least(
                F.floor(
                    F.datediff(F.col("start").cast("date"), F.lit(d0)) / step
                ),
                F.lit(2),
            ),
        )
        .repartition("slice")
        .write.partitionBy("slice")
        .mode("overwrite")
        .parquet(tmp)
    )
    for i in range(3):
        sdir = os.path.join(tmp, f"slice={i}")
        if not os.path.isdir(sdir):
            continue
        base = 1_700_000_000 + i * 10
        for j, f in enumerate(sorted(os.listdir(sdir))):
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                dst = os.path.join(staging, f"slice-{i:03d}-{j:03d}.parquet")
                shutil.copyfile(os.path.join(sdir, f), dst)
                os.utime(dst, (base, base))
    import pandas as _pd
    import pyarrow as _pa

    _write_sentinel_file(
        os.path.join(staging, "zz-sent.parquet"),
        _pd.DataFrame(
            {
                "user_id": [-1],
                "start": [_pd.Timestamp("2030-01-01")],
                "end": [_pd.Timestamp("2030-01-01")],
                "event_id": [-1],
            }
        ),
        _pa.schema(
            [
                ("user_id", _pa.int64()),
                ("start", _pa.timestamp("us")),
                ("end", _pa.timestamp("us")),
                ("event_id", _pa.int64()),
            ]
        ),
        mtime=1_700_000_100,
    )
    table = f"stream_isl_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema(
            "user_id long, start timestamp, end timestamp, event_id long"
        )
        .option("maxFilesPerTrigger", 2)
        .parquet(staging)
    )
    with _stream_partitions(spark, n=max(32, STREAM_SHUFFLE_PARTITIONS)):
        q = (
            islands_stream(stream, lateness="90 days")
            .writeStream.format("memory")
            .queryName(table)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.table(table)
        .select(
            "user_id",
            F.timestamp_micros("start_us").alias("island_start"),
            F.timestamp_micros("end_us").alias("island_end"),
            "n_merged",
        )
        .orderBy("user_id", "island_start")
    )


@register(
    "streaming_contribution_cap",
    oracle=f"""
    SELECT event_type, user_id, event_id
    FROM (
        SELECT event_type, user_id, event_id,
               row_number() OVER (PARTITION BY event_type, user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    )
    WHERE rn <= 5
    ORDER BY event_type, user_id, event_id
    """,
)
def streaming_contribution_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quota enforcement AT INGEST: the stream admits at most 5 events
    per (type, user) — earliest IN EVENT TIME, via the watermarked
    reorder buffer in :mod:`.cap` (r7: admission is order-correct under
    out-of-order micro-batches, not just in-order arrival).  Three
    day-sliced drops force keys whose quota spans micro-batches, then
    two drain sentinels (watermark push + per-key final seal) flush the
    buffers; the drained admitted set must equal the batch operator's
    earliest-N selection (same window oracle).  The out-of-order slice
    permutation is pinned by ``tests/test_streaming.py``."""
    import datetime as dt

    from .cap import cap_stream
    from .incremental import _stream_partitions

    events = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", "ts", "event_id"
    )
    d0, d1 = events.agg(
        F.min(F.col("ts").cast("date")), F.max(F.col("ts").cast("date"))
    ).first()
    n_days = (d1 - d0).days + 1
    step = max(1, n_days // 3)
    staging = tempfile.mkdtemp(prefix="tds_stream_cap_")
    tmp = tempfile.mkdtemp(prefix="tds_cap_slices_")
    (
        events.withColumn(
            "slice",
            F.least(
                F.floor(F.datediff(F.col("ts").cast("date"), F.lit(d0)) / step),
                F.lit(2),
            ),
        )
        .repartition("slice")
        .write.partitionBy("slice")
        .mode("overwrite")
        .parquet(tmp)
    )
    for i in range(3):
        sdir = os.path.join(tmp, f"slice={i}")
        if not os.path.isdir(sdir):
            continue
        base = 1_700_000_000 + i * 10
        for j, f in enumerate(sorted(os.listdir(sdir))):
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                dst = os.path.join(staging, f"slice-{i:03d}-{j:03d}.parquet")
                shutil.copyfile(os.path.join(sdir, f), dst)
                os.utime(dst, (base, base))
    # Drain sentinel (cap.py contract): ONE far-future row pushes the
    # watermark past every real ts after its batch; the buffered tails
    # then flush through the EventTimeTimeout sweep (the engine's final
    # no-data batch fires every registered timer — measured equivalent
    # to, and one distinct cheaper than, a per-key sentinel slice, which
    # remains the documented fallback and is exercised by the disorder
    # pytest).
    import pandas as _pd
    import pyarrow as _pa

    _write_sentinel_file(
        os.path.join(staging, "zz-sent-a.parquet"),
        _pd.DataFrame(
            {
                "event_type": ["__wm__"],
                "user_id": [-1],
                "ts": [_pd.Timestamp("2030-01-01")],
                "event_id": [-1],
            }
        ),
        _pa.schema(
            [
                ("event_type", _pa.string()),
                ("user_id", _pa.int64()),
                ("ts", _pa.timestamp("us")),
                ("event_id", _pa.int64()),
            ]
        ),
        mtime=1_700_000_100,
    )
    table = f"stream_cap_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema(
            "event_type string, user_id long, ts timestamp, event_id long"
        )
        # 2 files per trigger (r8, VERDICT task 2): the drain is bounded by
        # KEYED PANDAS INVOCATIONS — ~every key is invoked in every stateful
        # micro-batch plus once in the final timeout sweep — so batch COUNT,
        # not data volume, is the cost.  Pairing the slices gives
        # [slice0+slice1], [slice2+sentinel], [timeout sweep] = 3 stateful
        # batches instead of 5 (~2×7500 fewer invocations at sf0.1) while
        # quotas still span micro-batches (slice2's admissions depend on
        # state from batch 1).
        .option("maxFilesPerTrigger", 2)
        .parquet(staging)
    )
    # 32 state partitions (not the 8 default): the reorder buffer makes
    # this drain keyed-Python-invocation-bound, and 8 partitions cap the
    # parallel Arrow workers at 8 — the r7 sweep measured 24.4 s at 8 vs
    # 12.6 s at 32 for this lifecycle at sf0.1.
    from .incremental import STREAM_SHUFFLE_PARTITIONS

    with _stream_partitions(spark, n=max(32, STREAM_SHUFFLE_PARTITIONS)):
        q = (
            # lateness spans the whole fixture (30 days of events), so ANY
            # slice permutation is within tolerance — nothing drops late.
            # (An r8 experiment with lateness=1 day to seal progressively
            # made the drain SLOWER — 34.6 s vs 27.9 s same-host: early
            # sealing fires every key's timer in every batch, and keyed
            # invocation count, not buffered-state size, is the cost.)
            cap_stream(stream, cap=5, lateness="90 days")
            .writeStream.format("memory")
            .queryName(table)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(table).orderBy("event_type", "user_id", "event_id")


def _write_sentinel_file(
    dst: str, pdf, schema, mtime: float | None = None
) -> None:
    """Driver-side pyarrow write for tiny drain-sentinel slices.

    A Spark job over a 1-5-row LOCAL RELATION costs SECONDS on a wide
    local-mode session (r8 profile: 6.8 s for a 1-row localrel write vs
    0.2 s for a Range-backed plan — local-relation scan + scheduling +
    committer overhead), and the sentinel tier runs once per streaming
    drain, so it was the single largest harness cost in the bench.
    pyarrow writes the same file in milliseconds with no job at all.

    ``schema`` is a pyarrow schema; field types must match the stream's
    read schema (use ``pa.timestamp("us")`` for Spark TIMESTAMP — ns
    would trip the session's ``nanosAsLong`` legacy read path).  Parquet
    column matching is by NAME, so order need not match the reader."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.Table.from_pandas(pdf, schema=schema, preserve_index=False), dst
    )
    if mtime is not None:
        os.utime(dst, (mtime, mtime))


def _mv_version_path(mv_dir: str, v: int) -> str:
    return os.path.join(mv_dir, f"mv_v{v}")


def mv_committed_version(mv_dir: str) -> int:
    """Highest COMMITTED MV version: a version counts only once its
    in-directory ``_mv_cursor.json`` marker exists (written last by
    :func:`mv_commit`), so an interrupted refresh is invisible to
    readers and replays — content and cursor are one artifact and can
    never diverge (ADVICE r07)."""
    best = 0
    for e in os.listdir(mv_dir):
        if e.startswith("mv_v") and os.path.exists(
            os.path.join(mv_dir, e, "_mv_cursor.json")
        ):
            best = max(best, int(e[4:]))
    return best


def mv_commit(mv_new: DataFrame, mv_dir: str, to_version: int) -> None:
    """Single-artifact MV promotion: parquet first, an ``_mv_cursor.json``
    marker LAST (underscore-prefixed so parquet scans ignore it), into a fresh ``mv_v{N}`` directory.  An interrupted
    write leaves mv_v{N} unmarked (the at-least-once replay simply
    overwrites it); once the marker lands, MV content and the reflected
    version moved together in one step.  Superseded versions are GC'd
    afterwards — safe, because readers resolve
    :func:`mv_committed_version` first, and a crash mid-GC just leaves
    an extra complete version the next commit collects."""
    import json as _json

    target = _mv_version_path(mv_dir, to_version)
    mv_new.write.mode("overwrite").parquet(target)
    with open(os.path.join(target, "_mv_cursor.json"), "w") as fh:
        _json.dump({"version": to_version}, fh)
    for e in os.listdir(mv_dir):
        if e.startswith("mv_v") and int(e[4:]) < to_version:
            shutil.rmtree(os.path.join(mv_dir, e), ignore_errors=True)


@register(
    "streaming_mv_refresh",
    # The MV maintained per micro-batch == the full aggregate over
    # every ingested row.
    oracle="""
    SELECT o_custkey,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_custkey
    ORDER BY o_custkey
    """,
)
def streaming_mv_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full lakehouse ingest loop, live: a stream commits each
    micro-batch into the snapshot-versioned table (idempotent
    ``txn=batch_id`` commits), and after every commit the stored
    materialized view (revenue per customer) is refreshed by reading
    ONLY the manifest delta since its recorded cursor version and
    merging additively — streaming ingest, versioned storage, and
    incremental view maintenance composed end-to-end.  The final MV
    must hash-match the full aggregate over all ingested rows.

    Crash-safety is the single-artifact commit discipline (ADVICE r07):
    each refresh writes a NEW versioned directory ``mv_v{N}`` and then
    drops an ``_mv_cursor.json`` commit marker (carrying N) inside it as the
    last step — MV content and cursor are one artifact, so they can
    never diverge.  The live view is "highest version with a marker";
    a crash mid-parquet-write leaves an unmarked directory that the
    at-least-once replay simply overwrites, and a crash before the old
    version's GC leaves two complete versions of which readers take the
    newer.  A replayed batch is skipped by the commit's txn ledger AND
    by the cursor check (v <= cursor → no-op), so both layers are
    exactly-once."""
    from ..operators.timetravel import (
        versioned_commit,
        versioned_delta_read,
        versioned_read,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    staging = tempfile.mkdtemp(prefix="tds_smv_src_")
    orders.repartition(3).write.mode("append").parquet(staging)
    table = os.path.join(tempfile.mkdtemp(prefix="tds_smv_tbl_"), "t")
    os.makedirs(os.path.join(table, "data"), exist_ok=True)
    mv_dir = tempfile.mkdtemp(prefix="tds_smv_mv_")
    checkpoint = tempfile.mkdtemp(prefix="tds_smv_ckpt_")

    def _refresh(sess, to_version: int) -> None:
        cur = mv_committed_version(mv_dir)
        if to_version <= cur:
            return  # replayed batch: MV already reflects it
        if cur == 0:
            delta = versioned_read(sess, table, to_version)
        else:
            delta = versioned_delta_read(sess, table, cur, to_version)
        d_agg = delta.groupBy("o_custkey").agg(
            F.sum("price_cents").alias("d_rev"),
            F.count(F.lit(1)).alias("d_n"),
        )
        if cur == 0:
            mv_new = d_agg.select(
                "o_custkey",
                F.col("d_rev").alias("revenue_cents"),
                F.col("d_n").alias("n_orders"),
            )
        else:
            mv_old = sess.read.parquet(_mv_version_path(mv_dir, cur))
            mv_new = (
                mv_old.join(d_agg, "o_custkey", "full")
                .select(
                    "o_custkey",
                    (
                        F.coalesce(F.col("revenue_cents"), F.lit(0))
                        + F.coalesce(F.col("d_rev"), F.lit(0))
                    ).alias("revenue_cents"),
                    (
                        F.coalesce(F.col("n_orders"), F.lit(0))
                        + F.coalesce(F.col("d_n"), F.lit(0))
                    ).alias("n_orders"),
                )
            )
        mv_commit(mv_new, mv_dir, to_version)

    def commit_and_refresh(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        v = versioned_commit(
            batch_df.sparkSession,
            batch_df,
            table,
            txn=("mv-ingest", int(batch_id)),
        )
        _refresh(batch_df.sparkSession, v)

    stream = (
        spark.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    q = (
        stream.writeStream.foreachBatch(commit_and_refresh)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final = mv_committed_version(mv_dir)
    assert final >= 3  # one commit+refresh per file drop
    return spark.read.parquet(_mv_version_path(mv_dir, final)).orderBy(
        "o_custkey"
    )


@register(
    "streaming_ohlc_hourly",
    oracle="""
    WITH cents AS (
        SELECT event_type, ts, event_id,
               CAST(FLOOR(value * 100) AS BIGINT) AS v
        FROM events
    ),
    ranked AS (
        SELECT event_type,
               date_trunc('hour', ts) AS hour_start, v,
               ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                  ORDER BY ts, event_id) AS rn_a,
               ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM cents
    )
    SELECT event_type, hour_start,
           CAST(MAX(CASE WHEN rn_a = 1 THEN v END) AS BIGINT) AS open_cents,
           CAST(MAX(v) AS BIGINT) AS high_cents,
           CAST(MIN(v) AS BIGINT) AS low_cents,
           CAST(MAX(CASE WHEN rn_d = 1 THEN v END) AS BIGINT) AS close_cents,
           CAST(COUNT(*) AS BIGINT) AS volume
    FROM ranked
    GROUP BY event_type, hour_start
    """,
)
def streaming_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``events_ohlc_hourly``: OHLC bars maintained by a
    windowed streaming aggregation whose open/close are ``min_by``/``max_by``
    over a (ts, event_id) struct — ordered "first/last value" state that
    must MERGE correctly across micro-batches, not just within one.  The
    fixture is staged as two parquet drops split by event-id parity with
    ``maxFilesPerTrigger=1``, so in (almost) every bar the true open and
    close arrive in DIFFERENT micro-batches: matching the batch oracle
    proves the ordered-extremum state merge, the property a commutative
    SUM rollup never exercises.  Complete mode emits every bar on drain
    (the bounded-input twin of an always-on ticker whose tail bars are
    still in state); at production scale the same plan runs in append
    mode behind the watermark with O(open bars) state."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    staging = tempfile.mkdtemp(prefix="tds_stream_ohlc_")
    for parity in (0, 1):
        events.filter(F.col("event_id") % 2 == parity).coalesce(1).write.mode(
            "append"
        ).parquet(staging)
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    bars = (
        stream.withWatermark("ts", "10 days")
        .select(
            "event_type",
            "ts",
            F.struct(F.col("ts"), F.col("event_id")).alias("ord"),
            F.floor(F.col("value") * 100).cast("long").alias("v"),
        )
        .groupBy("event_type", F.window("ts", "1 hour"))
        .agg(
            F.min_by("v", "ord").alias("open_cents"),
            F.max("v").alias("high_cents"),
            F.min("v").alias("low_cents"),
            F.max_by("v", "ord").alias("close_cents"),
            F.count(F.lit(1)).alias("volume"),
        )
        .select(
            "event_type",
            F.col("window.start").alias("hour_start"),
            "open_cents",
            "high_cents",
            "low_cents",
            "close_cents",
            "volume",
        )
    )
    table = f"stream_ohlc_{uuid.uuid4().hex[:8]}"
    from .incremental import _stream_partitions

    with _stream_partitions(spark):
        q = (
            bars.writeStream.format("memory")
            .queryName(table)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(table)


@register(
    "streaming_merge_cdf",
    # Expected feed: batch 0 updates every 5th key to 'U1'; batch 1
    # updates every (10th, non-7th) key to 'U2', tombstones every 7th,
    # inserts a new key per 11th.  Pre-images reflect the TARGET STATE AT
    # EACH BATCH (batch 1's pre-image of an updated key is 'U1'), which is
    # exactly what makes a change feed harder than a final-state diff.
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
    )
    SELECT o_orderkey, o_custkey, o_orderstatus,
           'update_preimage' AS _change_type, CAST(0 AS BIGINT) AS _batch_id
    FROM base WHERE o_orderkey % 5 = 0
    UNION ALL
    SELECT o_orderkey, o_custkey, 'U1', 'update_postimage', CAST(0 AS BIGINT)
    FROM base WHERE o_orderkey % 5 = 0
    UNION ALL
    SELECT o_orderkey, o_custkey, 'U1', 'update_preimage', CAST(1 AS BIGINT)
    FROM base WHERE o_orderkey % 10 = 0 AND o_orderkey % 7 != 0
    UNION ALL
    SELECT o_orderkey, o_custkey, 'U2', 'update_postimage', CAST(1 AS BIGINT)
    FROM base WHERE o_orderkey % 10 = 0 AND o_orderkey % 7 != 0
    UNION ALL
    SELECT o_orderkey, o_custkey,
           CASE WHEN o_orderkey % 5 = 0 THEN 'U1' ELSE o_orderstatus END,
           'delete', CAST(1 AS BIGINT)
    FROM base WHERE o_orderkey % 7 = 0
    UNION ALL
    SELECT o_orderkey + 10000000, o_custkey, 'N', 'insert', CAST(1 AS BIGINT)
    FROM base WHERE o_orderkey % 11 = 0
    ORDER BY _batch_id, o_orderkey, _change_type
    """,
)
def streaming_merge_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MERGE with a change-data-feed sink: each micro-batch
    merges into the stored target AND appends its ``merge_cdf`` rows
    (tagged with the batch id) to a feed directory — the
    Delta-CDF-enabled-table shape.  Two sequential AvailableNow drains
    order the batches; batch 1's pre-images must reflect the state AFTER
    batch 0's merge (reading the feed proves per-batch target snapshots,
    not a final-state diff).  The oracle enumerates every expected
    change row across both batches."""
    from ..operators.merge import merge_cdf, merge_with_tombstones

    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    k = F.col("o_orderkey")
    b0 = base.filter(k % 5 == 0).withColumn(
        "o_orderstatus", F.lit("U1")
    ).withColumn("is_delete", F.lit(False))
    b1 = (
        base.filter((k % 10 == 0) & (k % 7 != 0))
        .withColumn("o_orderstatus", F.lit("U2"))
        .withColumn("is_delete", F.lit(False))
        .unionByName(base.filter(k % 7 == 0).withColumn("is_delete", F.lit(True)))
        .unionByName(
            base.filter(k % 11 == 0)
            .withColumn("o_orderkey", k + 10_000_000)
            .withColumn("o_orderstatus", F.lit("N"))
            .withColumn("is_delete", F.lit(False))
        )
    )

    source = tempfile.mkdtemp(prefix="tds_stream_cdf_src_")
    root = tempfile.mkdtemp(prefix="tds_stream_cdf_")
    target = os.path.join(root, "target")
    feed = os.path.join(root, "feed")
    checkpoint = os.path.join(root, "ckpt")
    base.write.parquet(target)

    def apply_and_feed(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        sp = batch_df.sparkSession
        tgt = sp.read.parquet(target).localCheckpoint(eager=True)
        changes = merge_cdf(
            tgt, batch_df, ["o_orderkey"], "is_delete"
        ).withColumn("_batch_id", F.lit(batch_id).cast("long"))
        changes.write.mode("append").parquet(feed)
        merged = merge_with_tombstones(tgt, batch_df, ["o_orderkey"])
        merged.write.mode("overwrite").parquet(target)

    def drain():
        q = (
            spark.readStream.schema(
                "o_orderkey long, o_custkey long, o_orderstatus string, "
                "is_delete boolean"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(source)
            .writeStream.foreachBatch(apply_and_feed)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    b0.coalesce(1).write.mode("append").parquet(source)
    drain()
    b1.coalesce(1).write.mode("append").parquet(source)
    drain()

    return spark.read.parquet(feed).orderBy(
        "_batch_id", "o_orderkey", "_change_type"
    )


@register(
    "streaming_quantile_sketch",
    # Streaming twin of the events_quantile_sketch certificate: the
    # drained stored-sketch estimates are rank-bracket-verified against
    # one exact scan, so the STRICT row is (q, exact N, within_eps).
    oracle="""
    SELECT CAST(t.q AS DOUBLE) AS q,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM events) AS n_total,
           TRUE AS within_eps
    FROM (VALUES (0.01), (0.25), (0.5), (0.75), (0.99)) AS t(q)
    ORDER BY q
    """,
)
def streaming_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict tier of :func:`streaming_quantile_sketch_estimates`
    (upgraded from rows-only): the drained stored-sketch estimates are
    wrapped in the rank-bracket certificate — one exact scan proves each
    estimate's true rank sits within ±ε·N of ⌈q·N⌉, so a lost batch,
    double-sketched file, or broken merge emits FALSE / a wrong N and
    hash-mismatches the oracle."""
    from ..operators.quantiles import _rank_bracket_certificate

    events = load_table(spark, sf_dir, "events").select("event_id", "value")
    est_df = streaming_quantile_sketch_estimates(spark, sf_dir).select(
        "q", "est_value", "n_total"
    )
    return _rank_bracket_certificate(events, est_df, ["q"], "n_total")


def streaming_quantile_sketch_estimates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quantile-sketch maintenance AT INGEST — the streaming twin of
    ``events_quantile_sketch``: each micro-batch appends its own
    compressed rank summaries (part_id offset by batch so summaries stay
    per-sorted-run exact) to a persistent sketch table; the serving read
    merges STORED summaries only — the arriving data is never rescanned.
    This is the pattern that keeps corpus-wide p99 live at 100 TB: the
    stream pays O(batch log batch) once, every later quantile query pays
    O(batches·parts/ε) metadata.

    The ±ε·N rank guarantee holds for ANY batch split because summaries
    are mergeable (error adds per summary, bounded by ε·n_summary);
    tests/test_quantiles.py pins the guarantee against the exact sorted
    corpus and that streaming-merged == batch-merged estimates."""
    from ..operators.quantiles import (
        QUANTILES,
        build_partition_sketches,
        merge_sketches,
        query_quantiles,
    )

    events = load_table(spark, sf_dir, "events").select("event_id", "value")
    staging = tempfile.mkdtemp(prefix="tds_stream_qsk_src_")
    events.repartition(3).write.mode("append").parquet(staging)
    store = tempfile.mkdtemp(prefix="tds_stream_qsk_store_")
    checkpoint = tempfile.mkdtemp(prefix="tds_stream_qsk_ckpt_")

    def append_sketch(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        sk = build_partition_sketches(batch_df, "value", num_parts=8)
        sk.withColumn(
            "part_id", F.col("part_id") + F.lit(int(batch_id) * 8)
        ).write.mode("append").parquet(store)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    q = (
        stream.writeStream.foreachBatch(append_sketch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = [
        (r.part_id, r.v, r.rmin, r.rmax, r.n_part)
        for r in spark.read.parquet(store).collect()
    ]
    values, rmin, rmax, total = merge_sketches(rows)
    assert total == events.count()  # no batch lost or double-sketched
    est = query_quantiles(values, rmin, rmax, total, QUANTILES)
    return spark.createDataFrame(
        [(qq, v, lo, hi, total) for qq, v, lo, hi in est],
        "q double, est_value double, rank_lo long, rank_hi long, n_total long",
    ).orderBy("q")


@register(
    "streaming_view_click_fulljoin",
    oracle="""
    SELECT v.event_id AS view_id, c.event_id AS click_id,
           COALESCE(v.user_id, c.user_id) AS user_id,
           v.ts AS view_ts, c.ts AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON v.user_id = c.user_id
     AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 10 MINUTE
    ORDER BY view_id, click_id
    """,
)
def streaming_view_click_fulljoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER join — both outer sides at once: every
    (view, click-within-10-min) pair, every unconverted view with a null
    click, AND every orphan click (no qualifying view before it) with a
    null view.  Eviction now has to prove impossibility in BOTH
    directions — a click is emitted unmatched only once the watermark
    passes the LATEST view time that could still claim it — which makes
    this the completeness certificate for the join-state machinery the
    inner/left variants exercise one side at a time.

    Same staging protocol as the left-outer query: one real file + one
    far-future sentinel file per side (maxFilesPerTrigger=1 → the
    sentinel batch pushes the closing watermark), sentinels join only
    each other (user −1) and are filtered from the output.  The drained
    stream must hash-match the batch FULL JOIN."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    views_dir = tempfile.mkdtemp(prefix="tds_ssfj_views_")
    clicks_dir = tempfile.mkdtemp(prefix="tds_ssfj_clicks_")
    max_ts = events.agg(F.max("ts")).first()[0]
    import datetime as dt

    sentinel_ts = max_ts + dt.timedelta(hours=2)
    for d, et in ((views_dir, "view"), (clicks_dir, "click")):
        events.filter(F.col("event_type") == et).coalesce(1).write.mode(
            "append"
        ).parquet(d)
        import pandas as _pd
        import pyarrow as _pa

        _write_sentinel_file(
            os.path.join(d, "zz-sentinel.parquet"),
            _pd.DataFrame(
                [(-1, sentinel_ts, -1, et)],
                columns=["event_id", "ts", "user_id", "event_type"],
            ),
            _pa.schema(
                [
                    ("event_id", _pa.int64()),
                    ("ts", _pa.timestamp("us")),
                    ("user_id", _pa.int64()),
                    ("event_type", _pa.string()),
                ]
            ),
        )
    table = f"stream_ssfj_{uuid.uuid4().hex[:8]}"
    left = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(views_dir)
        .withWatermark("ts", "30 minutes")
        .alias("l")
    )
    right = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(clicks_dir)
        .withWatermark("ts", "30 minutes")
        .alias("r")
    )
    join_expr = (
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("r.ts") >= F.col("l.ts"))
        & (F.col("r.ts") <= F.col("l.ts") + F.expr("INTERVAL 10 MINUTES"))
    )
    from .incremental import _stream_partitions

    with _stream_partitions(spark):
        q = (
            left.join(right, join_expr, "full_outer")
            .select(
                F.col("l.event_id").alias("view_id"),
                F.col("r.event_id").alias("click_id"),
                F.coalesce(F.col("l.user_id"), F.col("r.user_id")).alias(
                    "user_id"
                ),
                F.col("l.ts").alias("view_ts"),
                F.col("r.ts").alias("click_ts"),
            )
            .writeStream.format("memory")
            .queryName(table)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.table(table)
        .filter(F.col("user_id") != -1)
        .orderBy("view_id", "click_id")
    )


def _percolate_oracle_streaming() -> str:
    from ..operators import retrieval as _r  # noqa: F401
    from ..registry import _REGISTRY

    return _REGISTRY["text_percolate"].oracle


@register("streaming_percolate", oracle=_percolate_oracle_streaming())
def streaming_percolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percolation AT INGEST — the alerting deployment shape: each
    micro-batch of arriving documents is matched against the standing
    queries and its (query_id, doc_id) alerts appended to the alert
    sink; matching is per-document stateless, so the drained alert
    stream must equal the batch percolation of the same corpus (same
    oracle).  Three document drops force multi-batch coverage; the
    broadcast query table rebuilds per batch at O(queries) cost."""
    from ..operators.retrieval import percolate

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    staging = tempfile.mkdtemp(prefix="tds_stream_perc_src_")
    docs.repartition(3).write.mode("append").parquet(staging)
    sink = tempfile.mkdtemp(prefix="tds_stream_perc_sink_")
    checkpoint = tempfile.mkdtemp(prefix="tds_stream_perc_ckpt_")

    def match_batch(batch_df, _batch_id):
        if batch_df.isEmpty():
            return
        percolate(batch_df).write.mode("append").parquet(sink)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    q = (
        stream.writeStream.foreachBatch(match_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(sink).orderBy("query_id", "doc_id")


@register(
    "streaming_catalog_ingest",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM events
    GROUP BY 1
    ORDER BY day
    """,
)
def streaming_catalog_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ATOMIC MULTI-TABLE streaming ingest: every micro-batch commits the
    fact rows AND its batch-log row as ONE catalog transaction
    (``multi_table_commit`` with the batch id as the catalog-level
    idempotence key), so a reader pinned to any txn sees facts and their
    audit log at a consistent cut — never facts without their log entry —
    and an at-least-once foreachBatch replay re-resolves to the txn that
    first carried its batch id instead of double-committing (both tables'
    versioned commits are also per-table idempotent under the derived
    ``app/table`` key).

    Drain protocol: three file drops under maxFilesPerTrigger=1; inline
    asserts pin one txn per non-empty batch and the batch-log row count
    reconciling with the txn count.  The returned relation is the daily
    rollup of the FINAL cut's facts — hash-matched against the raw
    events, so any batch lost, duplicated, or torn across the two tables
    breaks the oracle."""
    from ..operators.timetravel import (
        catalog_history,
        multi_table_commit,
        multi_table_read,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    staging = tempfile.mkdtemp(prefix="tds_stream_cat_src_")
    events.repartition(3).write.mode("append").parquet(staging)
    root = tempfile.mkdtemp(prefix="tds_stream_cat_root_")
    checkpoint = tempfile.mkdtemp(prefix="tds_stream_cat_ckpt_")

    def commit_batch(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        log = batch_df.agg(
            F.lit(int(batch_id)).alias("batch_id"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("cents").alias("sum_cents"),
        )
        multi_table_commit(
            batch_df.sparkSession,
            root,
            {"facts": batch_df, "batchlog": log},
            txn_id=("stream-catalog", int(batch_id)),
        )

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    q = (
        stream.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    history = catalog_history(spark, root)
    assert len(history) >= 3, [m["txn"] for m in history]
    cut = multi_table_read(spark, root)
    # audit-log reconciliation inside the final consistent cut
    n_log = cut["batchlog"].count()
    assert n_log == len(history), (n_log, len(history))
    logged = cut["batchlog"].agg(F.sum("n_rows")).first()[0]
    assert logged == cut["facts"].count(), (logged,)
    return (
        cut["facts"]
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("sum_cents"),
        )
        .orderBy("day")
    )


@register(
    "streaming_interval_overlap",
    # the raw-span interval overlap as a batch theta join: view spans
    # [ts, ts+5min] x purchase windows [ts-30min, ts] overlap iff
    # p.ts in [v.ts, v.ts + 35min]
    oracle="""
    SELECT v.user_id,
           v.event_id AS view_id,
           p.event_id AS purchase_id,
           LEAST(epoch_us(v.ts + INTERVAL 5 MINUTE), epoch_us(p.ts))
             - GREATEST(epoch_us(v.ts), epoch_us(p.ts - INTERVAL 30 MINUTE))
             AS overlap_us
    FROM events v JOIN events p
      ON v.user_id = p.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 35 MINUTE
    """,
)
def streaming_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval overlap join AT INGEST — the streaming twin of
    ``events_interval_overlap``'s raw-span tier: each view carries the
    span [ts, ts+5min], each purchase the lookback window [ts−30min, ts],
    and two bounded intervals overlap iff the purchase lands within
    35 minutes after the view — so the overlap join IS a native
    watermarked stream-stream join with a bounded time-range condition
    (join state evicts once the watermark passes ts + 35min; O(rows in
    window), unbounded-feed safe).  The drained stream must equal the
    batch theta-join bit-for-bit, overlap lengths in exact microseconds.

    Scale note: the BATCH operator buckets COALESCED islands (unbounded
    spans need the bucket trick); the STREAMING form is only expressible
    because raw spans are bounded — which is exactly when Spark's native
    range join applies.  Both live in the registry so the trade is
    documented by construction."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    views_dir = tempfile.mkdtemp(prefix="tds_ss_iv_views_")
    pur_dir = tempfile.mkdtemp(prefix="tds_ss_iv_pur_")
    events.filter(F.col("event_type") == "view").coalesce(1).write.mode(
        "append"
    ).parquet(views_dir)
    events.filter(F.col("event_type") == "purchase").coalesce(1).write.mode(
        "append"
    ).parquet(pur_dir)
    table = f"stream_ivoverlap_{uuid.uuid4().hex[:8]}"
    join_expr = (
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("r.ts") >= F.col("l.ts"))
        & (F.col("r.ts") <= F.col("l.ts") + F.expr("INTERVAL 35 MINUTES"))
    )
    overlap_us = F.least(
        F.unix_micros(F.col("l.ts")) + F.lit(300_000_000),
        F.unix_micros(F.col("r.ts")),
    ) - F.greatest(
        F.unix_micros(F.col("l.ts")),
        F.unix_micros(F.col("r.ts")) - F.lit(1_800_000_000),
    )
    select_cols = [
        F.col("l.user_id").alias("user_id"),
        F.col("l.event_id").alias("view_id"),
        F.col("r.event_id").alias("purchase_id"),
        overlap_us.alias("overlap_us"),
    ]
    return run_stream_stream_join_to_memory(
        spark, views_dir, pur_dir, table, events.schema, join_expr, select_cols
    )


@register(
    "streaming_holt_linear",
    # the drained stream must hash-match the batch recurrence replayed
    # as a recursive CTE (same algebra as events_holt_linear, per-user
    # series over event cents instead of hourly counts)
    oracle="""
    WITH RECURSIVE seq AS (
        SELECT user_id,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS rn,
               CAST(FLOOR(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    rec AS (
        SELECT user_id, rn, cents,
               CAST(cents AS DOUBLE) AS l, CAST(0 AS DOUBLE) AS b
        FROM seq WHERE rn = 1
        UNION ALL
        SELECT s.user_id, s.rn, s.cents,
               0.25 * s.cents + 0.75 * (r.l + r.b),
               0.125 * ((0.25 * s.cents + 0.75 * (r.l + r.b)) - r.l)
                   + 0.875 * r.b
        FROM rec r JOIN seq s
          ON s.user_id = r.user_id AND s.rn = r.rn + 1
    )
    SELECT user_id, rn, cents,
           ROUND(l, 6) + 0.0 AS level,
           ROUND(b, 6) + 0.0 AS trend
    FROM rec
    ORDER BY user_id, rn
    """,
)
def streaming_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt level/trend smoothing AT INGEST (:mod:`.holt`): each user's
    spend series folds through the recurrence in keyed state, one output
    row per event, emitted only when the watermark seals its position in
    the series (the cap.py reorder-buffer discipline — Holt is
    order-sensitive, so nothing folds until no earlier row can arrive).
    Day-sliced drops force series whose folding spans micro-batches; the
    drained output must hash-match the batch recurrence (recursive-CTE
    oracle).  Dyadic α/β keep the stateful Python fold and the SQL
    recursion on identical IEEE ops."""
    from .holt import holt_stream
    from .incremental import STREAM_SHUFFLE_PARTITIONS, _stream_partitions

    events = load_table(spark, sf_dir, "events")
    rows = events.select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    d0, d1 = rows.agg(
        F.min(F.col("ts").cast("date")), F.max(F.col("ts").cast("date"))
    ).first()
    step = max(1, ((d1 - d0).days + 1) // 3)
    staging = tempfile.mkdtemp(prefix="tds_stream_holt_")
    tmp = tempfile.mkdtemp(prefix="tds_holt_slices_")
    (
        rows.withColumn(
            "slice",
            F.least(
                F.floor(
                    F.datediff(F.col("ts").cast("date"), F.lit(d0)) / step
                ),
                F.lit(2),
            ),
        )
        .repartition("slice")
        .write.partitionBy("slice")
        .mode("overwrite")
        .parquet(tmp)
    )
    for i in range(3):
        sdir = os.path.join(tmp, f"slice={i}")
        if not os.path.isdir(sdir):
            continue
        base = 1_700_000_000 + i * 10
        for j, f in enumerate(sorted(os.listdir(sdir))):
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                dst = os.path.join(staging, f"slice-{i:03d}-{j:03d}.parquet")
                shutil.copyfile(os.path.join(sdir, f), dst)
                os.utime(dst, (base, base))
    import pandas as _pd
    import pyarrow as _pa

    _write_sentinel_file(
        os.path.join(staging, "zz-sent.parquet"),
        _pd.DataFrame(
            {
                "user_id": [-1],
                "ts": [_pd.Timestamp("2030-01-01")],
                "event_id": [-1],
                "cents": [0],
            }
        ),
        _pa.schema(
            [
                ("user_id", _pa.int64()),
                ("ts", _pa.timestamp("us")),
                ("event_id", _pa.int64()),
                ("cents", _pa.int64()),
            ]
        ),
        mtime=1_700_000_100,
    )
    table = f"stream_holt_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema(
            "user_id long, ts timestamp, event_id long, cents long"
        )
        .option("maxFilesPerTrigger", 2)
        .parquet(staging)
    )
    # Lateness must cover the FULL fixture span: slices arrive as separate
    # micro-batches, so a fixed "90 days" would silently watermark-drop
    # rows if the events table ever spanned longer (ADVICE r09 #4).
    lateness_days = (d1 - d0).days + 2
    with _stream_partitions(spark, n=max(32, STREAM_SHUFFLE_PARTITIONS)):
        q = (
            holt_stream(stream, lateness=f"{lateness_days} days")
            .writeStream.format("memory")
            .queryName(table)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.table(table)
        .select(
            "user_id",
            "rn",
            "cents",
            (F.round("level", 6) + F.lit(0.0)).alias("level"),
            (F.round("trend", 6) + F.lit(0.0)).alias("trend"),
        )
        .orderBy("user_id", "rn")
    )


@register(
    "streaming_misra_gries_topk",
    # streaming twin of the batch Misra-Gries certificate: partial
    # summaries accumulate per micro-batch, the serving read merges the
    # STORED partials only, and the oracle's exact top-k + guarantee
    # booleans must still hold — the bound is partition- AND
    # batch-split-invariant by the mergeable-summaries theorem.
    oracle="""
    WITH keyed AS (
        SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY 1
    ),
    ranked AS (
        SELECT user_id, cnt,
               ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id) AS rnk
        FROM keyed
    )
    SELECT CAST(rnk AS BIGINT) AS rnk, user_id,
           CAST(cnt AS BIGINT) AS exact_cnt,
           TRUE AS mg_le_exact, TRUE AS mg_within_bound
    FROM ranked
    WHERE rnk <= 10
    ORDER BY rnk
    """,
)
def streaming_misra_gries_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries heavy-hitter maintenance AT INGEST: each micro-batch
    appends its own ≤k-counter partial summaries to a persistent store
    (``foreachBatch`` — the stored-sketch pattern of
    ``streaming_quantile_sketch``); the serving read folds STORED
    partials only, never rescanning arrivals.  The ``true − N/(k+1) ≤
    est ≤ true`` band survives ANY batch split because MG summaries
    merge associatively — the same theorem the batch tier's partition
    merge rides, now across time instead of space.

    Strict certificate identical to ``events_misra_gries_topk``: the
    oracle recomputes the exact top-k and expects both guarantee
    booleans TRUE after the stream is drained."""
    from ..operators.freq import MG_K, merge_mg_partials, misra_gries_partials
    from .incremental import STREAM_SHUFFLE_PARTITIONS, _stream_partitions

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    staging = tempfile.mkdtemp(prefix="tds_stream_mg_src_")
    events.repartition(6).write.mode("append").parquet(staging)
    store = tempfile.mkdtemp(prefix="tds_stream_mg_store_")
    checkpoint = tempfile.mkdtemp(prefix="tds_stream_mg_ckpt_")

    def append_partials(batch_df, batch_id):
        # Idempotent replay (ADVICE r10 #1): a micro-batch replayed after a
        # task failure / checkpoint restart re-OVERWRITES its own
        # ``batch_id=N`` subdir instead of appending a second copy of the
        # partials — double-counted partials could push the folded estimate
        # ABOVE the exact count and flip the mg_le_exact certificate.  The
        # hive-style subdir is discovered as a partition column on read and
        # ignored by the key-wise fold.
        if batch_df.isEmpty():
            return
        misra_gries_partials(batch_df, "user_id", MG_K).write.mode(
            "overwrite"
        ).parquet(f"{store}/batch_id={batch_id}")

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(staging)
    )
    with _stream_partitions(spark, n=STREAM_SHUFFLE_PARTITIONS):
        q = (
            stream.writeStream.foreachBatch(append_partials)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    summary = merge_mg_partials(
        spark.read.parquet(store).collect(), "user_id", MG_K
    )
    n_rows = events.count()
    bound = n_rows // (MG_K + 1)
    keyed = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    from pyspark.sql.window import Window as _W

    w = _W.orderBy(F.col("cnt").desc(), "user_id")
    exact = (
        keyed.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 10)
        .collect()
    )
    rows = [
        (
            r["rnk"],
            r["user_id"],
            r["cnt"],
            summary.get(r["user_id"], 0) <= r["cnt"],
            summary.get(r["user_id"], 0) >= r["cnt"] - bound,
        )
        for r in exact
    ]
    return spark.createDataFrame(
        rows,
        "rnk bigint, user_id bigint, exact_cnt bigint, "
        "mg_le_exact boolean, mg_within_bound boolean",
    ).orderBy("rnk")


@register(
    "streaming_slo_burn_rate",
    # streaming twin of events_slo_burn_rate: hourly (total, error)
    # partials accumulate per micro-batch into a persistent store
    # (idempotent per-batch_id overwrite, the replay-safe pattern the
    # Misra-Gries twin uses), the serving read merges STORED partials
    # only, and the RANGE-window alert tail must still equal the batch
    # answer - counts are commutative monoids, so any batch split of an
    # hour must merge exactly.
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h,
               CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(COUNT(*) FILTER (WHERE event_type = 'error')
                    AS BIGINT) AS n_err
        FROM events GROUP BY 1
    ),
    windowed AS (
        SELECT h, n_total, n_err,
               SUM(n_total) OVER w6 AS total_6h,
               SUM(n_err)   OVER w6 AS err_6h
        FROM hourly
        WINDOW w6 AS (ORDER BY epoch(h)
                      RANGE BETWEEN 18000 PRECEDING AND CURRENT ROW)
    )
    SELECT h AS hour, n_total AS total_1h, n_err AS err_1h,
           CAST(total_6h AS BIGINT) AS total_6h,
           CAST(err_6h AS BIGINT) AS err_6h,
           CAST(1000000 * n_err // n_total AS BIGINT) AS rate_1h_ppm,
           CAST(1000000 * err_6h // total_6h AS BIGINT) AS rate_6h_ppm,
           (1000000 * n_err // n_total > 250000
            AND 1000000 * err_6h // total_6h > 250000) AS burn_alert
    FROM windowed ORDER BY hour
    """,
)
def streaming_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLO burn-rate maintenance AT INGEST: each micro-batch appends its
    own hourly (n_total, n_err) partials to a persistent store — written
    to a per-``batch_id`` subpath with overwrite, so a replayed
    micro-batch (task failure / checkpoint restart) can never
    double-count an hour — and the serving read folds STORED partials
    only, never rescanning arrivals.  Hours routinely split across
    micro-batches (``maxFilesPerTrigger=2`` over a 6-way staging), so
    matching the batch oracle certifies the cross-batch partial merge;
    the alert tail itself is the shared :func:`slo_burn_tail`."""
    from ..plans.behavior import slo_burn_tail

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type"
    )
    staging = tempfile.mkdtemp(prefix="tds_stream_slo_src_")
    events.repartition(6).write.mode("append").parquet(staging)
    store = tempfile.mkdtemp(prefix="tds_stream_slo_store_")
    checkpoint = tempfile.mkdtemp(prefix="tds_stream_slo_ckpt_")

    from .incremental import STREAM_SHUFFLE_PARTITIONS, _stream_partitions

    def append_partials(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        (
            batch_df.groupBy(F.date_trunc("hour", "ts").alias("h"))
            .agg(
                F.count(F.lit(1)).alias("n_total"),
                F.count(
                    F.when(F.col("event_type") == "error", 1)
                ).alias("n_err"),
            )
            .write.mode("overwrite")
            .parquet(f"{store}/batch_id={batch_id}")
        )

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(staging)
    )
    with _stream_partitions(spark, n=STREAM_SHUFFLE_PARTITIONS):
        q = (
            stream.writeStream.foreachBatch(append_partials)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    hourly = (
        spark.read.parquet(store)
        .groupBy("h")
        .agg(
            F.sum("n_total").alias("n_total"),
            F.sum("n_err").alias("n_err"),
        )
    )
    return slo_burn_tail(hourly, "streaming_slo_burn_rate")


@register(
    "streaming_fd_audit",
    # streaming twin of the approximate-FD profiler: (lhs, rhs) counts
    # are associative under SUM, so per-micro-batch partials stored with
    # the idempotent batch_id=N overwrite fold into exactly the batch
    # audit row regardless of how arrivals were split.
    oracle="""
    SELECT 'events.user_id->event_type' AS fd,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           COUNT(*) AS n_lhs,
           CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS violating_lhs,
           CAST(SUM(n) - SUM(mx) AS BIGINT) AS g3_rows,
           ROUND(CAST(SUM(n) - SUM(mx) AS DOUBLE) / SUM(n), 6) AS g3_rate,
           SUM(n) = SUM(mx) AS holds
    FROM (
        SELECT user_id, SUM(c) AS n, MAX(c) AS mx, COUNT(*) AS n_rhs
        FROM (SELECT user_id, event_type, COUNT(*) AS c
              FROM events GROUP BY 1, 2)
        GROUP BY user_id
    )
    """,
)
def streaming_fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit AT INGEST: each micro-batch writes its
    own (user_id, event_type) count partials to a persistent store under
    an idempotent ``batch_id=N`` overwrite (replay-safe — a re-fired
    batch replaces its own partials instead of double-counting); the
    serving read folds STORED partials only, never rescanning arrivals,
    and feeds the same :func:`~...operators.quality.fd_audit_from_counts`
    core the batch profiler uses.  Counts are mergeable summaries, so
    the audit row is batch-split-invariant — stream == batch oracle."""
    from ..operators.quality import fd_audit_from_counts
    from .incremental import STREAM_SHUFFLE_PARTITIONS, _stream_partitions

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    staging = tempfile.mkdtemp(prefix="tds_stream_fd_src_")
    events.repartition(6).write.mode("append").parquet(staging)
    store = tempfile.mkdtemp(prefix="tds_stream_fd_store_")
    checkpoint = tempfile.mkdtemp(prefix="tds_stream_fd_ckpt_")

    def append_partials(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        batch_df.groupBy("user_id", "event_type").agg(
            F.count(F.lit(1)).alias("c")
        ).write.mode("overwrite").parquet(f"{store}/batch_id={batch_id}")

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(staging)
    )
    with _stream_partitions(spark, n=STREAM_SHUFFLE_PARTITIONS):
        q = (
            stream.writeStream.foreachBatch(append_partials)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    folded = (
        spark.read.parquet(store)
        .groupBy("user_id", "event_type")
        .agg(F.sum("c").alias("c"))
    )
    return fd_audit_from_counts(
        folded, "user_id", "event_type", "events.user_id->event_type"
    )


from ..operators.evalmetrics import _AUC_TAIL_SQL, _SCORED_SQL


@register(
    "streaming_classifier_auc",
    # streaming twin of classifier_auc_eval: ROC AUC is NOT windowable,
    # but its sufficient statistics ARE — per-(lang, milli-score-bucket)
    # (cnt, pos) counts merge additively across any batch split, so each
    # micro-batch stores its bucket partials (idempotent per-batch_id
    # overwrite) and the serving read folds STORED partials through the
    # shared Mann-Whitney rank tail.  Matching the batch oracle (the SQL
    # is the batch query's, verbatim) certifies that a ranking metric can
    # be maintained at ingest without ever rescanning or re-sorting raw
    # documents.
    oracle=f"WITH {_SCORED_SQL}, {_AUC_TAIL_SQL}",
)
def streaming_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC maintenance AT INGEST via mergeable score-bucket partials."""
    from ..operators.evalmetrics import _scored_labeled, auc_from_buckets

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    staging = tempfile.mkdtemp(prefix="tds_stream_auc_src_")
    docs.repartition(6).write.mode("append").parquet(staging)
    store = tempfile.mkdtemp(prefix="tds_stream_auc_store_")
    checkpoint = tempfile.mkdtemp(prefix="tds_stream_auc_ckpt_")

    from .incremental import STREAM_SHUFFLE_PARTITIONS, _stream_partitions

    def append_partials(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        (
            _scored_labeled(batch_df)
            .groupBy("lang", "mw")
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("pos"))
            .write.mode("overwrite")
            .parquet(f"{store}/batch_id={batch_id}")
        )

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(staging)
    )
    with _stream_partitions(spark, n=STREAM_SHUFFLE_PARTITIONS):
        q = (
            stream.writeStream.foreachBatch(append_partials)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    folded = (
        spark.read.parquet(store)
        .groupBy("lang", "mw")
        .agg(F.sum("cnt").alias("cnt"), F.sum("pos").alias("pos"))
    )
    return auc_from_buckets(folded)


from ..operators.quantiles import _LOG2_HIST_ORACLE


@register(
    "streaming_log2_histogram",
    # streaming twin of events_log2_histogram: log2 bin counts are an
    # additive commutative monoid, so each micro-batch stores its own
    # bin partials (idempotent per-batch_id overwrite) and the serving
    # read folds STORED partials through the shared percentile tail —
    # latency percentiles maintained at ingest with O(bins) state and
    # zero raw-row retention, the observability-pipeline shape.  The
    # oracle is the batch query's SQL, verbatim.
    oracle=_LOG2_HIST_ORACLE,
)
def streaming_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HDR histogram maintenance at ingest via stored bin partials."""
    from .incremental import STREAM_SHUFFLE_PARTITIONS, _stream_partitions

    events = load_table(spark, sf_dir, "events").select("event_id", "value")
    staging = tempfile.mkdtemp(prefix="tds_stream_l2h_src_")
    events.repartition(6).write.mode("append").parquet(staging)
    store = tempfile.mkdtemp(prefix="tds_stream_l2h_store_")
    checkpoint = tempfile.mkdtemp(prefix="tds_stream_l2h_ckpt_")

    def append_partials(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        (
            batch_df.select(
                F.floor(F.col("value") * 1000000.0 + F.lit(0.5))
                .cast("long")
                .alias("v_micro")
            )
            .filter(F.col("v_micro") > 0)
            .select(F.floor(F.log2("v_micro")).cast("long").alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n"))
            .write.mode("overwrite")
            .parquet(f"{store}/batch_id={batch_id}")
        )

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(staging)
    )
    with _stream_partitions(spark, n=STREAM_SHUFFLE_PARTITIONS):
        q = (
            stream.writeStream.foreachBatch(append_partials)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    folded = (
        spark.read.parquet(store)
        .groupBy("bin")
        .agg(F.sum("n").alias("n"))
    )
    from ..operators.quantiles import log2_histogram_tail

    return log2_histogram_tail(folded)
