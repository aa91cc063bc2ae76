"""Structured Streaming realisation of the reference's implicit streaming
semantics (SURVEY.md §2.8).

The reference is a scheduled micro-batch system with hand-rolled streaming
machinery: a persisted watermark (previous run's ``ToDate`` becomes the next
``FromDate``, /root/reference/script.js:54), at-least-once delivery made
effectively-once by an idempotent keyed upsert (script.js:195-200), and
late/corrected data handled by re-running old windows through the same
upsert.  Structured Streaming gives each of those a first-class counterpart:

* offset tracking / watermark table  → checkpointed file-source offsets
* nightly re-run loop                → ``Trigger.AvailableNow`` micro-batches
* PL/SQL upsert sink                 → ``foreachBatch`` → partitioned MERGE
* hour-ending buckets                → ``window(PeriodEnding, "1 hour")``
* late-data tolerance                → ``withWatermark`` bounded lateness

Scale posture: the stream never shuffles before the windowed aggregation;
state is bounded by (sites × locations × open windows), and the MERGE sink
rewrites only the date partitions present in each micro-batch.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import dedupe_last_write, merge_upsert_parquet
from ..plans.pipeline import PARTITION_COL
from ..plans.traffic import normalize_traffic
from ..schemas import TRAFFIC_PK, TRAFFIC_RAW_SCHEMA


#: State-store partition count for the engine's bounded stream drains.
#: Stateful operators pin their partitioning at first start and do NOT get
#: AQE coalescing — every micro-batch pays one state-store task per
#: partition forever.  Size it to expected state volume, not to cores: the
#: correctness-gate drains here hold fixture-scale state, where 8 beats 32
#: by ~2.5× wall-clock.  A production stream sizes this to its own volume
#: BEFORE first start (it is frozen into the checkpoint).  The env
#: override is the sizing lever (used by tools/scale_probe.py sweeps and
#: by any deployment that wants cluster-scale state partitioning without
#: a code change).
STREAM_SHUFFLE_PARTITIONS = int(
    os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS", "8")
)

#: Rule-of-thumb ceiling on distinct state keys per state-store partition
#: before drain wall-clock becomes partition-bound.  Calibrated from the
#: SCALE.md 11th/12th sweeps: at 10x fixture volume (~75k keys) the
#: default 8 partitions (~9.4k keys each) ran 24.7 s for streaming_scd2
#: while 32 partitions (~2.3k keys each) ran 15.7 s — and the partition
#: count FREEZES into the checkpoint at first start, so an undersized
#: default is an operational trap, not a tuning knob you can turn later.
STATE_KEYS_PER_PARTITION_TARGET = 4_000


def warn_if_state_partitions_undersized(est_keys: int, n_partitions: int) -> bool:
    """Loud pre-start guidance (VERDICT r06 task 4): if the estimated
    keyed-state cardinality overloads the configured state-partition
    count, emit a UserWarning naming the frozen-checkpoint trap and the
    recommended count.  Returns True when the warning fired.

    Call BEFORE a stateful query's first ``start()`` — afterwards the
    partitioning is pinned in the checkpoint and only a new checkpoint
    (full state rebuild) can change it."""
    import math
    import warnings

    if est_keys <= n_partitions * STATE_KEYS_PER_PARTITION_TARGET:
        return False
    rec = 2 ** math.ceil(
        math.log2(max(1, est_keys / STATE_KEYS_PER_PARTITION_TARGET))
    )
    warnings.warn(
        f"streaming state partitions undersized: ~{est_keys} state keys "
        f"across {n_partitions} partitions "
        f"(~{est_keys // max(1, n_partitions)} keys/partition, target "
        f"<= {STATE_KEYS_PER_PARTITION_TARGET}). The count FREEZES into "
        f"the checkpoint at first start; set "
        f"SPARK_GRAFT_STREAM_PARTITIONS={rec} (or pass n={rec}) BEFORE "
        f"starting, or plan a checkpoint rebuild to resize later.",
        UserWarning,
        stacklevel=3,
    )
    return True


@contextmanager
def _stream_partitions(
    spark: SparkSession,
    n: int = STREAM_SHUFFLE_PARTITIONS,
    est_keys: int | None = None,
):
    """Temporarily set shuffle partitions for a streaming query's first
    start; restored afterwards so batch plans keep the session default.
    Pass ``est_keys`` (estimated distinct state keys) to get the
    undersizing warning before the partitioning is frozen."""
    if est_keys is not None:
        warn_if_state_partitions_undersized(est_keys, n)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def read_traffic_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream of landed TrafSys payloads (one JSON record per
    line), schema-enforced exactly like the batch path (§1.3): the producer
    is trusted, the reader declares the shape."""
    return spark.readStream.schema(TRAFFIC_RAW_SCHEMA).json(source_dir)


def hourly_rollup_stream(
    raw_stream: DataFrame, lateness: str = "2 hours"
) -> DataFrame:
    """Streaming hour-ending rollup: normalize → bounded-lateness watermark
    → tumbling 1-hour window sums.  Output rows carry ``PeriodEnding`` =
    window end, matching the API's hour-ending convention
    (/root/reference/script.js:131).

    Windows are ``(start, end]`` like the batch rollup: ``F.window`` is
    ``[start, end)``, so the event time is shifted back one second before
    windowing — an exactly-on-the-hour record (the shape every real TrafSys
    row has) stays in the bucket it *ends* instead of opening the next one.
    The watermark rides the shifted column; a constant offset preserves all
    lateness semantics."""
    normalized = normalize_traffic(raw_stream).withColumn(
        "BucketTs", F.col("PeriodEnding") - F.expr("INTERVAL 1 SECOND")
    )
    return (
        normalized.withWatermark("BucketTs", lateness)
        .groupBy(
            "SiteCode",
            "Location",
            F.window("BucketTs", "1 hour").alias("w"),
        )
        .agg(F.sum("Ins").alias("Ins"), F.sum("Outs").alias("Outs"))
        .select(
            "SiteCode",
            "Location",
            F.col("w.end").alias("PeriodEnding"),
            "Ins",
            "Outs",
        )
    )


def run_rollup_to_memory(
    spark: SparkSession, source_dir: str, table_name: str
) -> DataFrame:
    """Drain the source with ``Trigger.AvailableNow`` into an in-memory sink
    (complete mode → every window emitted regardless of watermark position)
    and return the result table.  Used by tests and the correctness gate to
    prove stream == batch on the same input."""
    with _stream_partitions(spark):
        q = (
            hourly_rollup_stream(read_traffic_stream(spark, source_dir))
            .writeStream.format("memory")
            .queryName(table_name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(table_name)


def run_stream_dedup_to_memory(
    spark: SparkSession,
    source_dir: str,
    table_name: str,
    schema,
    keys: list[str],
    event_time_col: str = "ts",
    lateness: str = "24 hours",
) -> DataFrame:
    """Streaming exactly-once-per-key dedup over an at-least-once source:
    ``withWatermark`` + ``dropDuplicatesWithinWatermark(keys)`` drained with
    ``Trigger.AvailableNow`` into a memory sink.

    This is the streaming twin of the reference's idempotent-upsert replay
    tolerance (§2.8): redelivered rows inside the lateness horizon are
    dropped by keyed state instead of collapsed by the sink.  Unlike plain
    ``dropDuplicates`` on a stream, the *WithinWatermark* form expires each
    key's state once the watermark passes it — state is bounded by keys per
    lateness window, not keys ever seen, which is what makes it viable on
    an unbounded 100 TB/day feed.
    """
    # One file per micro-batch: redelivered files arrive in LATER batches,
    # so surviving the oracle check proves cross-batch keyed state, not
    # just within-batch dedup.
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    with _stream_partitions(spark):
        q = (
            stream.withWatermark(event_time_col, lateness)
            .dropDuplicatesWithinWatermark(keys)
            .writeStream.format("memory")
            .queryName(table_name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(table_name)


def run_stream_stream_join_to_memory(
    spark: SparkSession,
    left_dir: str,
    right_dir: str,
    table_name: str,
    schema,
    join_expr,
    select_cols: list,
    event_time_col: str = "ts",
    lateness: str = "30 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner join drained with AvailableNow into
    a memory sink.

    Both sides buffer rows in join state until the watermark passes the
    time-range condition's bound — state is O(rows inside the lateness ×
    range window per key), never the whole stream, which is what makes a
    view→click attribution join runnable on an unbounded feed.  The
    correctness contract (asserted by the oracle): a fully-drained
    bounded stream must emit exactly the batch inner join of the same
    inputs.
    """
    left = (
        spark.readStream.schema(schema).parquet(left_dir)
        .withWatermark(event_time_col, lateness)
        .alias("l")
    )
    right = (
        spark.readStream.schema(schema).parquet(right_dir)
        .withWatermark(event_time_col, lateness)
        .alias("r")
    )
    with _stream_partitions(spark):
        q = (
            left.join(right, join_expr)
            .select(*select_cols)
            .writeStream.format("memory")
            .queryName(table_name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(table_name)


def run_stream_merge(
    stream: DataFrame,
    target_path: str,
    checkpoint_dir: str,
) -> None:
    """Drain ANY raw-traffic stream through the nightly MERGE sink: one
    ``AvailableNow`` pass, each micro-batch normalized, deduped
    last-write-wins and MERGEd into the partitioned parquet target.

    Source-agnostic on purpose — the file-landing stream
    (:func:`run_incremental_merge`) and the registered ``trafsys``
    streaming DataSource (`sources/datasource.py`, where the checkpoint
    offset is the API watermark) both terminate here, so "fetch → upsert"
    is the same audited sink code whichever source feeds it.
    """
    spark = stream.sparkSession

    def _merge_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return  # T5: empty-batch short-circuit (script.js:183)
        updates = dedupe_last_write(
            normalize_traffic(batch),
            keys=TRAFFIC_PK,
            order_by=["Ins", "Outs", "IsInternal"],
        )
        merge_upsert_parquet(
            batch.sparkSession,
            target_path,
            updates.withColumn(PARTITION_COL, F.col("PeriodEnding").cast("date")),
            keys=TRAFFIC_PK,
            partition_col=PARTITION_COL,
        )

    with _stream_partitions(spark):
        q = (
            stream.writeStream.foreachBatch(_merge_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def run_incremental_merge(
    spark: SparkSession,
    source_dir: str,
    target_path: str,
    checkpoint_dir: str,
) -> None:
    """One ``AvailableNow`` pass: process every file not yet recorded in the
    checkpoint, MERGE each micro-batch into the partitioned parquet target.

    This is the reference's nightly loop with its two pieces of hand-rolled
    state replaced: the NeDB watermark (script.js:35, 54) becomes the
    checkpointed source offset log, and the PL/SQL upsert (script.js:182-215)
    becomes the partition-pruned MERGE.  Re-delivered or corrected rows are
    collapsed by ``dedupe_last_write`` inside the batch and last-write-wins
    MERGE across batches — at-least-once + idempotent sink = effectively
    once, the exact invariant the reference relies on (§2.8).
    """
    run_stream_merge(read_traffic_stream(spark, source_dir), target_path, checkpoint_dir)
