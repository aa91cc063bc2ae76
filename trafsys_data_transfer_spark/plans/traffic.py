"""Reference-parity traffic transforms: normalize, rollup, watermark.

Covers SURVEY.md §2.2 (T1-T3) and §2.3: the per-record coercions the
reference applies (boolean→int, ISO string→timestamp) plus the hour/day
bucket aggregation the upstream API performs for it (``DataSummedByDay``
knob, /root/reference/script.js:146) — re-expressed so grain is a
query-time choice in our engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: ISO pattern used by the reference's Oracle TO_DATE
#: (/root/reference/script.js:191): YYYY-MM-DD"T"HH24:MI:SS.
PERIOD_ENDING_FORMAT = "yyyy-MM-dd'T'HH:mm:ss"


def normalize_traffic(raw: DataFrame) -> DataFrame:
    """T1 + T2: boolean→int cast and timestamp parse.

    * ``IsInternal = +record.IsInternal`` (script.js:160-163) →
      ``cast("int")`` — Oracle has no boolean type.
    * ``TO_DATE(:PeriodEnding, 'YYYY-MM-DD"T"HH24:MI:SS')`` (script.js:191)
      → ``to_timestamp`` with the same pattern, executed engine-side
      instead of sink-side.

    Both are narrow, codegen'd column expressions — no shuffle, scales
    linearly with input.
    """
    return raw.select(
        "SiteCode",
        "Location",
        F.col("IsInternal").cast("int").alias("IsInternal"),
        F.to_timestamp("PeriodEnding", PERIOD_ENDING_FORMAT).alias("PeriodEnding"),
        "Ins",
        "Outs",
    )


def filter_window(
    df: DataFrame,
    date_from: str,
    date_to: str,
    site_code: str | None = None,
    include_internal: bool = True,
) -> DataFrame:
    """T6: the filters the reference pushes to the API as query params
    (DateFrom/DateTo/SiteCode/IncludeInternalLocations,
    script.js:143-149), expressed as DataFrame predicates so Catalyst
    pushes them into the parquet scan / partition pruning instead.

    ``date_to`` is inclusive of the whole day, matching the API's
    day-granular window.
    """
    out = df.filter(
        (F.col("PeriodEnding") >= F.lit(date_from))
        & (F.col("PeriodEnding") < F.date_add(F.lit(date_to).cast("date"), 1))
    )
    if site_code is not None:
        out = out.filter(F.col("SiteCode") == site_code)
    if not include_internal:
        out = out.filter(F.col("IsInternal") == 0)
    return out


def rollup_traffic(df: DataFrame, grain: str = "hour") -> DataFrame:
    """§2.3: tumbling-window sum of Ins/Outs per (SiteCode, Location).

    The reference receives hour-ending buckets pre-aggregated upstream
    (script.js:131,146); here the grain is computed in-engine:
    ``PeriodEnding`` of the output row is the *end* of its bucket, matching
    the API's hour-ending convention.  ``grain`` ∈ {"hour", "day"} mirrors
    the ``DataSummedByDay`` knob.

    Buckets are ``(start, end]``: real TrafSys rows are hour-ending records
    stamped *exactly* on the hour (script.js:131 — "The end of the hour-long
    time period this record corresponds to"), so an input at ``01:00:00``
    belongs to the bucket ending ``01:00``, not ``02:00``.  Truncating after
    subtracting one second maps on-the-boundary timestamps into the bucket
    they end, while sub-boundary timestamps land unchanged.

    Plan shape: map-side partial sums → one shuffle on the (site, location,
    bucket) key → final sums.  Cardinality is bounded by sites × locations ×
    buckets, so the reduce side stays small at any input scale.
    """
    if grain not in ("hour", "day"):
        raise ValueError(f"grain must be 'hour' or 'day', got {grain!r}")
    interval = "1 hour" if grain == "hour" else "1 day"
    bucket_end = F.date_trunc(
        grain, F.col("PeriodEnding") - F.expr("INTERVAL 1 SECOND")
    ) + F.expr(f"INTERVAL {interval}")
    return (
        df.groupBy(
            "SiteCode",
            "Location",
            bucket_end.alias("PeriodEnding"),
        )
        .agg(F.sum("Ins").alias("Ins"), F.sum("Outs").alias("Outs"))
    )
