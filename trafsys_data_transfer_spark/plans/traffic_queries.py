"""Registered correctness queries for the reference-parity traffic pipeline.

The fixture set has no TrafSys API dump, so these queries first derive a
deterministic traffic-shaped batch from the ``events`` table (same
derivation in the Spark builder and the DuckDB oracle SQL), then exercise
each parity operator on it: normalize (T1/T2), window filter (T6), hourly /
daily rollup (§2.3), last-write-wins MERGE (S5), watermark top-1 (S7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import dedupe_last_write, merge_dataframes
from ..registry import register
from ..sources.fixtures import load_table
from .traffic import filter_window, normalize_traffic, rollup_traffic

# ---------------------------------------------------------------------------
# Deterministic events → traffic-record derivation (shared Spark + SQL).
# floor() before the bigint cast because Spark's double→long cast truncates
# while DuckDB's rounds — floor makes both exact.
# ---------------------------------------------------------------------------


def traffic_raw_from_events(events: DataFrame) -> DataFrame:
    """Shape `events` rows like the TrafSys API payload (FIXTURES.md §A1):
    boolean-ish IsInternal, ISO-string PeriodEnding."""
    return events.select(
        F.concat(F.lit("S"), (F.col("user_id") % 5).cast("string")).alias("SiteCode"),
        F.col("event_type").alias("Location"),
        (F.col("value") > 100).alias("IsInternal"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("PeriodEnding"),
        F.floor("value").cast("long").alias("Ins"),
        (F.col("event_id") % 50).alias("Outs"),
    )


#: DuckDB mirror of traffic_raw_from_events + normalize_traffic.
_TRAFFIC_CTE = """
    traffic AS (
        SELECT 'S' || CAST(user_id % 5 AS VARCHAR) AS SiteCode,
               event_type AS Location,
               CAST(value > 100 AS INT) AS IsInternal,
               strptime(strftime(ts, '%Y-%m-%dT%H:%M:%S'), '%Y-%m-%dT%H:%M:%S') AS PeriodEnding,
               CAST(FLOOR(value) AS BIGINT) AS Ins,
               event_id % 50 AS Outs
        FROM events
    )
"""


def _normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    return normalize_traffic(traffic_raw_from_events(load_table(spark, sf_dir, "events")))


@register(
    "traffic_normalize",
    oracle=f"WITH {_TRAFFIC_CTE} SELECT SiteCode, Location, IsInternal, PeriodEnding, Ins, Outs FROM traffic",
)
def traffic_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 (bool→int) + T2 (ISO string → timestamp), reference script.js:160-163, 191."""
    return _normalized(spark, sf_dir)


@register(
    "traffic_window_filter",
    oracle=f"""
    WITH {_TRAFFIC_CTE}
    SELECT SiteCode, Location, IsInternal, PeriodEnding, Ins, Outs
    FROM traffic
    WHERE PeriodEnding >= TIMESTAMP '2024-01-05 00:00:00'
      AND PeriodEnding < TIMESTAMP '2024-01-13 00:00:00'
      AND SiteCode = 'S1'
      AND IsInternal = 0
    """,
)
def traffic_window_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6: the DateFrom/DateTo/SiteCode/IncludeInternalLocations filters the
    reference pushes to the API (script.js:143-149) as Catalyst pushdown
    predicates."""
    return filter_window(
        _normalized(spark, sf_dir),
        date_from="2024-01-05",
        date_to="2024-01-12",
        site_code="S1",
        include_internal=False,
    )


@register(
    "traffic_hourly_rollup",
    # CAST(SUM AS BIGINT): DuckDB sums integers into HUGEINT, which turns
    # into Decimal/float64 through Arrow/pandas and breaks the driver's
    # value hash against Spark's int64 (round-1 hash_match failure).
    # `- INTERVAL 1 SECOND` before truncation = (start, end] buckets: an
    # exactly-on-the-hour record ends its bucket instead of opening the next.
    oracle=f"""
    WITH {_TRAFFIC_CTE}
    SELECT SiteCode, Location,
           date_trunc('hour', PeriodEnding - INTERVAL 1 SECOND) + INTERVAL 1 HOUR AS PeriodEnding,
           CAST(SUM(Ins) AS BIGINT) AS Ins, CAST(SUM(Outs) AS BIGINT) AS Outs
    FROM traffic
    GROUP BY 1, 2, 3
    """,
)
def traffic_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.3 hourly grain (DataSummedByDay=false, script.js:146): tumbling
    1-hour sums per (site, location), hour-ending buckets."""
    return rollup_traffic(_normalized(spark, sf_dir), grain="hour")


@register(
    "traffic_daily_rollup",
    oracle=f"""
    WITH {_TRAFFIC_CTE}
    SELECT SiteCode, Location,
           date_trunc('day', PeriodEnding - INTERVAL 1 SECOND) + INTERVAL 1 DAY AS PeriodEnding,
           CAST(SUM(Ins) AS BIGINT) AS Ins, CAST(SUM(Outs) AS BIGINT) AS Outs
    FROM traffic
    GROUP BY 1, 2, 3
    """,
)
def traffic_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.3 daily grain (DataSummedByDay=true)."""
    return rollup_traffic(_normalized(spark, sf_dir), grain="day")


@register(
    "traffic_resample_ffill",
    oracle=f"""
    WITH {_TRAFFIC_CTE},
    hourly AS (
        SELECT SiteCode, Location,
               date_trunc('hour', PeriodEnding - INTERVAL 1 SECOND) + INTERVAL 1 HOUR AS PeriodEnding,
               CAST(SUM(Ins) AS BIGINT) AS Ins, CAST(SUM(Outs) AS BIGINT) AS Outs
        FROM traffic GROUP BY 1, 2, 3
    ),
    spine AS (
        SELECT SiteCode, Location,
               unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS PeriodEnding
        FROM (SELECT SiteCode, Location, MIN(PeriodEnding) mn, MAX(PeriodEnding) mx
              FROM hourly GROUP BY 1, 2)
    )
    SELECT s.SiteCode, s.Location, s.PeriodEnding,
           last_value(h.Ins IGNORE NULLS) OVER w AS Ins,
           last_value(h.Outs IGNORE NULLS) OVER w AS Outs,
           CAST(h.Ins IS NOT NULL AS INT) AS is_observed
    FROM spine s LEFT JOIN hourly h
      ON h.SiteCode = s.SiteCode AND h.Location = s.Location
     AND h.PeriodEnding = s.PeriodEnding
    WINDOW w AS (PARTITION BY s.SiteCode, s.Location ORDER BY s.PeriodEnding)
    ORDER BY s.SiteCode, s.Location, s.PeriodEnding
    """,
)
def traffic_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: densify each (site, location) series to a
    complete hourly spine between its first and last observed bucket, then
    forward-fill the counts (``last(..., ignorenulls)`` running window)
    with an ``is_observed`` provenance flag — the resample/interpolate
    stage every downstream hourly model expects.

    Scale shape (plan-audited): the spine explodes ``sequence(min, max,
    1 hour)`` per group — O(groups) rows before the explode, so the spine
    side is tiny at any corpus size — and the densify-fill costs two key
    shuffles beyond the rollup itself: the (site, location) bounds
    aggregate, and the fill window (the gap join reuses the window's
    3-column key ordering).  Sequence length per group is bounded by the
    series' own span, never the global time range.
    """
    hourly = rollup_traffic(_normalized(spark, sf_dir), grain="hour")
    from pyspark.sql.window import Window

    bounds = hourly.groupBy("SiteCode", "Location").agg(
        F.min("PeriodEnding").alias("mn"), F.max("PeriodEnding").alias("mx")
    )
    spine = bounds.select(
        "SiteCode",
        "Location",
        F.explode(
            F.sequence(F.col("mn"), F.col("mx"), F.expr("INTERVAL 1 HOUR"))
        ).alias("PeriodEnding"),
    )
    joined = spine.join(
        hourly, ["SiteCode", "Location", "PeriodEnding"], "left"
    )
    w = (
        Window.partitionBy("SiteCode", "Location")
        .orderBy("PeriodEnding")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "SiteCode",
        "Location",
        "PeriodEnding",
        F.last("Ins", ignorenulls=True).over(w).alias("Ins"),
        F.last("Outs", ignorenulls=True).over(w).alias("Outs"),
        F.col("Ins").isNotNull().cast("int").alias("is_observed"),
    ).orderBy("SiteCode", "Location", "PeriodEnding")


@register(
    "traffic_merge_upsert",
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
def traffic_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: last-write-wins MERGE on the composite PK (script.js:182-215).

    Batch 1 loads Jan 1-19; batch 2 replays Jan 15+ with corrected counts
    (Ins+1000).  The merged state must show batch-2 values for every
    overlapping key and batch-1 values elsewhere — the reference's
    late-correction semantics (script.js:195-200).
    """
    t = _normalized(spark, sf_dir)
    b1 = dedupe_last_write(
        t.filter(F.col("PeriodEnding") < F.lit("2024-01-20")),
        keys=["SiteCode", "Location", "PeriodEnding"],
        order_by=["Ins", "Outs", "IsInternal"],
    )
    b2 = dedupe_last_write(
        t.filter(F.col("PeriodEnding") >= F.lit("2024-01-15")).withColumn(
            "Ins", F.col("Ins") + 1000
        ),
        keys=["SiteCode", "Location", "PeriodEnding"],
        order_by=["Ins", "Outs", "IsInternal"],
    )
    return merge_dataframes(b1, b2, keys=["SiteCode", "Location", "PeriodEnding"])


@register(
    "traffic_rollup_incremental",
    oracle=f"""
    WITH {_TRAFFIC_CTE}
    SELECT SiteCode, Location,
           date_trunc('hour', PeriodEnding - INTERVAL 1 SECOND) + INTERVAL 1 HOUR AS PeriodEnding,
           CAST(SUM(Ins) AS BIGINT) AS Ins, CAST(SUM(Outs) AS BIGINT) AS Outs
    FROM traffic
    GROUP BY 1, 2, 3
    """,
)
def traffic_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: the batch is split into two
    arbitrary halves (event parity), each rolled up independently, and the
    partial hourly sums are combined with the additive MERGE — the result
    must equal the one-shot rollup (same oracle as traffic_hourly_rollup).
    This is the nightly-rollup-table contract at 100 TB: each day's batch
    adds its partials; history is never rescanned."""
    from ..operators.merge import merge_additive

    events = load_table(spark, sf_dir, "events")
    half1 = rollup_traffic(
        normalize_traffic(traffic_raw_from_events(events.filter(F.col("event_id") % 2 == 0))),
        grain="hour",
    )
    half2 = rollup_traffic(
        normalize_traffic(traffic_raw_from_events(events.filter(F.col("event_id") % 2 == 1))),
        grain="hour",
    )
    return merge_additive(
        half1,
        half2,
        keys=["SiteCode", "Location", "PeriodEnding"],
        sum_cols=["Ins", "Outs"],
    )


@register(
    "events_json_extract",
    oracle="""
    SELECT event_type AS event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON prop extraction (north star §2.10): ``from_json`` with an
    explicit one-field schema parses the semi-structured ``props`` column
    ONCE per row and yields a typed value — vs ``get_json_object``, which
    re-parses the JSON for every extraction expression referencing it.
    With a stable prop set this is the scale path: single parse, columnar
    access, and the aggregate stays wholly inside codegen."""
    events = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "struct<k:bigint>").getField("k")
    return (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(k).alias("sum_k"),
            F.round(F.avg(k), 4).alias("avg_k"),
        )
        .orderBy("event_type")
    )


@register(
    "events_props_map",
    oracle="""
    WITH kv AS (
        SELECT unnest(json_keys(props)) AS prop_key,
               props
        FROM events
    )
    SELECT prop_key,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.' || prop_key) AS BIGINT)) AS BIGINT) AS sum_value,
           ROUND(AVG(CAST(json_extract_string(props, '$.' || prop_key) AS BIGINT)), 4) AS avg_value
    FROM kv
    GROUP BY prop_key
    ORDER BY prop_key
    """,
)
def events_props_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType handling: parse the semi-structured ``props`` column into
    ``map<string,bigint>`` once (`from_json` with an explicit type — one
    parse, columnar access), explode to (key, value) rows, aggregate per
    key.  This is the schema-on-read pattern for evolving prop bags: new
    keys appear as new groups, no schema migration.  The explode is
    narrow; the groupBy reduce side is O(distinct keys)."""
    events = load_table(spark, sf_dir, "events")
    kv = events.select(
        F.explode(F.from_json("props", "map<string,bigint>")).alias(
            "prop_key", "v"
        )
    )
    return (
        kv.groupBy("prop_key")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v").alias("sum_value"),
            F.round(F.avg("v"), 4).alias("avg_value"),
        )
        .orderBy("prop_key")
    )


@register(
    "traffic_watermark_top1",
    oracle=f"""
    WITH {_TRAFFIC_CTE},
    runs AS (
        SELECT CAST(date_trunc('day', PeriodEnding) AS DATE) AS RunDate,
               COUNT(*) AS Records,
               MAX(PeriodEnding) AS createdAt
        FROM traffic GROUP BY 1
    )
    SELECT RunDate, Records, createdAt FROM runs
    ORDER BY createdAt DESC LIMIT 1
    """,
)
def traffic_watermark_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7: the watermark read-back — top-1 by recency over the run log
    (NeDB sort({createdAt:-1}).limit(1), script.js:35).  Spark plans the
    orderBy+limit as TakeOrderedAndProject: no full sort at any scale.
    """
    runs = (
        _normalized(spark, sf_dir)
        .groupBy(F.date_trunc("day", "PeriodEnding").cast("date").alias("RunDate"))
        .agg(
            F.count(F.lit(1)).alias("Records"),
            F.max("PeriodEnding").alias("createdAt"),
        )
    )
    return runs.orderBy(F.desc("createdAt")).limit(1)


def _fixture_api_transport(sf_dir: str):
    """Network-free TrafSys API stand-in, safe to construct INSIDE an
    executor task: serves the OAuth token endpoint and /api/traffic GETs
    from the events fixture with the same record derivation as
    ``traffic_raw_from_events`` — pyarrow + pandas only, no SparkSession.
    Lets the distributed backfill path run under the driver's value-hash
    gate without a network."""
    import json as _json
    import os as _os

    def transport(method, url, params=None, data=None, headers=None):
        if url.endswith("/token"):
            return 200, _json.dumps(
                {
                    "access_token": "fixture-token",
                    ".expires": "Mon, 06 Jan 2098 12:00:00 GMT",
                }
            )
        assert headers and headers.get("Authorization", "").startswith("Bearer ")
        import numpy as np
        import pandas as pd
        import pyarrow.parquet as pq

        tbl = pq.read_table(
            _os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "user_id", "ts", "event_type", "value"],
        )
        pdf = tbl.to_pandas()
        ts = pd.to_datetime(pdf["ts"])
        lo = pd.Timestamp(params["DateFrom"])
        hi = pd.Timestamp(params["DateTo"]) + pd.Timedelta(days=1)
        sel = (ts >= lo) & (ts < hi)
        out = pd.DataFrame(
            {
                "SiteCode": "S" + (pdf["user_id"][sel] % 5).astype(str),
                "Location": pdf["event_type"][sel],
                "IsInternal": (pdf["value"][sel] > 100),
                "PeriodEnding": ts[sel].dt.strftime("%Y-%m-%dT%H:%M:%S"),
                # floor, not int(): int() truncates toward zero and would
                # disagree with the Spark/SQL derivation on negative values.
                "Ins": np.floor(pdf["value"][sel]).astype("int64"),
                "Outs": pdf["event_id"][sel] % 50,
            }
        )
        return 200, out.to_json(orient="records")

    return transport


@register(
    "traffic_backfill_partitioned",
    oracle=f"""
    WITH {_TRAFFIC_CTE}
    SELECT SiteCode, Location, IsInternal, PeriodEnding, Ins, Outs
    FROM traffic
    WHERE PeriodEnding >= TIMESTAMP '2024-01-01 00:00:00'
      AND PeriodEnding < TIMESTAMP '2024-01-29 00:00:00'
    """,
)
def traffic_backfill_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 at backfill scale: the four-week window is split into 7-day
    chunks and fetched EXECUTOR-SIDE via ``fetch_window_partitioned``
    (mapInPandas over the chunk list, per-task token provider with 401
    re-auth), then normalized (T1/T2).  The transport serves the fixture's
    own derived records, so the driver's value hash checks the entire
    distributed path — chunking, task-side parse, schema enforcement,
    normalize — against the plain SQL window.
    """
    from ..sources.trafsys_api import TokenProvider, fetch_window_partitioned

    base = "https://fixture.invalid/rest/"
    transport = _fixture_api_transport(sf_dir)
    tokens = TokenProvider(base, "fixture", "fixture", transport)
    raw = fetch_window_partitioned(
        spark,
        base,
        tokens,
        lambda: _fixture_api_transport(sf_dir),
        "2024-01-01",
        "2024-01-28",
        days_per_chunk=7,
    )
    return normalize_traffic(raw)


@register(
    "traffic_seasonal_anomalies",
    # Exact-integer LEAVE-ONE-OUT anomaly test.  Plain z-scores against a
    # profile that includes the point itself are bounded at √(n−1): one
    # spike among 9 constant days lands at z = 3.0 exactly and can NEVER
    # exceed 3σ, because the spike inflates its own baseline (found by the
    # planted-spike pytest).  Excluding the point (m = n−1 peers, S−x,
    # SS−x²) removes the masking; clearing denominators keeps it integer:
    #   |x − μ₋ᵢ| > 3σ₋ᵢ(pop)  ⇔  (m·x − (S−x))² > 9·(m·(SS−x²) − (S−x)²)
    # No float anywhere → no cross-engine rounding hazard; a constant
    # history (σ₋ᵢ = 0) flags any deviation, strict > keeps exact repeats
    # clean.  BIGINT headroom: needs m·x < 3·10⁹ — satisfied by hourly
    # counts at any realistic site density; beyond that, promote to DECIMAL.
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
def traffic_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal anomaly detection on the hourly rollup: flag buckets whose
    count deviates >3σ from the SAME (site, location, hour-of-day)
    historical profile, leave-one-out — people-counter data is strongly
    diurnal, so a global threshold (events_value_outliers) misses
    rush-hour-shaped anomalies, and an include-self baseline caps a lone
    spike at √(n−1)σ (see oracle comment).

    Scale: the profile is O(sites × locations × 24) — broadcast back onto
    the rollup; the leave-one-out correction is pure row-local arithmetic,
    so detection stays a narrow integer filter.  The rollup's own shuffle
    is the only data-sized exchange.
    """
    rolled = rollup_traffic(_normalized(spark, sf_dir), grain="hour").select(
        "SiteCode", "Location", "PeriodEnding", "Ins"
    )
    hod = F.hour("PeriodEnding")
    profile = (
        rolled.groupBy("SiteCode", "Location", hod.alias("hod"))
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
    return (
        rolled.withColumn("hod", hod)
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
        .orderBy("SiteCode", "Location", "PeriodEnding")
    )


@register(
    "events_variant_extract",
    # Same oracle as events_json_extract: the VARIANT path must produce
    # bit-identical answers to the from_json path (and to DuckDB's JSON
    # functions) — open-type ingestion without schema declarations.
    oracle="""
    SELECT event_type AS event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
           CAST(SUM(CASE WHEN json_extract_string(props, '$.absent') IS NULL
                         THEN 0 ELSE 1 END) AS BIGINT) AS n_absent_hits
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT-native semi-structured processing: ``parse_json``
    ingests ``props`` into the open VARIANT encoding once (no declared
    schema, unlike ``from_json``), ``variant_get`` does typed path access
    against the binary encoding, and ``try_variant_get`` on a missing
    path degrades to NULL instead of failing — the modern replacement for
    string-re-parsing ``get_json_object`` chains when the prop set is NOT
    stable.  Results must equal the schema-declared path
    (``events_json_extract``) exactly.

    Scale: the parse happens once per row inside codegen; typed access on
    the variant binary avoids per-expression JSON re-parsing, which is
    the whole point at 100 TB of heterogeneous props.
    """
    events = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "bigint")
    absent = F.try_variant_get(v, "$.absent", "string")
    return (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(k).alias("sum_k"),
            F.round(F.avg(k), 4).alias("avg_k"),
            F.sum(F.when(absent.isNull(), F.lit(0)).otherwise(F.lit(1)))
            .alias("n_absent_hits"),
        )
        .orderBy("event_type")
    )


@register(
    "traffic_uptime_coverage",
    oracle=f"""
    WITH {_TRAFFIC_CTE},
    rollup AS (
        SELECT SiteCode, Location,
               CAST(FLOOR(epoch(PeriodEnding) / 3600) AS BIGINT) AS h
        FROM traffic GROUP BY 1, 2, 3
    ),
    bounds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM rollup),
    per_sensor AS (
        SELECT SiteCode, Location,
               COUNT(*) AS observed_hours,
               MIN(h) AS first_h, MAX(h) AS last_h
        FROM rollup GROUP BY 1, 2
    )
    SELECT SiteCode, Location,
           CAST(observed_hours AS BIGINT) AS observed_hours,
           CAST(b.h1 - b.h0 + 1 AS BIGINT) AS spine_hours,
           CAST(observed_hours * 1000000 // (b.h1 - b.h0 + 1) AS BIGINT)
               AS coverage_ppm,
           CAST(last_h - first_h + 1 - observed_hours AS BIGINT)
               AS internal_gap_hours
    FROM per_sensor, bounds b
    ORDER BY SiteCode, Location
    """,
)
def traffic_uptime_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sensor uptime report: per (site, location), hours with ≥1 record
    vs the corpus hour spine (coverage ppm) and the hours missing INSIDE
    the sensor's own active span (internal gaps = dropouts, as opposed to
    late install / early decommission).  The monitoring query a
    people-counter fleet runs nightly next to the load itself.

    Scale: one (site, location, hour) distinct shuffle with map-side
    partials, then an O(sensors) rollup against a 1-row broadcast spine.
    """
    traffic = normalize_traffic(
        traffic_raw_from_events(load_table(spark, sf_dir, "events"))
    )
    rollup = (
        traffic.select(
            "SiteCode",
            "Location",
            F.expr(
                "CAST(unix_timestamp(PeriodEnding) div 3600 AS BIGINT)"
            ).alias("h"),
        )
        .distinct()
    )
    bounds = rollup.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    per_sensor = rollup.groupBy("SiteCode", "Location").agg(
        F.count(F.lit(1)).alias("observed_hours"),
        F.min("h").alias("first_h"),
        F.max("h").alias("last_h"),
    )
    return (
        per_sensor.join(F.broadcast(bounds))
        .select(
            "SiteCode",
            "Location",
            "observed_hours",
            (F.col("h1") - F.col("h0") + 1).alias("spine_hours"),
            F.expr(
                "observed_hours * 1000000 div (h1 - h0 + 1)"
            ).alias("coverage_ppm"),
            (
                F.col("last_h") - F.col("first_h") + 1 - F.col("observed_hours")
            ).alias("internal_gap_hours"),
        )
        .orderBy("SiteCode", "Location")
    )


@register(
    "traffic_merge_tombstones",
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
            FROM traffic
            WHERE PeriodEnding >= TIMESTAMP '2024-01-15 00:00:00'
              AND Location != 'error'
        ) WHERE rn = 1
    )
    SELECT SiteCode, Location, IsInternal, PeriodEnding, Ins, Outs FROM b1
    WHERE NOT EXISTS (
        SELECT 1 FROM b2 WHERE b2.SiteCode = b1.SiteCode
          AND b2.Location = b1.Location AND b2.PeriodEnding = b1.PeriodEnding)
      AND NOT (b1.Location = 'error'
               AND b1.PeriodEnding >= TIMESTAMP '2024-01-10 00:00:00')
    UNION ALL
    SELECT SiteCode, Location, IsInternal, PeriodEnding, Ins, Outs FROM b2
    """,
)
def traffic_merge_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE with deletes: batch 2 carries the Jan-15+ corrections PLUS
    tombstones retiring every 'error'-location key from Jan 10 onward
    (the decommissioned-sensor feed).  Deleted keys vanish, corrected
    keys take batch-2 values, everything else keeps batch-1 state —
    exactly the four-branch MERGE a CDC feed needs."""
    from ..operators.merge import merge_with_tombstones

    t = _normalized(spark, sf_dir)
    b1 = dedupe_last_write(
        t.filter(F.col("PeriodEnding") < F.lit("2024-01-20")),
        keys=["SiteCode", "Location", "PeriodEnding"],
        order_by=["Ins", "Outs", "IsInternal"],
    )
    corrections = dedupe_last_write(
        t.filter(
            (F.col("PeriodEnding") >= F.lit("2024-01-15"))
            & (F.col("Location") != "error")
        ).withColumn("Ins", F.col("Ins") + 1000),
        keys=["SiteCode", "Location", "PeriodEnding"],
        order_by=["Ins", "Outs", "IsInternal"],
    ).withColumn("is_delete", F.lit(False))
    tombstones = (
        b1.filter(
            (F.col("Location") == "error")
            & (F.col("PeriodEnding") >= F.lit("2024-01-10"))
        )
        .withColumn("is_delete", F.lit(True))
    )
    return merge_with_tombstones(
        b1,
        corrections.unionByName(tombstones),
        keys=["SiteCode", "Location", "PeriodEnding"],
    )


@register(
    "watermark_backfill_plan",
    oracle="""
    WITH runs AS (
        SELECT d AS FromDate,
               CAST(d + INTERVAL 1 DAY
                    * (CASE WHEN day(d) % 3 = 0 THEN 2 ELSE 1 END)
                    AS DATE) AS ToDate
        FROM (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events
              WHERE day(CAST(ts AS DATE)) % 4 != 0)
    ),
    marked AS (
        SELECT FromDate, ToDate,
               MAX(ToDate) OVER (ORDER BY FromDate, ToDate
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS covered_until
        FROM runs
    )
    SELECT covered_until AS gap_start, FromDate AS gap_end
    FROM marked
    WHERE covered_until IS NOT NULL AND FromDate > covered_until
    ORDER BY gap_start
    """,
)
def watermark_backfill_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recovery planning over the run log: a deterministic log is derived
    from the fixture (a 1-day window per event day — 2 days when the day
    is divisible by 3, so some windows overlap and some missed days are
    absorbed by the overlap — with every 4th-of-month day's run
    "missed"), and the planner emits exactly the uncovered gaps a
    backfill must fetch: merged across overlaps, the missed-cron windows
    the reference silently absorbs (script.js:54) made explicit."""
    from .watermark import coverage_gaps

    events = load_table(spark, sf_dir, "events")
    runs = (
        events.select(F.col("ts").cast("date").alias("d"))
        .distinct()
        .filter(F.dayofmonth("d") % 4 != 0)
        .select(
            F.col("d").alias("FromDate"),
            F.expr(
                "date_add(d, CASE WHEN day(d) % 3 = 0 THEN 2 ELSE 1 END)"
            ).alias("ToDate"),
        )
    )
    return coverage_gaps(runs)


#: EWMA smoothing constants: alpha = 1/4, kernel truncated at 12 lags.
#: Weight of lag j is alpha*(1-alpha)^j = 3^j/4^(j+1); scaling by 4^13
#: makes every weight the exact integer 3^j * 4^(12-j) — both engines
#: sum the SAME integers, so the smoothed series hash-compares exactly
#: (floats would drift between Spark's and DuckDB's summation orders).
EWMA_LAGS = 12
_EWMA_W = [3**j * 4 ** (EWMA_LAGS - j) for j in range(EWMA_LAGS + 1)]


@register(
    "traffic_ewma_hourly",
    oracle=f"""
    WITH {_TRAFFIC_CTE},
    rolled AS (
        SELECT SiteCode, Location,
               date_trunc('hour', PeriodEnding - INTERVAL 1 SECOND)
                   + INTERVAL 1 HOUR AS PeriodEnding,
               CAST(SUM(Ins) AS BIGINT) AS Ins
        FROM traffic
        GROUP BY 1, 2, 3
    )
    SELECT SiteCode, Location, PeriodEnding, Ins,
           CAST((1000 * ("""
    + " + ".join(
        f"COALESCE(LAG(Ins, {j}) OVER w, 0) * {w}" for j, w in enumerate(_EWMA_W)
    )
    + """)) // ("""
    + " + ".join(
        f"CASE WHEN LAG(Ins, {j}) OVER w IS NULL THEN 0 ELSE {w} END"
        for j, w in enumerate(_EWMA_W)
    )
    + """) AS BIGINT) AS ewma_milli
    FROM rolled
    WINDOW w AS (PARTITION BY SiteCode, Location ORDER BY PeriodEnding)
    ORDER BY SiteCode, Location, PeriodEnding
    """,
)
def traffic_ewma_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average over each (site, location)
    hourly series — the metrics-smoothing shape (alpha=1/4, kernel
    truncated at 12 observed lags; the dropped tail carries weight
    (3/4)^13 < 2.4%).  Exact integer arithmetic end-to-end: weights are
    pre-scaled to integers and the result reported in milli-units via
    integer division, so Spark and DuckDB agree bit-for-bit.  The plan
    is ONE partitioned window pass evaluating 13 lag terms — no
    self-join, no recursive state; at 100 TB each series' window sorts
    within its (site, location) partition only."""
    from pyspark.sql.window import Window as _W

    rolled = rollup_traffic(_normalized(spark, sf_dir), grain="hour").select(
        "SiteCode", "Location", "PeriodEnding", "Ins"
    )
    w = _W.partitionBy("SiteCode", "Location").orderBy("PeriodEnding")
    num = sum(
        (F.coalesce(F.lag("Ins", j).over(w), F.lit(0)) * F.lit(wt)
         for j, wt in enumerate(_EWMA_W)),
        start=F.lit(0),
    )
    den = sum(
        (F.when(F.lag("Ins", j).over(w).isNull(), F.lit(0)).otherwise(F.lit(wt))
         for j, wt in enumerate(_EWMA_W)),
        start=F.lit(0),
    )
    return (
        rolled.withColumn("_num", num.cast("long"))
        .withColumn("_den", den.cast("long"))
        .withColumn("ewma_milli", F.expr("(1000L * _num) div _den"))
        .drop("_num", "_den")
        .orderBy("SiteCode", "Location", "PeriodEnding")
    )


@register(
    "traffic_resample_interp",
    oracle=f"""
    WITH {_TRAFFIC_CTE},
    hourly AS (
        SELECT SiteCode, Location,
               date_trunc('hour', PeriodEnding - INTERVAL 1 SECOND) + INTERVAL 1 HOUR AS PeriodEnding,
               CAST(SUM(Ins) AS BIGINT) AS Ins
        FROM traffic GROUP BY 1, 2, 3
    ),
    spine AS (
        SELECT SiteCode, Location,
               unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS PeriodEnding
        FROM (SELECT SiteCode, Location, MIN(PeriodEnding) mn, MAX(PeriodEnding) mx
              FROM hourly GROUP BY 1, 2)
    ),
    ctx AS (
        SELECT s.SiteCode, s.Location, s.PeriodEnding,
               h.Ins AS obs,
               epoch(s.PeriodEnding) AS t,
               last_value(h.Ins IGNORE NULLS) OVER wb AS pv,
               last_value(CASE WHEN h.Ins IS NOT NULL
                               THEN epoch(s.PeriodEnding) END IGNORE NULLS)
                   OVER wb AS pt,
               first_value(h.Ins IGNORE NULLS) OVER wf AS nv,
               first_value(CASE WHEN h.Ins IS NOT NULL
                                THEN epoch(s.PeriodEnding) END IGNORE NULLS)
                   OVER wf AS nt
        FROM spine s LEFT JOIN hourly h
          ON h.SiteCode = s.SiteCode AND h.Location = s.Location
         AND h.PeriodEnding = s.PeriodEnding
        WINDOW wb AS (PARTITION BY s.SiteCode, s.Location
                      ORDER BY s.PeriodEnding
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY s.SiteCode, s.Location
                      ORDER BY s.PeriodEnding
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT SiteCode, Location, PeriodEnding,
           ROUND(CASE
               WHEN obs IS NOT NULL THEN obs * 1.0
               WHEN pv IS NULL THEN nv * 1.0
               WHEN nv IS NULL THEN pv * 1.0
               ELSE pv + (nv - pv) * (t - pt) * 1.0 / (nt - pt)
           END, 4) AS ins_interp,
           CAST(obs IS NOT NULL AS INT) AS is_observed
    FROM ctx
    ORDER BY SiteCode, Location, PeriodEnding
    """,
)
def traffic_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR-interpolation resampling — the ffill twin for gauge-style
    series where holding the last value misstates the trend: densify each
    (site, location) series to the hourly spine, then fill each gap with
    the straight line between its bracketing observations (edges
    back/forward-fill).  Interpolands derive from exact integer counts
    and integer epoch seconds, so both engines compute identical doubles.

    Same scale shape as `traffic_resample_ffill` plus ONE more window
    (the forward-looking bracket) on the same (site, location) exchange —
    Catalyst reuses the sort for both frames."""
    from pyspark.sql.window import Window

    hourly = rollup_traffic(_normalized(spark, sf_dir), grain="hour").select(
        "SiteCode", "Location", "PeriodEnding", "Ins"
    )
    bounds = hourly.groupBy("SiteCode", "Location").agg(
        F.min("PeriodEnding").alias("mn"), F.max("PeriodEnding").alias("mx")
    )
    spine = bounds.select(
        "SiteCode",
        "Location",
        F.explode(
            F.sequence(F.col("mn"), F.col("mx"), F.expr("INTERVAL 1 HOUR"))
        ).alias("PeriodEnding"),
    )
    j = spine.join(hourly, ["SiteCode", "Location", "PeriodEnding"], "left")
    wb = (
        Window.partitionBy("SiteCode", "Location")
        .orderBy("PeriodEnding")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("SiteCode", "Location")
        .orderBy("PeriodEnding")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    t = F.unix_timestamp("PeriodEnding")
    obs_t = F.when(F.col("Ins").isNotNull(), t)
    ctx = j.select(
        "SiteCode",
        "Location",
        "PeriodEnding",
        F.col("Ins").alias("obs"),
        t.alias("t"),
        F.last("Ins", ignorenulls=True).over(wb).alias("pv"),
        F.last(obs_t, ignorenulls=True).over(wb).alias("pt"),
        F.first("Ins", ignorenulls=True).over(wf).alias("nv"),
        F.first(obs_t, ignorenulls=True).over(wf).alias("nt"),
    )
    interp = (
        F.when(F.col("obs").isNotNull(), F.col("obs") * 1.0)
        .when(F.col("pv").isNull(), F.col("nv") * 1.0)
        .when(F.col("nv").isNull(), F.col("pv") * 1.0)
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("t") - F.col("pt"))
            * 1.0
            / (F.col("nt") - F.col("pt"))
        )
    )
    return ctx.select(
        "SiteCode",
        "Location",
        "PeriodEnding",
        F.round(interp, 4).alias("ins_interp"),
        F.col("obs").isNotNull().cast("int").alias("is_observed"),
    ).orderBy("SiteCode", "Location", "PeriodEnding")
