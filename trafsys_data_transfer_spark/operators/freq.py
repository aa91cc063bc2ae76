"""Frequency analytics: exact heavy hitters, count-min-sketch estimates,
and key-skew profiling.

Three operators around the same production question — "which keys are
hot, and how hot?" — at three cost tiers:

* ``events_heavy_hitters`` — EXACT top-k keys by count with ppm share
  (one groupBy + a WindowGroupLimit top-k; the ground truth).
* ``events_heavy_hitters_cms`` — count-min-sketch estimates for those
  same keys (Spark's mergeable ``count_min_sketch`` aggregate, fixed
  seed).  CMS only ever OVER-estimates, so ``est ≥ exact`` is a hard
  invariant (pytest), and the ε·N error bound caps the overshoot.
  Rows-only: sketch estimates aren't ANSI-SQL-reproducible.
* ``events_key_skew_profile`` — the distribution OF per-key counts in
  exact power-of-two buckets (``length(bin(cnt))`` = ⌊log₂⌋+1 — integer
  string length, no float log), plus total keys/rows and the top-1 key
  share: the one-look diagnostic that tells you whether a groupBy/join
  on this key needs salting (the skew.py machinery) before you burn a
  cluster run discovering it.

Scale notes (100 TB posture):
* All three are one key shuffle with map-side partials; heavy-hitter
  top-k uses the rank-limit pushdown (WindowGroupLimit) over the
  aggregated key table, never the raw events.
* The CMS sketch is MERGEABLE — per-partition sketches combine
  associatively (the HLL-union story, dedup.py:593): shard or stream
  partial sketches and union without rescanning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..sources.fixtures import load_table

TOP_K = 10
#: CMS accuracy knobs (relative error eps over the stream length, with
#: confidence 1-delta) and the fixed seed that makes runs reproducible.
CMS_EPS = 0.001
CMS_CONFIDENCE = 0.99
CMS_SEED = 42


@register(
    "events_heavy_hitters",
    oracle=f"""
    WITH keyed AS (
        SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY 1
    ),
    tot AS (SELECT SUM(cnt) AS n_rows FROM keyed),
    ranked AS (
        SELECT user_id, cnt,
               ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id) AS rnk
        FROM keyed
    )
    SELECT CAST(rnk AS BIGINT) AS rnk, user_id, CAST(cnt AS BIGINT) AS cnt,
           CAST(cnt * 1000000 // n_rows AS BIGINT) AS share_ppm
    FROM ranked, tot
    WHERE rnk <= {TOP_K}
    ORDER BY rnk
    """,
)
def events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k hottest keys (users) by event count, with exact ppm
    share of all rows.  The rank-over-aggregate + filter shape compiles
    to a WindowGroupLimit: each shuffle partition keeps only its own
    top-k candidate keys before the final single-partition rank."""
    events = load_table(spark, sf_dir, "events")
    keyed = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    tot = keyed.agg(F.sum("cnt").alias("n_rows"))
    w = Window.orderBy(F.col("cnt").desc(), "user_id")
    return (
        keyed.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= TOP_K)
        .join(F.broadcast(tot))
        .select(
            "rnk",
            "user_id",
            "cnt",
            F.expr("cnt * 1000000 div n_rows").alias("share_ppm"),
        )
        .orderBy("rnk")
    )


@register(
    "events_heavy_hitters_cms",
    # sketch estimates aren't SQL-reproducible, so the strict row is a
    # CERTIFICATE (VERDICT r09 task 5): the oracle recomputes the exact
    # top-k counts and expects the sketch-guarantee booleans TRUE — CMS
    # never under-counts, and overshoot is capped by eps*N.
    oracle=f"""
    WITH keyed AS (
        SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY 1
    ),
    tot AS (SELECT SUM(cnt) AS n_rows FROM keyed),
    ranked AS (
        SELECT user_id, cnt,
               ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id) AS rnk
        FROM keyed
    )
    SELECT CAST(rnk AS BIGINT) AS rnk, user_id,
           CAST(cnt AS BIGINT) AS exact_cnt,
           TRUE AS est_ge_exact, TRUE AS est_within_eps
    FROM ranked, tot
    WHERE rnk <= {TOP_K}
    ORDER BY rnk
    """,
)
def events_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency estimates for the exact top-k keys:
    ONE mergeable sketch of the full user_id stream (fixed seed), probed
    for each heavy hitter.  Upgraded from rows-only to a strict
    certificate: the registered row carries the exact count (which the
    oracle recomputes) plus two booleans asserting the sketch guarantees
    — ``est ≥ exact`` (CMS can only over-count) and ``est ≤ exact +
    ⌈ε·N⌉`` (the sketch's error bound; deterministic here because the
    seed is pinned).  A broken sketch emits FALSE and hash-mismatches.
    At scale the exact twin is dropped and the estimate stands alone.

    The probe decodes the sketch ONCE on the driver (it is a single
    aggregated binary, KB-sized) and joins estimates back against the
    exact top-k — the sketch aggregation itself is fully distributed and
    mergeable across partitions/shards/streams.
    """
    import math

    events = load_table(spark, sf_dir, "events")
    sketch_row = events.agg(
        F.count_min_sketch(
            "user_id", F.lit(CMS_EPS), F.lit(CMS_CONFIDENCE), F.lit(CMS_SEED)
        ).alias("sk"),
        F.count(F.lit(1)).alias("n_rows"),
    ).collect()[0]
    # Decode driver-side with the JVM sketch library (same bytes the
    # executors produced — KB-sized, bounded).
    jvm = spark.sparkContext._jvm
    sk = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(sketch_row["sk"])
    )
    eps_n = int(math.ceil(CMS_EPS * sketch_row["n_rows"]))
    exact = events_heavy_hitters(spark, sf_dir).collect()
    est_rows = [
        (
            r["rnk"],
            r["user_id"],
            r["cnt"],
            sk.estimateCount(r["user_id"]) >= r["cnt"],
            sk.estimateCount(r["user_id"]) <= r["cnt"] + eps_n,
        )
        for r in exact
    ]
    return spark.createDataFrame(
        est_rows,
        "rnk bigint, user_id bigint, exact_cnt bigint, "
        "est_ge_exact boolean, est_within_eps boolean",
    ).orderBy("rnk")


@register(
    "events_key_skew_profile",
    oracle="""
    WITH keyed AS (
        SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY 1
    ),
    buckets AS (
        SELECT LENGTH(bin(cnt)) AS log2_bucket,
               COUNT(*) AS n_keys, SUM(cnt) AS n_rows
        FROM keyed GROUP BY 1
    ),
    summary AS (
        SELECT SUM(n_keys) AS total_keys, SUM(n_rows) AS total_rows,
               (SELECT MAX(cnt) FROM keyed) AS max_cnt
        FROM buckets
    )
    SELECT CAST(b.log2_bucket AS INT) AS log2_bucket,
           CAST(b.n_keys AS BIGINT) AS n_keys,
           CAST(b.n_rows AS BIGINT) AS n_rows,
           CAST(b.n_rows * 1000000 // s.total_rows AS BIGINT) AS rows_ppm,
           CAST(s.total_keys AS BIGINT) AS total_keys,
           CAST(s.max_cnt * 1000000 // s.total_rows AS BIGINT)
               AS top1_share_ppm
    FROM buckets b, summary s
    ORDER BY log2_bucket
    """,
)
def events_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key-count distribution in exact power-of-two buckets
    (``length(bin(cnt))`` — no float log2), with each bucket's row mass
    in ppm and the top-1 key's share: decides salting BEFORE the
    expensive run.  A healthy key has everything in 2-3 adjacent
    buckets; a skewed one shows a long bucket tail or a fat
    ``top1_share_ppm``."""
    events = load_table(spark, sf_dir, "events")
    keyed = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    buckets = keyed.groupBy(
        F.length(F.bin("cnt")).cast("int").alias("log2_bucket")
    ).agg(F.count(F.lit(1)).alias("n_keys"), F.sum("cnt").alias("n_rows"))
    summary = keyed.agg(
        F.count(F.lit(1)).alias("total_keys"),
        F.sum("cnt").alias("total_rows"),
        F.max("cnt").alias("max_cnt"),
    )
    return (
        buckets.join(F.broadcast(summary))
        .select(
            "log2_bucket",
            "n_keys",
            "n_rows",
            F.expr("n_rows * 1000000 div total_rows").alias("rows_ppm"),
            "total_keys",
            F.expr("max_cnt * 1000000 div total_rows").alias("top1_share_ppm"),
        )
        .orderBy("log2_bucket")
    )


# ---------------------------------------------------------------------------
# exponentially-decayed heavy hitters
# ---------------------------------------------------------------------------

#: Decay half-life in days, and ranks kept per event type.
DECAY_HALF_LIFE_DAYS = 1
DECAYED_TOP_K = 5


@register(
    "events_decayed_topk",
    oracle=f"""
    WITH d AS (
        SELECT event_type, user_id,
               date_diff('day',
                         (SELECT MIN(CAST(ts AS DATE)) FROM events),
                         CAST(ts AS DATE)) AS dd
        FROM events
    ),
    agg AS (
        SELECT event_type, user_id,
               CAST(SUM(CAST(1 AS BIGINT) << (dd // {DECAY_HALF_LIFE_DAYS}))
                    AS BIGINT) AS decayed_scaled
        FROM d GROUP BY 1, 2
    )
    SELECT event_type, user_id, decayed_scaled, CAST(rnk AS INT) AS rnk
    FROM (
        SELECT event_type, user_id, decayed_scaled,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY decayed_scaled DESC, user_id)
                   AS rnk
        FROM agg
    )
    WHERE rnk <= {DECAYED_TOP_K}
    ORDER BY event_type, rnk
    """,
)
def events_decayed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted heavy hitters: who dominates each event type NOW,
    with activity half-lifing every :data:`DECAY_HALF_LIFE_DAYS` days —
    the trending-user readout where plain counts would crown long-dead
    accounts.

    Exact-integer formulation: an event on day d (relative to the corpus
    start) carries weight ``2^(d/half_life)`` — relative weights between
    any two days are exactly the exponential decay ``2^(-Δdays/hl)``, and
    the shared scale factor ``2^(newest_day/hl)`` cancels in ranking, so
    BIGINT arithmetic replaces float ``pow`` entirely (30-day fixture →
    weights ≤ 2^29; at year scale, bucket the exponent or switch to
    DECIMAL(38) — documented bound, loud overflow under ANSI).  One
    (type,user) aggregate with map-side partials, one O(groups) windowed
    rank — the heavy-hitters plan shape with a weighted measure."""
    events = load_table(spark, sf_dir, "events")
    d0 = events.agg(F.min(F.col("ts").cast("date"))).first()[0]
    agg = (
        events.select(
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
    w = Window.partitionBy("event_type").orderBy(
        F.col("decayed_scaled").desc(), "user_id"
    )
    return (
        agg.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= DECAYED_TOP_K)
        .select("event_type", "user_id", "decayed_scaled", "rnk")
        .orderBy("event_type", "rnk")
    )


#: Misra-Gries summary size: estimates undercount by at most N/(MG_K+1).
MG_K = 64


def misra_gries_partial(keys, k: int) -> dict:
    """Classic Misra-Gries over one iterable of keys: at most ``k``
    counters; every counter is a LOWER bound on the key's true count in
    the iterable, short by at most n_partial/(k+1)."""
    counters: dict = {}
    for key in keys:
        if key in counters:
            counters[key] += 1
        elif len(counters) < k:
            counters[key] = 1
        else:
            # decrement-all step (amortised via dict rebuild)
            counters = {c: v - 1 for c, v in counters.items() if v > 1}
    return counters


def misra_gries_merge(a: dict, b: dict, k: int) -> dict:
    """Mergeable-summaries MERGE (Agarwal et al., PODS'12): sum common
    counters, then subtract the (k+1)-th largest value and drop
    non-positives — the result keeps the combined N/(k+1) guarantee, so
    per-partition summaries combine associatively like any sketch."""
    out = dict(a)
    for key, v in b.items():
        out[key] = out.get(key, 0) + v
    if len(out) > k:
        kth = sorted(out.values(), reverse=True)[k]
        out = {c: v - kth for c, v in out.items() if v - kth > 0}
    return out


def misra_gries_partials(
    df: DataFrame, key_col: str, k: int = MG_K
) -> DataFrame:
    """Per-partition Misra-Gries summaries as a DataFrame — ≤k
    ``(key, mg_cnt, part_id)`` rows per partition from one narrow
    Arrow-batched scan.  This is the distributed half of the sketch:
    partials are storable/streamable and merge associatively
    (:func:`misra_gries_merge`), so shards and micro-batches combine
    without rescanning."""
    import pandas as pd

    def gen(batches):
        # fold ALL of this partition's batches into one summary
        counters: dict = {}
        for pdf in batches:
            for key in pdf[key_col]:
                if key in counters:
                    counters[key] += 1
                elif len(counters) < k:
                    counters[key] = 1
                else:
                    counters = {
                        c: v - 1 for c, v in counters.items() if v > 1
                    }
        yield pd.DataFrame(
            {
                key_col: list(counters.keys()),
                "mg_cnt": list(counters.values()),
            }
        )

    schema_type = dict(df.dtypes)[key_col]
    return df.select(key_col).mapInPandas(
        gen, f"{key_col} {schema_type}, mg_cnt long"
    )


def merge_mg_partials(rows, key_col: str, k: int = MG_K) -> dict:
    """Driver-side fold of collected partial-summary rows (bounded:
    summaries × k entries), grouping rows back into their source
    summaries is unnecessary — key-wise folding only ever subtracts MORE
    than the summary-wise merge would, so estimates stay lower bounds
    and the N/(k+1) band is preserved (property-tested under random
    splits)."""
    merged: dict = {}
    for r in rows:
        merged = misra_gries_merge(merged, {r[key_col]: r["mg_cnt"]}, k)
    return merged


def misra_gries_summary(
    df: DataFrame, key_col: str, k: int = MG_K
) -> dict:
    """Distributed Misra-Gries: one narrow scan builds a ≤k-counter
    summary PER PARTITION (Arrow-batched, constant memory), and the
    driver merges the bounded set of summaries (O(partitions · k)
    entries — the sketch-merge collect policy, like the CMS/HLL tiers).
    Deterministic guarantee regardless of partitioning or arrival
    order: ``true − N/(k+1) ≤ est ≤ true`` for every key."""
    partials = misra_gries_partials(df, key_col, k)
    return merge_mg_partials(partials.collect(), key_col, k)


@register(
    "events_misra_gries_topk",
    # deterministic UNDER-approximation dual of the CMS certificate: the
    # oracle recomputes the exact top-k and expects the Misra-Gries
    # guarantee booleans TRUE (est <= exact always; undershoot capped by
    # floor(N/(k+1)) for ANY partitioning / arrival order).
    oracle=f"""
    WITH keyed AS (
        SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY 1
    ),
    tot AS (SELECT SUM(cnt) AS n_rows FROM keyed),
    ranked AS (
        SELECT user_id, cnt,
               ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id) AS rnk
        FROM keyed
    )
    SELECT CAST(rnk AS BIGINT) AS rnk, user_id,
           CAST(cnt AS BIGINT) AS exact_cnt,
           TRUE AS mg_le_exact, TRUE AS mg_within_bound
    FROM ranked, tot
    WHERE rnk <= {TOP_K}
    ORDER BY rnk
    """,
)
def events_misra_gries_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries heavy-hitter summary probed at the exact top-k keys —
    the deterministic, hash-free counterpart to the CMS tier: MG only
    ever UNDER-counts (CMS only over-counts), its error bound N/(k+1) is
    a worst-case theorem rather than probabilistic, and per-partition
    summaries merge associatively (mergeable-summaries MERGE), so the
    same O(k) state ships across shards and stream micro-batches.

    Strict certificate (the events_heavy_hitters_cms pattern): exact
    counts the oracle recomputes plus the two guarantee booleans, TRUE
    under any partitioning — a broken decrement or merge flips one and
    hash-mismatches."""
    events = load_table(spark, sf_dir, "events")
    summary = misra_gries_summary(events, "user_id", MG_K)
    n_rows = events.count()
    bound = n_rows // (MG_K + 1)
    exact = events_heavy_hitters(spark, sf_dir).collect()
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
