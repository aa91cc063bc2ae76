"""Skew mitigation: deterministic salting for hot keys.

AQE's skew-join splitting (on in session.py) handles most runtime skew; these
helpers are for the cases AQE cannot fix:

* a single groupBy key so hot that one reducer owns most of the data
  (``salted_aggregate`` — two-phase: spread partials over salt buckets,
  then combine);
* a shuffle join where one key floods a partition and the small side is
  broadcastable-per-bucket (``salted_join`` — replicate the small side
  across the salt domain, join on key+salt).

Salt is ``pmod(xxhash64(fingerprint-cols), n)`` — deterministic, so plans
are reproducible run to run (no ``rand()``: nondeterministic salts break
retry semantics — a re-executed task must land rows in the same bucket).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.fixtures import load_table

SALT_COL = "__salt"


def with_salt(df: DataFrame, fingerprint_cols: Sequence[str], buckets: int) -> DataFrame:
    """Deterministic salt bucket from non-key columns (the columns that
    *vary within* the hot key — ids, timestamps — so the hot key's rows
    spread evenly)."""
    return df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in fingerprint_cols]), F.lit(buckets))
    )


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    fingerprint_cols: Sequence[str],
    buckets: int = 16,
    count_alias: str | None = None,
) -> DataFrame:
    """Two-phase sum/count aggregation for skewed grouping keys.

    Phase 1 groups by (keys, salt) — the hot key's rows spread over
    ``buckets`` reducers; phase 2 combines the per-salt partials by the
    real keys.  Phase-2 input is at most ``|groups| × buckets`` rows, so
    the second shuffle is trivially small.  Semantics are identical to a
    plain groupBy for decomposable aggregates (sum/count here; min/max
    work the same way; avg must be computed as sum/count).
    """
    keys = list(keys)
    salted = with_salt(df, fingerprint_cols, buckets)
    phase1_aggs = [F.sum(c).alias(c) for c in sum_cols]
    if count_alias:
        phase1_aggs.append(F.count(F.lit(1)).alias(count_alias))
    partial = salted.groupBy(*keys, SALT_COL).agg(*phase1_aggs)
    phase2_aggs = [F.sum(c).alias(c) for c in sum_cols]
    if count_alias:
        phase2_aggs.append(F.sum(count_alias).alias(count_alias))
    return partial.groupBy(*keys).agg(*phase2_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    fingerprint_cols: Sequence[str],
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` is heavily skewed on ``keys``: salt the big
    side deterministically, replicate every small-side row across the full
    salt domain (×buckets — only acceptable because the small side is
    small), and join on (keys, salt).  Each formerly-hot partition becomes
    ``buckets`` even ones."""
    keys = list(keys)
    big_salted = with_salt(big, fingerprint_cols, buckets)
    small_exploded = small.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<long>")),
    )
    return big_salted.join(small_exploded, keys + [SALT_COL], how).drop(SALT_COL)


# ---------------------------------------------------------------------------
# Registered correctness queries: the oracle is the PLAIN (unsalted) SQL, so
# a green driver row is a proof that salting preserves semantics exactly.
# ---------------------------------------------------------------------------


@register(
    "skew_salted_agg",
    oracle="""
    SELECT event_type,
           CAST(SUM(event_id % 100) AS BIGINT) AS sum_mod,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation == plain groupBy (the oracle).

    `event_type` has only 5 values — exactly the hot-key shape where one
    reducer would own 20% of a 100 TB table.  Phase 1 spreads each type
    over 16 salt buckets (all reducers busy); phase 2 combines 5×16
    partial rows.  The driver comparison against the unsalted SQL is the
    equivalence proof.
    """
    events = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("event_id") % 100).alias("sum_mod"),
        "event_id",
    )
    return salted_aggregate(
        events,
        keys=["event_type"],
        sum_cols=["sum_mod"],
        fingerprint_cols=["event_id"],
        buckets=16,
        count_alias="n_events",
    ).orderBy("event_type")


@register(
    "skew_salted_join",
    oracle="""
    SELECT e.event_type,
           n.n_name,
           COUNT(*) AS n_rows,
           CAST(SUM(e.event_id % 1000) AS BIGINT) AS checksum
    FROM events e JOIN nation n ON (e.user_id % 25) = n.n_nationkey
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replicated-small-side salted join == plain equi-join (the oracle).

    The big side (events, keyed by a 25-value derived key) is salted over
    16 buckets; every nation row is replicated ×16 and joined on
    (key, salt) — a formerly single hot partition becomes 16 even ones.
    The aggregate after the join makes the comparison order-insensitive
    and small.
    """
    events = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        (F.col("user_id") % 25).alias("n_nationkey"),
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = salted_join(
        events,
        nation,
        keys=["n_nationkey"],
        fingerprint_cols=["event_id"],
        buckets=16,
    )
    return (
        joined.groupBy("event_type", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("event_id") % 1000).alias("checksum"),
        )
        .orderBy("event_type", "n_name")
    )
