"""Slowly-changing-dimension (SCD Type-2) history build.

Warehouse parity operator: compress an event-grain mutation stream into
attribute validity intervals — one row per (key, attribute-run) with
``valid_from`` / ``valid_to`` / ``is_current`` / ``version``.  This is the
dimension-table shape every Kimball-style warehouse maintains, and the
reference's upsert-only sink (script.js:184-214 keeps latest state, no
history) is exactly what SCD2 generalises: Type-1 = our MERGE operator,
Type-2 = this one.

Semantics: consecutive-run change detection.  A row opens a new version
when its attribute differs from the key's previous attribute in
deterministic order ``(ts, event_id)``; the version closes at the NEXT
version's ``valid_from`` (half-open intervals, so ``valid_to`` of one row
equals ``valid_from`` of the next — the join-friendly convention that
``asof.py`` probes consume directly).

Scale design (100 TB): one shuffle on the dimension key (all three window
functions share the same ``(key)`` partitioning — Catalyst runs them in a
single Window stage after one Exchange), then a narrow filter.  No
self-joins, no driver state.  Incremental maintenance at scale composes
with ``merge.py``: rebuild only keys present in the delta (delta keys are
a semi-join pushdown), which this formulation supports because a key's
history depends on its own rows alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.fixtures import load_table


def scd2_build(
    rows: DataFrame,
    key: str = "user_id",
    attr: str = "event_type",
    ts: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Build the Type-2 history of ``attr`` per ``key`` from an event stream."""
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    # A version opens where the attribute value changes (or at the first
    # row of the key).  lag() and the later lead()/row_number() all share
    # w's partitioning: one Exchange, one Window stage.
    changed = rows.withColumn("_prev", F.lag(attr).over(w)).filter(
        F.col("_prev").isNull() | (F.col("_prev") != F.col(attr))
    )
    wc = Window.partitionBy(key).orderBy(ts, tiebreak)
    return (
        changed.select(
            F.col(key),
            F.col(attr),
            F.col(ts).alias("valid_from"),
            F.lead(ts).over(wc).alias("valid_to"),
            F.row_number().over(wc).alias("version"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
        .orderBy(key, "version")
    )


_SCD2_ORACLE = """
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


@register("events_scd2_user_type", oracle=_SCD2_ORACLE)
def events_scd2_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 validity history of each user's event_type attribute."""
    return scd2_build(load_table(spark, sf_dir, "events"))
