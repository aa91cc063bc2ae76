"""Data-quality expectation suite (north star §2.10 — the dbt-test /
Great-Expectations layer every production pipeline runs before
publishing a table).

One registered query evaluates a declared rule set — not-null,
uniqueness, accepted values, numeric ranges, referential integrity,
freshness — and emits ONE row per rule with exact integer evidence
(checked, failed, pass_ppm, passed).  The reference validates its input
shape ad hoc (script.js: response-shape guard before the Oracle MERGE);
this operator is that idea promoted to a first-class, auditable
contract over warehouse tables.

Scale posture: every per-table rule family folds in ONE scan of its
table (conditional aggregates are map-side partials; the uniqueness
rule's count-distinct is the single shuffle, sharing the scan via
Spark's Expand).  Referential rules are LEFT ANTI joins on the key
columns only — Catalyst/AQE picks broadcast vs shuffle from actual
sizes, same as ``fk_integrity_audit``.  The result is O(rules) rows
regardless of table size; nothing wide ever leaves the executors.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..sources.fixtures import load_table

#: Freshness contract: the events feed must reach at least this date.
DQ_FRESHNESS_MIN_TS = "2024-01-10 00:00:00"


def _rule_row(rule: str, target: str, checked, failed):
    """Normalize one rule's evidence to the common row shape."""
    return F.struct(
        F.lit(rule).alias("rule"),
        F.lit(target).alias("target"),
        checked.cast("long").alias("checked"),
        failed.cast("long").alias("failed"),
    )


def _finalize(df: DataFrame) -> DataFrame:
    return df.select(
        "rule",
        "target",
        "checked",
        "failed",
        F.expr("(checked - failed) * 1000000 div checked").alias("pass_ppm"),
        (F.col("failed") == 0).alias("passed"),
    ).orderBy("rule", "target")


def dq_expectations_over(
    orders: DataFrame, lineitem: DataFrame, events: DataFrame
) -> DataFrame:
    """Evaluate the declared expectation suite; one row per rule."""
    cnt = F.count(F.lit(1))

    # one scan of orders: not-null, accepted-values, non-negative, unique
    o_rules = orders.agg(
        F.array(
            _rule_row(
                "not_null", "orders.o_custkey",
                cnt, F.count(F.when(F.col("o_custkey").isNull(), 1)),
            ),
            _rule_row(
                "accepted_values", "orders.o_orderstatus",
                cnt,
                F.count(
                    F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)
                ),
            ),
            _rule_row(
                "non_negative", "orders.o_totalprice",
                cnt, F.count(F.when(F.col("o_totalprice") <= 0, 1)),
            ),
            _rule_row(
                "unique", "orders.o_orderkey",
                cnt, cnt - F.count_distinct(F.col("o_orderkey")),
            ),
        ).alias("rows")
    )

    # one scan of lineitem: the two range rules
    l_rules = lineitem.agg(
        F.array(
            _rule_row(
                "range_0_0.1", "lineitem.l_discount",
                cnt,
                F.count(
                    F.when(
                        (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1), 1
                    )
                ),
            ),
            _rule_row(
                "range_1_50", "lineitem.l_quantity",
                cnt,
                F.count(
                    F.when(
                        (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1
                    )
                ),
            ),
        ).alias("rows")
    )

    # referential: key-projection anti join, size-based join strategy
    orphans = (
        lineitem.select(F.col("l_orderkey"))
        .join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "left_anti",
        )
        .agg(cnt.alias("orphans"))
    )
    totals = lineitem.agg(cnt.alias("n"))
    r_rules = orphans.join(F.broadcast(totals)).select(
        F.array(
            _rule_row(
                "referential", "lineitem.l_orderkey->orders",
                F.col("n"), F.col("orphans"),
            )
        ).alias("rows")
    )

    # freshness: one aggregate over events, compared to the contract
    f_rules = events.agg(
        F.array(
            _rule_row(
                "freshness", "events.ts",
                F.lit(1),
                F.when(
                    F.max("ts") >= F.lit(DQ_FRESHNESS_MIN_TS).cast("timestamp"),
                    F.lit(0),
                ).otherwise(F.lit(1)),
            )
        ).alias("rows")
    )

    all_rules = (
        o_rules.unionByName(l_rules).unionByName(r_rules).unionByName(f_rules)
        .select(F.explode("rows").alias("r"))
        .select("r.*")
    )
    return _finalize(all_rules)


@register(
    "dq_expectations",
    oracle=f"""
    SELECT rule, target, checked, failed,
           (checked - failed) * 1000000 // checked AS pass_ppm,
           failed = 0 AS passed
    FROM (
        SELECT 'not_null' AS rule, 'orders.o_custkey' AS target,
               CAST(COUNT(*) AS BIGINT) AS checked,
               CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) AS failed
        FROM orders
        UNION ALL
        SELECT 'accepted_values', 'orders.o_orderstatus',
               CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P'))
                    AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'non_negative', 'orders.o_totalprice',
               CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'unique', 'orders.o_orderkey',
               CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'range_0_0.1', 'lineitem.l_discount',
               CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1)
                    AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'range_1_50', 'lineitem.l_quantity',
               CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50)
                    AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'referential', 'lineitem.l_orderkey->orders',
               CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
               CAST((SELECT COUNT(*) FROM lineitem l
                     WHERE NOT EXISTS (SELECT 1 FROM orders o
                                       WHERE o.o_orderkey = l.l_orderkey))
                    AS BIGINT)
        UNION ALL
        SELECT 'freshness', 'events.ts',
               CAST(1 AS BIGINT),
               CAST(CASE WHEN (SELECT MAX(ts) FROM events)
                              >= TIMESTAMP '{DQ_FRESHNESS_MIN_TS}'
                         THEN 0 ELSE 1 END AS BIGINT)
    )
    ORDER BY rule, target
    """,
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared expectation suite over the warehouse tables — exact
    integer evidence per rule, strict-oracle checked."""
    return dq_expectations_over(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "events"),
    )


# ---------------------------------------------------------------------------
# GDPR-style cascade erasure with audit
# ---------------------------------------------------------------------------

#: Deterministic "erasure request" predicate over customers.
ERASE_MOD, ERASE_REM = 97, 13


def cascade_erase_audit(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Erase a customer set ACROSS the relational cascade (customer →
    orders → lineitem) and prove it: one audit row per table with
    before/removed/after counts and the residual count of rows still
    reachable from an erased customer — which must be zero, and is
    recomputed from the POST-erasure lineage, not inferred from the
    deltas.

    This is the tombstone MERGE's semantics applied transitively: the
    right-to-erasure request names a customer, but the data lives three
    tables deep.  Plan: TWO passes per table — one conditional aggregate
    folds (before, removed) in a single scan (the request predicate
    pushes into the customer/orders scans directly; lineitem flags
    membership with one left join against the request-sized erased-order
    key set), and one residual recount runs over the post-erasure
    lineage (anti-join / flag-filter, then re-probe).  At 100 TB every
    key-set join is the broadcast-prune shape because erasure requests
    are request-sized."""
    erased_cust_pred = F.col("c_custkey") % ERASE_MOD == ERASE_REM
    erased_cust = customer.filter(erased_cust_pred).select("c_custkey")
    # orders' membership is predicate-expressible (the FK carries the
    # customer key): no join needed to identify erased orders
    erased_orders_pred = F.col("o_custkey") % ERASE_MOD == ERASE_REM
    erased_orders = orders.filter(erased_orders_pred).select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    # lineitem membership: one left join marks erased-order lines
    line_flagged = lineitem.join(
        erased_orders.withColumn("_hit", F.lit(1)), "l_orderkey", "left"
    )

    cnt = F.count(F.lit(1))

    def counts(df, flag, name):
        """ONE scan: (before, removed) via conditional aggregation."""
        return df.agg(
            cnt.alias("rows_before"),
            F.count(F.when(flag, 1)).alias("rows_removed"),
        ).select(F.lit(name).alias("table_name"), "rows_before", "rows_removed")

    pre = (
        counts(customer, erased_cust_pred, "customer")
        .unionByName(counts(orders, erased_orders_pred, "orders"))
        .unionByName(
            counts(line_flagged, F.col("_hit").isNotNull(), "lineitem")
        )
    )

    # residuals: anything in the POST-erasure state still tied to an
    # erased key — recomputed over the post lineage, one branch per table
    cust_after = customer.join(erased_cust, "c_custkey", "left_anti")
    orders_after = orders.filter(~erased_orders_pred)
    line_after = line_flagged.filter(F.col("_hit").isNull())

    def residual(df, flag, name):
        return df.filter(flag).agg(cnt.alias("residual_rows")).select(
            F.lit(name).alias("table_name"), "residual_rows"
        )

    residuals = (
        residual(cust_after, erased_cust_pred, "customer")
        .unionByName(residual(orders_after, erased_orders_pred, "orders"))
        .unionByName(
            residual(line_after, F.col("_hit").isNotNull(), "lineitem")
        )
    )
    return (
        pre.join(F.broadcast(residuals), "table_name")
        .select(
            "table_name",
            "rows_before",
            "rows_removed",
            (F.col("rows_before") - F.col("rows_removed")).alias("rows_after"),
            "residual_rows",
        )
        .orderBy("table_name")
    )


@register(
    "gdpr_erasure_audit",
    oracle=f"""
    WITH erased_cust AS (
        SELECT c_custkey FROM customer
        WHERE c_custkey % {ERASE_MOD} = {ERASE_REM}
    ),
    erased_orders AS (
        SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM erased_cust)
    )
    SELECT * FROM (
        SELECT 'customer' AS table_name,
               CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS rows_before,
               CAST((SELECT COUNT(*) FROM erased_cust) AS BIGINT) AS rows_removed,
               CAST((SELECT COUNT(*) FROM customer) -
                    (SELECT COUNT(*) FROM erased_cust) AS BIGINT) AS rows_after,
               CAST(0 AS BIGINT) AS residual_rows
        UNION ALL
        SELECT 'orders',
               CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
               CAST((SELECT COUNT(*) FROM orders
                     WHERE o_custkey IN (SELECT c_custkey FROM erased_cust))
                    AS BIGINT),
               CAST((SELECT COUNT(*) FROM orders) -
                    (SELECT COUNT(*) FROM orders
                     WHERE o_custkey IN (SELECT c_custkey FROM erased_cust))
                    AS BIGINT),
               CAST(0 AS BIGINT)
        UNION ALL
        SELECT 'lineitem',
               CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
               CAST((SELECT COUNT(*) FROM lineitem
                     WHERE l_orderkey IN (SELECT o_orderkey FROM erased_orders))
                    AS BIGINT),
               CAST((SELECT COUNT(*) FROM lineitem) -
                    (SELECT COUNT(*) FROM lineitem
                     WHERE l_orderkey IN (SELECT o_orderkey FROM erased_orders))
                    AS BIGINT),
               CAST(0 AS BIGINT)
    )
    ORDER BY table_name
    """,
)
def gdpr_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cascade erasure of a deterministic customer set with a zero-
    residual audit recomputed from the post-erasure state."""
    return cascade_erase_audit(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


# ---------------------------------------------------------------------------
# DP-shaped noisy release: bounded influence + seeded discrete Laplace
# ---------------------------------------------------------------------------

#: Per-(user, group) contribution bound — the DP sensitivity of each
#: released count (a user's presence changes it by at most this).
DP_CAP = 8

#: Privacy-loss parameter for the released counts.
DP_EPS = 1.0

#: 13 hex digits of md5 → uniform in [0, 16^13), identical in every engine.
_U_DEN = float(16**13)


def _seeded_uniform(key, salt: str):
    """Uniform (0,1) as a pure function of (key, salt) — md5-based like the
    sampling tier, so the draw is reproducible across engines, runs and
    partitionings.  The open interval is enforced by +0.5/denominator."""
    h = F.md5(F.concat_ws("\x1f", key.cast("string"), F.lit(salt)))
    return (F.conv(F.substring(h, 1, 13), 16, 10).cast("double") + 0.5) / F.lit(
        _U_DEN
    )


def dp_noisy_counts(
    df: DataFrame,
    group_col: str,
    user_col: str,
    ts_cols: Sequence[str],
    cap: int = DP_CAP,
    eps: float = DP_EPS,
    seed: str = "release-1",
):
    """Differential-privacy-SHAPED count release: per-user contributions
    capped at ``cap`` rows per group (earliest by ``ts_cols``,
    deterministic), then two-sided-geometric (discrete Laplace) noise with
    parameter exp(−ε/cap) added to each group's count.

    The mechanism math is the textbook ε-DP geometric mechanism for
    sensitivity-``cap`` counts.  The one DELIBERATE deviation: noise is
    drawn from a SEEDED md5 PRNG keyed on (group, seed) so releases are
    reproducible and testable — a production deployment substitutes a
    secret per-release seed (or a real entropy source); everything else
    (capping, sensitivity accounting, inverse-CDF sampling) carries over
    unchanged.  Noise generation is pure Catalyst expressions (md5, ln,
    floor) — JVM-side, no Python in the hot path.

    Geometric sampling: G = ⌊ln(u)/ln(p)⌋ with p = e^{−ε/cap} gives
    G ~ Geometric(1−p) on {0,1,…}; noise = G₁ − G₂ is the two-sided
    geometric (discrete Laplace), the integer analogue of Laplace(cap/ε).
    """
    p = math.exp(-eps / cap)
    w = Window.partitionBy(group_col, user_col).orderBy(*ts_cols)
    capped = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("capped_n"))
    )
    lnp = F.lit(math.log(p))
    g1 = F.floor(F.log(_seeded_uniform(F.col(group_col), seed + "/a")) / lnp)
    g2 = F.floor(F.log(_seeded_uniform(F.col(group_col), seed + "/b")) / lnp)
    return capped.select(
        group_col,
        (F.col("capped_n") + g1 - g2).alias("noisy_n"),
        (g1 - g2).alias("noise"),
        F.lit(cap).alias("cap"),
        F.lit(eps).alias("eps"),
    )


@register(
    "events_dp_counts",
    # Upgraded from rows-only (VERDICT r08 task 3 direction): the seeded
    # md5 noise was DESIGNED to be engine-reproducible, so the oracle
    # replays the whole mechanism — cap window, hex-prefix uniform,
    # inverse-CDF geometric — in DuckDB.  ln(p) is embedded as the exact
    # double literal Spark uses (math.log(math.exp(-eps/cap))).
    oracle="""
    WITH capped AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS capped_n
        FROM (
            SELECT event_type,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type, user_id
                       ORDER BY ts, event_id) AS rn
            FROM events
        ) WHERE rn <= 8
        GROUP BY event_type
    ),
    noisy AS (
        SELECT event_type, capped_n,
               CAST(FLOOR(LN((CAST(CONCAT('0x', SUBSTRING(
                        md5(CONCAT(event_type, CHR(31), 'release-1/a')),
                        1, 13)) AS BIGINT) + 0.5) / 4503599627370496.0)
                    / (-0.12499999999999994)) AS BIGINT) AS g1,
               CAST(FLOOR(LN((CAST(CONCAT('0x', SUBSTRING(
                        md5(CONCAT(event_type, CHR(31), 'release-1/b')),
                        1, 13)) AS BIGINT) + 0.5) / 4503599627370496.0)
                    / (-0.12499999999999994)) AS BIGINT) AS g2
        FROM capped
    )
    SELECT event_type,
           capped_n + g1 - g2 AS noisy_n,
           g1 - g2 AS noise,
           8 AS cap,
           CAST(1.0 AS DOUBLE) AS eps
    FROM noisy
    ORDER BY event_type
    """,
)
def events_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Private per-type event counts: the contribution cap bounds any one
    user's influence at DP_CAP rows per type (the sensitivity), then each
    count is released with discrete-Laplace noise scaled to cap/ε — the
    geometric mechanism.  Deterministic by seeded construction, so the
    rows-only driver check is stable; tests/test_quality.py pins the
    bounded-influence property (dropping ANY single user moves each
    released count by ≤ cap + 0 — the noise, keyed on the group, does not
    change) and the noise distribution's scale.

    At 100 TB this is one window + one O(groups) aggregate — the noise
    costs nothing; the cap's (group, user) window is the same exchange
    the contribution-cap operator already pays."""
    events = load_table(spark, sf_dir, "events")
    return dp_noisy_counts(
        events, "event_type", "user_id", ["ts", "event_id"]
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# functional-dependency audit (schema profiling)
# ---------------------------------------------------------------------------

#: Candidate FDs audited by ``fd_violation_audit`` — a mix of holding and
#: violated dependencies so the report exercises both outcomes.
FD_CANDIDATES = (
    ("orders", "o_custkey", "o_orderpriority"),
    ("orders", "o_orderkey", "o_orderstatus"),  # key LHS → holds
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("customer", "c_nationkey", "c_mktsegment"),
)


def fd_audit_one(df: DataFrame, lhs: str, rhs: str, label: str) -> DataFrame:
    """One-row audit of the functional dependency ``lhs → rhs``.

    ``g3_rows`` is the g3 error (Kivinen–Mannila): the minimum number of
    rows to delete so the FD holds = n_rows − Σ per-LHS max RHS-value
    count — the standard measure FD-discovery profilers (Tane/Metanome
    lineage) report for approximate dependencies.

    Scale: two keyed aggregations with map-side partials — (lhs, rhs)
    counts, then per-lhs sum/max/count — followed by an O(1) global
    rollup.  No windows, no collects; the shuffles carry counts only."""
    per = df.groupBy(lhs, rhs).agg(F.count(F.lit(1)).alias("c"))
    return fd_audit_from_counts(per, lhs, rhs, label)


def fd_audit_from_counts(
    per: DataFrame, lhs: str, rhs: str, label: str
) -> DataFrame:
    """FD audit from a pre-reduced ``(lhs, rhs, c)`` count relation —
    the mergeable-summary form: (lhs, rhs) counts are associative under
    SUM, so partials from any partition or micro-batch split fold into
    the same audit row (shared core with the streaming twin)."""
    g = per.groupBy(lhs).agg(
        F.sum("c").alias("n"),
        F.max("c").alias("mx"),
        F.count(F.lit(1)).alias("n_rhs"),
    )
    return g.agg(
        F.sum("n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_lhs"),
        F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0)).alias(
            "violating_lhs"
        ),
        (F.sum("n") - F.sum("mx")).alias("g3_rows"),
    ).select(
        F.lit(label).alias("fd"),
        "n_rows",
        "n_lhs",
        "violating_lhs",
        "g3_rows",
        F.round(
            F.col("g3_rows").cast("double") / F.col("n_rows"), 6
        ).alias("g3_rate"),
        (F.col("g3_rows") == 0).alias("holds"),
    )


def _fd_branch_sql(table: str, lhs: str, rhs: str) -> str:
    return f"""
    SELECT '{table}.{lhs}->{rhs}' AS fd,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           COUNT(*) AS n_lhs,
           CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS violating_lhs,
           CAST(SUM(n) - SUM(mx) AS BIGINT) AS g3_rows,
           ROUND(CAST(SUM(n) - SUM(mx) AS DOUBLE) / SUM(n), 6) AS g3_rate,
           SUM(n) = SUM(mx) AS holds
    FROM (
        SELECT {lhs} AS l, SUM(c) AS n, MAX(c) AS mx, COUNT(*) AS n_rhs
        FROM (SELECT {lhs}, {rhs}, COUNT(*) AS c FROM {table} GROUP BY 1, 2)
        GROUP BY {lhs}
    )
    """


@register(
    "fd_violation_audit",
    oracle=" UNION ALL ".join(
        _fd_branch_sql(t, lh, rh) for t, lh, rh in FD_CANDIDATES
    ),
)
def fd_violation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-functional-dependency profile across the schema: for
    each candidate FD, the row/LHS-group counts, how many LHS groups map
    to more than one RHS value, and the g3 repair cost (rows to delete
    for the FD to hold).  A key-LHS candidate is included so the report
    proves a holding dependency reads as holds=true / g3=0."""
    from functools import reduce

    parts = [
        fd_audit_one(
            load_table(spark, sf_dir, t), lh, rh, f"{t}.{lh}->{rh}"
        )
        for t, lh, rh in FD_CANDIDATES
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)
