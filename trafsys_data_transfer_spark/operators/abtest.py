"""A/B experiment analysis: two-proportion z-test in exact rational
arithmetic.

The experimentation readout every product pipeline runs nightly: split
users into variants, compare per-variant conversion, decide
significance.  The whole computation stays in integers so the output
hash-checks across engines:

* variant assignment: ``user_id % 2`` (deterministic; the hash-bucket
  splitter in sampling.py is the production assignment — modulo keeps
  the oracle trivially portable),
* per-variant rates in exact ppm,
* the pooled two-proportion z² statistic as an exact integer ratio:

      z² = (c₁n₂ − c₂n₁)² · N / (n₁ · n₂ · C · (N−C))

  with C = c₁+c₂, N = n₁+n₂ — scaled ×1e6, floor division.  The
  significance flag is z² > 4 (the 2σ level, exactly representable;
  the 1.96σ boundary would drag an irrational constant through the
  comparison).

Numeric headroom (ADVICE r05 #5): the ratio is computed in DECIMAL(38,0)
on the Spark side and HUGEINT (128-bit) on the DuckDB side — both exact
integer arithmetic with ~10³⁸ of numerator headroom, then ``div``-floored
back to BIGINT.  The binding constraint is d²·N·10⁶ < 10³⁸ with
d = c₁n₂ − c₂n₁ = n²·Δp for equal arms of size n and a conversion-rate
gap Δp: safe through ~10⁶ users per arm at a 50-point gap, ~10⁷ at a
1-point gap (vs ~5·10⁴ for the old BIGINT form).  Past the bound Spark's
decimal overflow raises under ANSI mode (and yields NULL with ANSI off)
— never a silently wrapped wrong number; the exact-ppm contract would
need a reduced-fraction or float fallback tier before arms grow past
tens of millions of users, at which point z-tests are academic anyway.

Scale: one conditional aggregation per (event_type) over a per-user
rollup — two key shuffles total (user grain, then metric grain),
map-side partials both times; the final stats table is O(event types).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.fixtures import load_table

#: z² significance threshold: 4 = the 2σ level, exact in integers.
Z2_THRESHOLD = 4

#: Exact pooled z²×1e6 over columns (c1, c2, n1, n2) — DECIMAL(38,0)
#: keeps the whole ratio exact far past BIGINT's range (see module
#: docstring); `div` floor-divides decimals back to BIGINT.
Z2_EXPR = (
    "CASE WHEN (c1 + c2) > 0 AND (n1 + n2 - c1 - c2) > 0"
    " THEN (CAST(c1 AS DECIMAL(38,0))*n2 - CAST(c2 AS DECIMAL(38,0))*n1)"
    "      * (CAST(c1 AS DECIMAL(38,0))*n2 - CAST(c2 AS DECIMAL(38,0))*n1)"
    "      * (n1 + n2) * 1000000"
    "      div (CAST(n1 AS DECIMAL(38,0)) * n2 * (c1 + c2)"
    "           * (n1 + n2 - c1 - c2))"
    " ELSE CAST(0 AS BIGINT) END"
)


@register(
    "events_ab_test",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id, user_id % 2 AS variant, event_type
        FROM events GROUP BY user_id, event_type
    ),
    users AS (
        SELECT user_id % 2 AS variant, COUNT(DISTINCT user_id) AS n
        FROM events GROUP BY 1
    ),
    conv AS (
        SELECT event_type, variant, COUNT(*) AS c
        FROM per_user GROUP BY 1, 2
    ),
    wide AS (
        SELECT c.event_type,
               MAX(CASE WHEN c.variant = 0 THEN c.c ELSE 0 END) AS c1,
               MAX(CASE WHEN c.variant = 1 THEN c.c ELSE 0 END) AS c2,
               (SELECT n FROM users WHERE variant = 0) AS n1,
               (SELECT n FROM users WHERE variant = 1) AS n2
        FROM conv c GROUP BY c.event_type
    )
    SELECT event_type,
           CAST(n1 AS BIGINT) AS n1, CAST(c1 AS BIGINT) AS c1,
           CAST(n2 AS BIGINT) AS n2, CAST(c2 AS BIGINT) AS c2,
           CAST(c1 * 1000000 // n1 AS BIGINT) AS rate1_ppm,
           CAST(c2 * 1000000 // n2 AS BIGINT) AS rate2_ppm,
           CAST(CASE WHEN (c1 + c2) > 0 AND (n1 + n2 - c1 - c2) > 0
                THEN (CAST(c1 AS HUGEINT)*n2 - CAST(c2 AS HUGEINT)*n1)
                     * (CAST(c1 AS HUGEINT)*n2 - CAST(c2 AS HUGEINT)*n1)
                     * (n1 + n2) * 1000000
                     // (CAST(n1 AS HUGEINT) * n2 * (c1 + c2)
                         * (n1 + n2 - c1 - c2))
                ELSE 0 END AS BIGINT) AS z2_ppm,
           CAST(CASE WHEN (c1 + c2) > 0 AND (n1 + n2 - c1 - c2) > 0
                THEN (CAST(c1 AS HUGEINT)*n2 - CAST(c2 AS HUGEINT)*n1)
                     * (CAST(c1 AS HUGEINT)*n2 - CAST(c2 AS HUGEINT)*n1)
                     * (n1 + n2) * 1000000
                     // (CAST(n1 AS HUGEINT) * n2 * (c1 + c2)
                         * (n1 + n2 - c1 - c2))
                ELSE 0 END AS BIGINT) > {Z2_THRESHOLD} * 1000000 AS significant
    FROM wide
    ORDER BY event_type
    """,
)
def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type A/B readout: for each metric "user did ≥1 X", both
    variants' user counts, converter counts, exact ppm rates, the exact
    pooled z² (×1e6) and a 2σ significance flag.

    The fixture's uniform generator should flag nothing — a significant
    row here would itself be a generator bug; the planted-effect pytest
    proves the flag fires when a real effect exists.
    """
    events = load_table(spark, sf_dir, "events")
    per_user = (
        events.select(
            "user_id", (F.col("user_id") % 2).alias("variant"), "event_type"
        )
        .distinct()
    )
    users = events.select("user_id").distinct().groupBy(
        (F.col("user_id") % 2).alias("variant")
    ).agg(F.count(F.lit(1)).alias("n"))
    conv = per_user.groupBy("event_type", "variant").agg(
        F.count(F.lit(1)).alias("c")
    )
    wide = conv.groupBy("event_type").agg(
        F.max(F.when(F.col("variant") == 0, F.col("c")).otherwise(0)).alias(
            "c1"
        ),
        F.max(F.when(F.col("variant") == 1, F.col("c")).otherwise(0)).alias(
            "c2"
        ),
    )
    arms = (
        users.groupBy()
        .pivot("variant", [0, 1])
        .agg(F.first("n"))
        .toDF("n1", "n2")
    )
    z2 = Z2_EXPR
    return (
        wide.join(F.broadcast(arms))
        .select(
            "event_type",
            F.col("n1").cast("bigint").alias("n1"),
            "c1",
            F.col("n2").cast("bigint").alias("n2"),
            "c2",
            F.expr("c1 * 1000000 div n1").alias("rate1_ppm"),
            F.expr("c2 * 1000000 div n2").alias("rate2_ppm"),
            F.expr(z2).alias("z2_ppm"),
            (F.expr(z2) > Z2_THRESHOLD * 1_000_000).alias("significant"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# CUPED variance reduction (covariate-adjusted experiment readout)
# ---------------------------------------------------------------------------


def cuped_adjusted_effect(events: DataFrame) -> DataFrame:
    """CUPED-adjusted treatment effect: outcome = per-user purchase value,
    covariate = per-user click value, assignment = ``user_id % 2``.

    CUPED (Deng et al., WSDM 2013) subtracts the part of the outcome a
    pre-experiment covariate predicts: ``Y' = Y − θ·X`` with
    ``θ = cov(Y,X)/var(X)`` pooled across arms, shrinking the effect's
    variance by the squared correlation ρ² — the standard way to read an
    experiment days earlier at the same power.

    Exactness: per-user sums are integer centi-units; the five moment
    sums (Sx, Sy, Sxy, Sxx, Syy) accumulate per-row products cast to
    DECIMAL(38,0) (the Z2_EXPR headroom discipline), so θ's numerator
    ``n·Sxy − Sx·Sy`` and denominator are EXACT integers in both
    engines, ρ²·1e6 is an exact floor-divided BIGINT, and the only
    doubles are final ROUND(·, 6) quotients of identical exact inputs.

    Scale: one user-grain aggregation (map-side combinable), then a
    single 5-moment fold to ONE row.  No windows, no collects — the
    whole readout is two shuffles regardless of corpus size.
    """
    per_user = (
        events.groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.floor(F.col("value") * 100 + F.lit(0.5)).cast(
                            "long"
                        ),
                    )
                ),
                F.lit(0),
            ).alias("y"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "click",
                        F.floor(F.col("value") * 100 + F.lit(0.5)).cast(
                            "long"
                        ),
                    )
                ),
                F.lit(0),
            ).alias("x"),
        )
        .withColumn("arm", (F.col("user_id") % 2).cast("int"))
    )
    moments = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0))")).alias("sx"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0))")).alias("sy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).alias("sxy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("sxx"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).alias("syy"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_t"),
        F.sum(F.when(F.col("arm") == 1, F.col("y"))).alias("sy_t"),
        F.sum(F.when(F.col("arm") == 0, F.col("y"))).alias("sy_c"),
        F.sum(F.when(F.col("arm") == 1, F.col("x"))).alias("sx_t"),
        F.sum(F.when(F.col("arm") == 0, F.col("x"))).alias("sx_c"),
    )
    return moments.select(
        F.col("n").alias("n_users"),
        F.col("n_t").cast("long").alias("n_t"),
        (F.col("n") - F.col("n_t")).cast("long").alias("n_c"),
        # zero-variance guards: a constant covariate admits no
        # adjustment (θ = 0); a constant outcome has ρ² = 0.
        F.expr(
            "CASE WHEN n * sxx - sx * sx > 0 THEN"
            " ROUND(CAST(n * sxy - sx * sy AS DOUBLE)"
            "       / CAST(n * sxx - sx * sx AS DOUBLE), 6)"
            " ELSE CAST(0.0 AS DOUBLE) END"
        ).alias("theta"),
        F.expr(
            "CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN"
            " CAST((n * sxy - sx * sy) * (n * sxy - sx * sy) * 1000000"
            "      div ((n * sxx - sx * sx) * (n * syy - sy * sy))"
            "      AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        ).alias("rho2_ppm"),
        F.expr(
            "ROUND(CAST(sy_t AS DOUBLE) / n_t / 100.0"
            "      - CAST(sy_c AS DOUBLE) / (n - n_t) / 100.0, 6)"
        ).alias("diff_raw"),
        F.expr(
            "ROUND((CAST(sy_t AS DOUBLE) / n_t / 100.0"
            "       - CAST(sy_c AS DOUBLE) / (n - n_t) / 100.0)"
            "      - (CASE WHEN n * sxx - sx * sx > 0 THEN"
            "          CAST(n * sxy - sx * sy AS DOUBLE)"
            "          / CAST(n * sxx - sx * sx AS DOUBLE)"
            "         ELSE 0.0 END)"
            "        * (CAST(sx_t AS DOUBLE) / n_t / 100.0"
            "           - CAST(sx_c AS DOUBLE) / (n - n_t) / 100.0), 6)"
        ).alias("diff_cuped"),
    )


_CUPED_ORACLE = """
WITH per_user AS (
    SELECT user_id,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END), 0)
                AS BIGINT) AS y,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'click'
                THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END), 0)
                AS BIGINT) AS x,
           CAST(user_id % 2 AS INT) AS arm
    FROM events GROUP BY user_id
),
m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           SUM(CAST(x AS HUGEINT)) AS sx,
           SUM(CAST(y AS HUGEINT)) AS sy,
           SUM(CAST(x AS HUGEINT) * y) AS sxy,
           SUM(CAST(x AS HUGEINT) * x) AS sxx,
           SUM(CAST(y AS HUGEINT) * y) AS syy,
           CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
           SUM(CASE WHEN arm = 1 THEN y END) AS sy_t,
           SUM(CASE WHEN arm = 0 THEN y END) AS sy_c,
           SUM(CASE WHEN arm = 1 THEN x END) AS sx_t,
           SUM(CASE WHEN arm = 0 THEN x END) AS sx_c
    FROM per_user
)
SELECT n AS n_users, n_t, CAST(n - n_t AS BIGINT) AS n_c,
       CASE WHEN n * sxx - sx * sx > 0 THEN
            ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE), 6)
       ELSE 0.0 END AS theta,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
            CAST((n * sxy - sx * sy) * (n * sxy - sx * sy) * 1000000
                 // ((n * sxx - sx * sx) * (n * syy - sy * sy))
                 AS BIGINT)
       ELSE CAST(0 AS BIGINT) END AS rho2_ppm,
       ROUND(CAST(sy_t AS DOUBLE) / n_t / 100.0
             - CAST(sy_c AS DOUBLE) / (n - n_t) / 100.0, 6) AS diff_raw,
       ROUND((CAST(sy_t AS DOUBLE) / n_t / 100.0
              - CAST(sy_c AS DOUBLE) / (n - n_t) / 100.0)
             - (CASE WHEN n * sxx - sx * sx > 0 THEN
                 CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE)
                ELSE 0.0 END)
               * (CAST(sx_t AS DOUBLE) / n_t / 100.0
                  - CAST(sx_c AS DOUBLE) / (n - n_t) / 100.0), 6)
           AS diff_cuped
FROM m
"""


@register("events_ab_cuped", oracle=_CUPED_ORACLE)
def events_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED covariate-adjusted A/B effect with exact moment arithmetic."""
    return cuped_adjusted_effect(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Multiple-testing correction (Benjamini-Hochberg step-up) and MDE
# ---------------------------------------------------------------------------

#: χ²(1) inverse CDF at p = i·0.01 for i = 1..5 — the BH step-up
#: thresholds for m = 5 metrics at FDR q = 0.05, inlined ×1e6 as integer
#: LITERALS so the whole correction is integer comparison.  (z² is
#: monotone in the p-value, so ranking by z² descending IS ranking by p
#: ascending and no CDF evaluation ever happens in-plan.)
BH_THRESH_PPM = (6634897, 5411894, 4709292, 4217885, 3841459)


def _ab_wide(events: DataFrame):
    """Shared (event_type, c1, c2, n1, n2) conversion relation — the
    sufficient statistics all experiment readouts fold from."""
    per_user = events.select(
        "user_id", (F.col("user_id") % 2).alias("variant"), "event_type"
    ).distinct()
    users = (
        events.select("user_id")
        .distinct()
        .groupBy((F.col("user_id") % 2).alias("variant"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    conv = per_user.groupBy("event_type", "variant").agg(
        F.count(F.lit(1)).alias("c")
    )
    wide = conv.groupBy("event_type").agg(
        F.max(F.when(F.col("variant") == 0, F.col("c")).otherwise(0)).alias(
            "c1"
        ),
        F.max(F.when(F.col("variant") == 1, F.col("c")).otherwise(0)).alias(
            "c2"
        ),
    )
    arms = (
        users.groupBy()
        .pivot("variant", [0, 1])
        .agg(F.first("n"))
        .toDF("n1", "n2")
    )
    return wide.join(F.broadcast(arms))


_AB_WIDE_SQL = """
    per_user AS (
        SELECT user_id, user_id % 2 AS variant, event_type
        FROM events GROUP BY user_id, event_type
    ),
    users AS (
        SELECT user_id % 2 AS variant, COUNT(DISTINCT user_id) AS n
        FROM events GROUP BY 1
    ),
    conv AS (
        SELECT event_type, variant, COUNT(*) AS c
        FROM per_user GROUP BY 1, 2
    ),
    wide AS (
        SELECT c.event_type,
               MAX(CASE WHEN c.variant = 0 THEN c.c ELSE 0 END) AS c1,
               MAX(CASE WHEN c.variant = 1 THEN c.c ELSE 0 END) AS c2,
               (SELECT n FROM users WHERE variant = 0) AS n1,
               (SELECT n FROM users WHERE variant = 1) AS n2
        FROM conv c GROUP BY c.event_type
    )
"""

_Z2_SQL_DUCK = """CAST(CASE WHEN (c1 + c2) > 0 AND (n1 + n2 - c1 - c2) > 0
     THEN (CAST(c1 AS HUGEINT)*n2 - CAST(c2 AS HUGEINT)*n1)
          * (CAST(c1 AS HUGEINT)*n2 - CAST(c2 AS HUGEINT)*n1)
          * (n1 + n2) * 1000000
          // (CAST(n1 AS HUGEINT) * n2 * (c1 + c2)
              * (n1 + n2 - c1 - c2))
     ELSE 0 END AS BIGINT)"""


def bh_fdr_correction(events: DataFrame) -> DataFrame:
    """Benjamini-Hochberg step-up over the per-metric z² tests: rank
    metrics by evidence (z² descending ⇔ p ascending), pass rank i iff
    ``z²_(i) ≥ χ²-inv(1 − i·q/m)``, then reject every metric up to the
    LARGEST passing rank — the step-up that controls the false-discovery
    rate at q across the whole metric battery, where per-metric 2σ flags
    would inflate family-wise false positives m-fold.

    Thresholds are integer ppm literals (the χ² quantiles for m = 5,
    q = 0.05); the ranking window runs over the guarded O(metrics)
    relation; every comparison is exact integer.
    """
    from .guards import bounded_window_guard

    wide = _ab_wide(events).select(
        "event_type", "c1", "c2", "n1", "n2", F.expr(Z2_EXPR).alias("z2_ppm")
    )
    thresh = F.array(*[F.lit(t) for t in BH_THRESH_PPM])
    w_rank = Window.partitionBy().orderBy(
        F.desc("z2_ppm"), F.asc("event_type")
    )
    ranked = (
        bounded_window_guard(wide, "events_ab_fdr", 10_000)
        .withColumn("rnk", F.row_number().over(w_rank))
        .withColumn(
            "thresh_ppm",
            F.element_at(thresh, F.least(F.col("rnk"), F.lit(len(BH_THRESH_PPM)))),
        )
        .withColumn("passed", F.col("z2_ppm") >= F.col("thresh_ppm"))
    )
    w_all = Window.partitionBy()
    return (
        ranked.withColumn(
            "max_passed_rnk",
            F.coalesce(
                F.max(F.when(F.col("passed"), F.col("rnk"))).over(w_all),
                F.lit(0),
            ),
        )
        .select(
            "event_type",
            F.col("rnk").cast("long").alias("rnk"),
            "z2_ppm",
            F.col("thresh_ppm").cast("long").alias("thresh_ppm"),
            "passed",
            (F.col("rnk") <= F.col("max_passed_rnk")).alias("fdr_significant"),
        )
        .orderBy("rnk")
    )


_BH_ARR = "[" + ", ".join(str(t) for t in BH_THRESH_PPM) + "]"

_FDR_ORACLE = f"""
WITH {_AB_WIDE_SQL},
scored AS (
    SELECT event_type, {_Z2_SQL_DUCK} AS z2_ppm FROM wide
),
ranked AS (
    SELECT event_type, z2_ppm,
           ROW_NUMBER() OVER (ORDER BY z2_ppm DESC, event_type) AS rnk
    FROM scored
),
flagged AS (
    SELECT event_type, rnk, z2_ppm,
           ({_BH_ARR})[LEAST(rnk, {len(BH_THRESH_PPM)})] AS thresh_ppm,
           z2_ppm >= ({_BH_ARR})[LEAST(rnk, {len(BH_THRESH_PPM)})] AS passed
    FROM ranked
)
SELECT event_type, CAST(rnk AS BIGINT) AS rnk, z2_ppm,
       CAST(thresh_ppm AS BIGINT) AS thresh_ppm, passed,
       rnk <= COALESCE((SELECT MAX(rnk) FROM flagged WHERE passed), 0)
           AS fdr_significant
FROM flagged
ORDER BY rnk
"""


@register("events_ab_fdr", oracle=_FDR_ORACLE)
def events_ab_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BH false-discovery-rate correction across the per-metric z² tests."""
    return bh_fdr_correction(load_table(spark, sf_dir, "events"))


def mde_readout(events: DataFrame) -> DataFrame:
    """Minimum detectable effect at the current sample sizes: per metric,
    the smallest rate difference a 2-sided α = 0.05 test detects with
    80% power — ``(z_α + z_β)·√(p̄(1−p̄)·(1/n₁+1/n₂))`` — next to the
    observed difference, answering "is this flat metric POWERED or just
    undersized?".

    Doubles appear only in the final closed form over exact integer
    counts (IEEE sqrt is exactly rounded, so both engines agree), with
    one ROUND.  Same two-shuffle statistics fold as every readout here.
    """
    wide = _ab_wide(events)
    expr = (
        "ROUND((1.959964 + 0.841621)"
        " * sqrt((CAST(c1 + c2 AS DOUBLE) / (n1 + n2))"
        "        * (1.0 - CAST(c1 + c2 AS DOUBLE) / (n1 + n2))"
        "        * (1.0 / n1 + 1.0 / n2)), 6)"
    )
    return (
        wide.select(
            "event_type",
            F.expr("c1 * 1000000 div n1").alias("rate1_ppm"),
            F.expr("c2 * 1000000 div n2").alias("rate2_ppm"),
            F.expr(
                "ROUND(ABS(CAST(c2 AS DOUBLE) / n2"
                "          - CAST(c1 AS DOUBLE) / n1), 6)"
            ).alias("observed_diff"),
            F.expr(expr).alias("mde"),
            F.expr(
                f"ABS(CAST(c2 AS DOUBLE) / n2 - CAST(c1 AS DOUBLE) / n1)"
                f" >= {0} + " + expr
            ).alias("powered_detection"),
        )
        .orderBy("event_type")
    )


_MDE_ORACLE = f"""
WITH {_AB_WIDE_SQL}
SELECT event_type,
       CAST(c1 * 1000000 // n1 AS BIGINT) AS rate1_ppm,
       CAST(c2 * 1000000 // n2 AS BIGINT) AS rate2_ppm,
       ROUND(ABS(CAST(c2 AS DOUBLE) / n2 - CAST(c1 AS DOUBLE) / n1), 6)
           AS observed_diff,
       ROUND((1.959964 + 0.841621)
             * sqrt((CAST(c1 + c2 AS DOUBLE) / (n1 + n2))
                    * (1.0 - CAST(c1 + c2 AS DOUBLE) / (n1 + n2))
                    * (1.0 / n1 + 1.0 / n2)), 6) AS mde,
       ABS(CAST(c2 AS DOUBLE) / n2 - CAST(c1 AS DOUBLE) / n1)
           >= 0 + ROUND((1.959964 + 0.841621)
              * sqrt((CAST(c1 + c2 AS DOUBLE) / (n1 + n2))
                     * (1.0 - CAST(c1 + c2 AS DOUBLE) / (n1 + n2))
                     * (1.0 / n1 + 1.0 / n2)), 6) AS powered_detection
FROM wide
ORDER BY event_type
"""


@register("events_ab_mde", oracle=_MDE_ORACLE)
def events_ab_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect per metric at the current arm sizes."""
    return mde_readout(load_table(spark, sf_dir, "events"))
