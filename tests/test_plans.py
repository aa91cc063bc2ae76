"""Physical-plan regression guards: the 100 TB posture is a property of the
plan, not the output, so we assert the plan shape directly — filters reach
the parquet scan, projections prune columns, dimension joins broadcast, and
hot paths stay inside whole-stage codegen."""

from __future__ import annotations

import pytest

from trafsys_data_transfer_spark.registry import all_queries


def _formatted_plan(spark, name, sf_dir):
    df = all_queries()[name].build(spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_flagship_broadcasts_dimensions_and_pushes_filters(spark, sf_dir):
    plan = _formatted_plan(spark, "flagship_revenue_topk", sf_dir)
    # Date/segment predicates must reach the scans, not run post-scan.
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan
    # Dimension joins broadcast; the lineitem fact side must never be
    # shuffled before the join.  (Formatted plans print each operator twice:
    # once in the tree, once in the numbered details.)
    assert plan.count("BroadcastHashJoin") == 2 * 2
    assert "SortMergeJoin" not in plan
    # No Python evaluation anywhere in the relational hot path.
    assert "EvalPython" not in plan


def test_flagship_prunes_columns(spark, sf_dir):
    plan = _formatted_plan(spark, "flagship_revenue_topk", sf_dir)
    # lineitem has 16 columns; the scan must read only the 4 used.
    # (l_shipdate's printed type tracks the NTZ-inference conf: the engine
    # pins inferTimestampNTZ=false → plain `timestamp`.)
    assert (
        "ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double,"
        "l_discount:double,l_shipdate:timestamp>" in plan
    )


def test_market_share_joins_all_broadcast(spark, sf_dir):
    plan = _formatted_plan(spark, "regional_market_share", sf_dir)
    assert plan.count("BroadcastHashJoin") == 4 * 2
    assert "SortMergeJoin" not in plan


def test_minhash_has_no_cartesian_and_single_signature_pass(spark, sf_dir):
    plan = _formatted_plan(spark, "dedup_minhash_lsh", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # r11: the registered query lazily localCheckpoints the candidate
    # pairs (they fork into the candidate-id filter AND the verify
    # joins), so the signature subtree no longer shows in the final
    # plan.  The single-signature-pass property is asserted on the
    # candidate subtree itself: the Pandas-UDF stage must appear exactly
    # once (the groupBy bucket design computes signatures in one pass,
    # not per join side).
    from trafsys_data_transfer_spark.operators.dedup import (
        minhash_candidates,
    )
    from trafsys_data_transfer_spark.sources.fixtures import load_table

    cand = minhash_candidates(load_table(spark, sf_dir, "documents"))
    cand_plan = cand._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # (Formatted plans print each operator twice: tree + numbered details.)
    assert cand_plan.count("ArrowEvalPython") == 1 * 2
    assert "CartesianProduct" not in cand_plan


@pytest.mark.parametrize("name", ["dedup_exact", "traffic_hourly_rollup"])
def test_aggregations_have_map_side_partials(spark, sf_dir, name):
    """Every groupBy must plan partial_ aggregation before the exchange —
    map-side combine is what keeps shuffle volume O(groups) at 100 TB."""
    plan = _formatted_plan(spark, name, sf_dir)
    assert "partial_" in plan, plan


def test_funnel_is_joinless_single_wide_pass(spark, sf_dir):
    """The funnel must be conditional aggregation, not per-stage joins —
    one shuffle on user_id, map-side partials, nothing Python."""
    plan = _formatted_plan(spark, "events_funnel", sf_dir)
    for j in ("Join", "Window", "EvalPython"):
        assert j not in plan, j
    assert "partial_" in plan


def test_curation_pipeline_single_shuffle_before_group(spark, sf_dir):
    """Quality flags + fingerprints are narrow; the only exchanges are the
    fingerprint window and the language groupBy (plus AQE reads)."""
    plan = _formatted_plan(spark, "text_curation_pipeline", sf_dir)
    assert "EvalPython" not in plan
    # One window (dup resolution), one aggregate pair (partial+final).
    assert plan.count("Window") == 1 * 2
    assert "partial_" in plan


def test_shared_window_partitioning_plans_one_exchange(spark, sf_dir):
    """events_running_totals has three window expressions over one
    (partition, order) — they must share a single sort, not plan three."""
    plan = _formatted_plan(spark, "events_running_totals", sf_dir)
    assert plan.count("Window") == 1 * 2


def test_topk_bruteforce_corpus_never_shuffles_before_score(spark, sf_dir):
    """The corpus side must meet the broadcast query set without an
    Exchange before the scoring join (only the final rank shuffles)."""
    plan = _formatted_plan(spark, "sim_topk_bruteforce", sf_dir)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_no_rowwise_python_or_stray_cartesian_anywhere(spark, sf_dir):
    """Fleet-wide plan guard: across EVERY registered query, (a) no
    row-at-a-time Python evaluation (BatchEvalPython) — Python is allowed
    only Arrow-vectorized (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas),
    and (b) no CartesianProduct outside the documented bounded ground-truth
    queries.  Queries whose build() itself executes work (streaming drains,
    index builds) are exercised by their own tests and skipped here."""
    from bench import WORK_IN_BUILD

    CARTESIAN_OK = {
        # documented bounded-scope ground-truth / audit queries
        "dedup_ngram_jaccard",
        "sim_embedding_neardup",
        # single-row corpus-stats broadcast joins (BroadcastNestedLoop on a
        # 1-row side is the intended plan, never a CartesianProduct)
    }
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple"
    )
    offenders = []
    for name, spec in all_queries().items():
        if name in WORK_IN_BUILD:
            continue
        plan = spec.build(spark, sf_dir)._jdf.queryExecution().explainString(mode)
        if "BatchEvalPython" in plan:
            offenders.append((name, "BatchEvalPython"))
        if "CartesianProduct" in plan and name not in CARTESIAN_OK:
            offenders.append((name, "CartesianProduct"))
    assert not offenders, offenders


def test_ewma_constant_series_is_identity_and_warmup_exact(spark, sf_dir):
    """EWMA of a constant series is the constant; the first row (no lags)
    must equal the observation itself -- the truncated-kernel
    renormalization, not a zero-padded kernel."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as _W

    from trafsys_data_transfer_spark.plans.traffic_queries import (
        EWMA_LAGS,
        _EWMA_W,
    )

    # closed-form check of the scaled integer weights
    assert len(_EWMA_W) == EWMA_LAGS + 1
    assert _EWMA_W[0] == 4**EWMA_LAGS
    # weight ratio w_{j+1}/w_j == 3/4 exactly
    assert all(4 * _EWMA_W[j + 1] == 3 * _EWMA_W[j] for j in range(EWMA_LAGS))

    rows = [("A", i, 7) for i in range(20)]
    df = spark.createDataFrame(rows, "site string, t long, x long")
    w = _W.partitionBy("site").orderBy("t")
    num = sum(
        (F.coalesce(F.lag("x", j).over(w), F.lit(0)) * F.lit(wt)
         for j, wt in enumerate(_EWMA_W)),
        start=F.lit(0),
    )
    den = sum(
        (F.when(F.lag("x", j).over(w).isNull(), F.lit(0)).otherwise(F.lit(wt))
         for j, wt in enumerate(_EWMA_W)),
        start=F.lit(0),
    )
    out = (
        df.withColumn("_n", num.cast("long"))
        .withColumn("_d", den.cast("long"))
        .withColumn("ewma_milli", F.expr("(1000L * _n) div _d"))
    )
    got = {r.t: r.ewma_milli for r in out.collect()}
    # renormalized truncated kernel => EXACTLY the constant at every row,
    # including the warm-up rows with fewer than EWMA_LAGS+1 lags
    assert all(v == 7000 for v in got.values())
