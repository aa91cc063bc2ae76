"""Bloom-filter semi-join pruning: no false negatives, real pruning,
codegen-only plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from trafsys_data_transfer_spark.operators.runtimefilter import (
    bloom_build,
    bloom_prefilter,
    bloom_prefilter_join,
)
from trafsys_data_transfer_spark.sources.fixtures import load_table


def test_bloom_has_no_false_negatives_and_bounded_false_positives(spark):
    """Every dim key must pass its own filter (Bloom's defining
    guarantee); non-member pass rate stays near the 1/BITS_PER_KEY
    design fpp."""
    dim = spark.range(0, 1000).select((F.col("id") * 7 + 3).alias("k"))
    words, m = bloom_build(dim, "k")
    # members: all 1000 survive
    members = bloom_prefilter(dim.withColumnRenamed("k", "fk"), "fk", words, m)
    assert members.count() == 1000
    # non-members: disjoint key range, fpp ~1.5% at 64 bits/key
    probe = spark.range(0, 20_000).select((F.col("id") + 1_000_000).alias("fk"))
    fp = bloom_prefilter(probe, "fk", words, m).count()
    assert fp / 20_000 < 0.05, fp


def test_bloom_prefilter_join_equals_plain_join_and_prunes(spark, sf_dir):
    """The pre-filtered star join returns exactly the plain join's rows,
    and the fact scan shrank by roughly the dim's selectivity BEFORE the
    join."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    dim = (
        supplier.join(
            nation.filter(F.col("n_name") == "NATION_7"),
            supplier["s_nationkey"] == nation["n_nationkey"],
        ).select("s_suppkey")
    )
    words, m = bloom_build(dim, "s_suppkey")
    pruned = bloom_prefilter(
        lineitem.select("l_suppkey"), "l_suppkey", words, m
    )
    total = lineitem.count()
    kept = pruned.count()
    true_matches = lineitem.join(
        dim, lineitem["l_suppkey"] == dim["s_suppkey"]
    ).count()
    # no false negatives: every true match survives the pre-filter
    assert kept >= true_matches
    # real pruning: kept is close to the true match count, far below total
    # (1/25 nations; allow fpp slack)
    assert kept < total * 0.2, (kept, total)
    assert kept <= true_matches + int(total * 0.05) + 64

    # end-to-end equality with the plain three-way join
    got = bloom_prefilter_join(spark, sf_dir)
    plain = (
        lineitem.join(
            supplier, lineitem["l_suppkey"] == supplier["s_suppkey"]
        )
        .join(
            nation.filter(F.col("n_name") == "NATION_7"),
            supplier["s_nationkey"] == nation["n_nationkey"],
        )
        .groupBy("s_suppkey", "s_name")
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("long")
            ).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("s_suppkey")
    )
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in plain.collect()
    ]


def test_bloom_path_is_codegen_only(spark, sf_dir):
    """Build + probe never leave the JVM: no Python eval in the plan,
    and the probe-side word join is a broadcast."""
    df = bloom_prefilter_join(spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
