"""BM25 retrieval: ranking sanity, determinism, and plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from trafsys_data_transfer_spark.operators.retrieval import (
    BM25_QUERY,
    BM25_TOPK,
    bm25_topk,
)
from trafsys_data_transfer_spark.sources.fixtures import load_table


def _toy_docs(spark):
    rows = [
        (1, "spark merge spark scan the and of data"),   # 3 term occs, 3 distinct
        (2, "spark the and of data table row order x"),  # 1 term occ
        (3, "the and of data table row order x y"),      # 0 term occs
        (4, "spark spark spark spark spark and of x"),   # heavy tf, 1 distinct
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_ranks_matching_docs_and_drops_nonmatching(spark):
    out = bm25_topk(_toy_docs(spark), k=10).collect()
    ids = [r.doc_id for r in out]
    # Doc 3 has no query term: absent. All scores positive.
    assert 3 not in ids and set(ids) == {1, 2, 4}
    assert all(r.bm25 > 0 for r in out)
    scores = {r.doc_id: r.bm25 for r in out}
    # Multi-distinct-term doc 1 beats single-occurrence doc 2 (idf sums).
    assert scores[1] > scores[2]
    # BM25 tf saturation: 5 occurrences of one term can't reach the
    # 3-distinct-term score (k1 bounds the tf component at k1+1).
    assert scores[1] > scores[4] > scores[2]


def test_bm25_topk_cap_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = bm25_topk(docs).collect()
    b = bm25_topk(docs).collect()
    assert len(a) <= BM25_TOPK
    assert [(r.doc_id, r.bm25) for r in a] == [(r.doc_id, r.bm25) for r in b]
    # Sorted by score desc, doc_id asc.
    keys = [(-r.bm25, r.doc_id) for r in a]
    assert keys == sorted(keys)


def test_bm25_plan_broadcasts_small_sides(spark, sf_dir):
    """The corpus-side hit rows must join df/corpus stats via broadcast —
    no shuffle of the big side for the tiny aggregates."""
    df = bm25_topk(load_table(spark, sf_dir, "documents"))
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    # Hot path stays JVM-side.
    assert "EvalPython" not in plan


def test_bm25_query_terms_exist_in_fixture(spark, sf_dir):
    """Guard against fixture-vocabulary drift: every query term must hit."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.explode(F.split("text", " ")).alias("term")
    present = {
        r.term
        for r in docs.select(toks)
        .filter(F.col("term").isin(*BM25_QUERY))
        .distinct()
        .collect()
    }
    assert present == set(BM25_QUERY)


def test_bm25_index_probe_identical_to_inline_and_scan_is_pruned(
    spark, sf_dir, tmp_path
):
    """Stored-postings probe == inline explode bit-for-bit, and the probe
    scan reads the postings with the term predicate PUSHED (no corpus
    text column anywhere in the plan)."""
    from trafsys_data_transfer_spark.operators.retrieval import (
        bm25_index_probe,
        bm25_index_write,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "bm25idx")
    bm25_index_write(docs, path)
    probe = bm25_index_probe(spark, path)
    inline = bm25_topk(docs)
    assert [tuple(r) for r in probe.collect()] == [
        tuple(r) for r in inline.collect()
    ]
    plan = probe._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PushedFilters" in plan and "In(term, " in plan
    # the probe reads ONLY postings columns — never the corpus text
    import re

    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas and all("text" not in s for s in schemas)


def test_bm25_index_append_empty_delta_is_noop(spark, tmp_path):
    """ADVICE r06: an empty delta must leave the index and its sidecar
    stats byte-identical (F.sum over zero rows is NULL — unguarded, the
    stats update raised TypeError)."""
    import json
    import os

    from trafsys_data_transfer_spark.operators.retrieval import (
        bm25_index_append,
        bm25_index_probe,
        bm25_index_write,
    )

    path = str(tmp_path / "idx")
    docs = _toy_docs(spark)
    bm25_index_write(docs, path)
    with open(os.path.join(path, "_stats.json")) as f:
        stats_before = json.load(f)
    files_before = sorted(os.listdir(path))
    empty = docs.filter(F.lit(False))
    bm25_index_append(empty, path)
    with open(os.path.join(path, "_stats.json")) as f:
        assert json.load(f) == stats_before
    # no stray delta files beyond the parquet writer's empty commit
    assert sorted(
        f for f in os.listdir(path) if f.endswith(".json")
    ) == sorted(f for f in files_before if f.endswith(".json"))
    bm25_index_probe(spark, path).count()  # still probes clean


def test_bm25_compaction_of_appended_index_equals_rebuild(
    spark, sf_dir, tmp_path
):
    """VERDICT r06 task 2: compact(append(index)) == rebuild(corpus)
    posting-for-posting, the file count shrinks back to the base run
    count, and the probe plan keeps the pushed term filter with a
    text-free ReadSchema."""
    import os
    import re

    from trafsys_data_transfer_spark.operators.dedup import (
        INCREMENTAL_BATCH_SOURCES,
    )
    from trafsys_data_transfer_spark.operators.retrieval import (
        bm25_index_append,
        bm25_index_compact,
        bm25_index_probe,
        bm25_index_write,
    )

    docs = load_table(spark, sf_dir, "documents")
    is_batch = F.col("source").isin(*INCREMENTAL_BATCH_SOURCES)

    def parquet_files(d):
        return [
            f
            for f in os.listdir(d)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]

    rebuilt = str(tmp_path / "rebuilt")
    bm25_index_write(docs, rebuilt)
    lsm = str(tmp_path / "lsm")
    bm25_index_write(docs.filter(~is_batch), lsm)
    n_base = len(parquet_files(lsm))
    bm25_index_append(docs.filter(is_batch), lsm)
    n_appended = len(parquet_files(lsm))
    assert n_appended > n_base  # the delta really added files
    before, after = bm25_index_compact(spark, lsm)
    assert (before, after) == (n_appended, len(parquet_files(lsm)))
    assert after < n_appended  # merged back into base-order run count
    # posting-level equality with the from-scratch rebuild
    cols = ["term", "doc_id", "tf", "dl"]
    assert (
        spark.read.parquet(lsm).select(*cols).exceptAll(
            spark.read.parquet(rebuilt).select(*cols)
        ).isEmpty()
        and spark.read.parquet(rebuilt).select(*cols).exceptAll(
            spark.read.parquet(lsm).select(*cols)
        ).isEmpty()
    )
    # sidecar stats identical
    import json

    with open(os.path.join(lsm, "_stats.json")) as f1, open(
        os.path.join(rebuilt, "_stats.json")
    ) as f2:
        assert json.load(f1) == json.load(f2)
    # probe equality + plan shape survives compaction
    probe = bm25_index_probe(spark, lsm)
    assert [tuple(r) for r in probe.collect()] == [
        tuple(r) for r in bm25_index_probe(spark, rebuilt).collect()
    ]
    plan = probe._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PushedFilters" in plan and "In(term, " in plan
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas and all("text" not in s for s in schemas)


def test_phrase_search_counts_overlaps_and_adjacency(spark):
    """Positional intersection counts every start offset — including
    adjacent repeats — and misses nothing a brute scan finds."""
    import os
    import tempfile
    import uuid

    from trafsys_data_transfer_spark.operators.retrieval import phrase_search

    docs = [
        (1, "alpha beta gamma x alpha beta gamma"),      # 2 separated hits
        (2, "alpha beta gamma alpha beta gamma tail"),   # 2 ADJACENT hits
        (3, "alpha beta x gamma"),                       # near miss
        (4, "beta gamma alpha"),                         # rotation, no hit
        (5, "pre alpha  beta\tgamma post"),              # whitespace noise
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    d = os.path.join(tempfile.gettempdir(), f"ph_{uuid.uuid4().hex[:8]}")
    df.write.parquet(os.path.join(d, "x.parquet"))
    out = phrase_search(df, phrases=("alpha beta gamma",))
    got = {(r.doc_id, r.n_hits) for r in out.collect()}
    assert got == {(1, 2), (2, 2), (5, 1)}


def test_rrf_fusion_semantics(spark, sf_dir):
    """RRF arithmetic and membership: every fused doc appears in at least
    one leg, both-leg docs outscore equal-rank single-leg docs, and the
    integer fusion matches a Python recount from the legs."""
    from trafsys_data_transfer_spark.operators.retrieval import (
        RRF_LEG_K,
        retrieval_hybrid_rrf,
    )

    out = retrieval_hybrid_rrf(spark, sf_dir).collect()
    assert 0 < len(out) <= 20
    for r in out:
        assert r.lex_rank is not None or r.dense_rank is not None
        want = 0
        if r.lex_rank is not None:
            assert 1 <= r.lex_rank <= RRF_LEG_K
            want += 1_000_000 // (60 + r.lex_rank)
        if r.dense_rank is not None:
            assert 1 <= r.dense_rank <= RRF_LEG_K
            want += 1_000_000 // (60 + r.dense_rank)
        assert r.rrf_ppm == want
    # ordering is by fused score desc then doc_id
    scores = [(r.rrf_ppm, -r.doc_id) for r in out]
    assert scores == sorted(scores, reverse=True)


def test_trigram_search_exact_vs_like_and_false_positive_pruned(spark):
    """The gram candidate set can contain split-gram false positives;
    the verify must remove them so the result equals the LIKE scan."""
    import tempfile as _tf

    from trafsys_data_transfer_spark.registry import all_queries

    rows = [
        (1, "red widget"),        # true match for 'widge'
        (2, "wide gadget"),       # has 'wid' and 'dge' but not 'idg'
        (3, "acid gewidth"),      # false positive bait: wid+idg+dge split?
        (4, "w idge t"),          # 'idg'+'dge' but no 'wid'... actually ' id'
        (5, "plain bolt"),
        (6, "widgeon duck"),      # true match ('widge' inside 'widgeon')
    ]
    d = _tf.mkdtemp(prefix="t_trgm_")
    spark.createDataFrame(rows, "p_partkey long, p_name string").withColumn(
        "p_brand", __import__("pyspark.sql.functions", fromlist=["lit"]).lit("B")
    ).write.mode("overwrite").parquet(f"{d}/part.parquet")
    got = [
        (r.p_partkey, r.p_name)
        for r in all_queries()["part_trigram_search"].build(spark, d).collect()
    ]
    want = sorted((k, n) for k, n in rows if "widge" in n)
    assert got == want
