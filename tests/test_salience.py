from __future__ import annotations

from pyspark.sql import functions as F

from trafsys_data_transfer_spark.operators.salience import (
    PMI_MIN_COUNT,
    pmi_collocations,
    salient_terms,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_salient_terms_ranks_rare_terms_over_common(spark):
    # "zebra" appears in one doc only (df=1); "the" appears everywhere.
    df = _docs(
        spark,
        [
            (1, "the the zebra"),
            (2, "the the the"),
            (3, "the quick fox"),
        ],
    )
    out = {
        (r["doc_id"], r["rnk"]): (r["term"], r["tf"], r["df"])
        for r in salient_terms(df, top_n=2).collect()
    }
    # doc 1: zebra tf=1 df=1 -> ratio 1.0 beats "the" tf=2 df=3 -> 0.67
    assert out[(1, 1)] == ("zebra", 1, 1)
    assert out[(1, 2)] == ("the", 2, 3)
    # doc 3: quick/fox both tf=1 df=1 -> tie broken alphabetically
    assert out[(3, 1)][0] == "fox" and out[(3, 2)][0] == "quick"


def test_salient_terms_rank_never_exceeds_top_n(spark, sf_dir):
    from trafsys_data_transfer_spark.operators.salience import text_salient_terms

    res = text_salient_terms(spark, sf_dir)
    assert res.filter(F.col("rnk") > 3).count() == 0
    # every document with >= 3 distinct terms contributes exactly 3 rows
    per_doc = res.groupBy("doc_id").count()
    assert per_doc.filter(F.col("count") > 3).count() == 0


def test_pmi_prefers_exclusive_pair_over_frequent_words(spark):
    # "ice cream" always co-occur and appear nowhere else; "a b" pair is
    # frequent but both words are everywhere -> lower c_xy/(c_x*c_y).
    rows = [(i, "ice cream a b a b a b") for i in range(PMI_MIN_COUNT)]
    df = _docs(spark, rows)
    top = pmi_collocations(df, min_count=PMI_MIN_COUNT, top_n=3).collect()
    assert (top[0]["w1"], top[0]["w2"]) == ("ice", "cream")


def test_pmi_min_count_filters_rare_noise(spark):
    rows = [(1, "x y"), (2, "a b a b a b a b a b")]
    df = _docs(spark, rows)
    pairs = {(r["w1"], r["w2"]) for r in pmi_collocations(df, min_count=4).collect()}
    assert ("x", "y") not in pairs  # c_xy=1 < 4
    assert ("a", "b") in pairs


def test_sq8_quantization_bounds_and_recall(spark, sf_dir):
    from trafsys_data_transfer_spark.operators.similarity import (
        sq8_quantize,
        topk_bruteforce,
        topk_sq8,
    )
    from trafsys_data_transfer_spark.sources.fixtures import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(sq8_quantize(F.col("embedding")).alias("q"))
    mx = q.select(
        F.array_max(F.transform("q", lambda x: F.abs(x))).alias("m")
    ).agg(F.max("m")).first()[0]
    assert mx <= 127  # int8 range respected

    queries = emb.filter(F.col("vec_id") < 8)
    exact = topk_bruteforce(emb, queries, k=5)
    quant = topk_sq8(emb, queries, k=5)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    s = {(r["query_id"], r["neighbor_id"]) for r in quant.collect()}
    # SQ8 ranks by inner product (not cosine), so sets differ — but on the
    # fixture corpus the top-5 overlap should be substantial.
    assert len(e & s) / len(e) >= 0.5


def test_sq8_zero_vector_quantizes_to_zero(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0])], "vec_id bigint, embedding array<float>"
    )
    from trafsys_data_transfer_spark.operators.similarity import sq8_quantize

    row = df.select(sq8_quantize(F.col("embedding")).alias("q")).first()
    assert row["q"] == [0, 0, 0]


def test_pmi_ranking_invariant_under_corpus_duplication(spark):
    # doubling every document doubles all counts; the rational ranking
    # c_xy/(c_x*c_y) halves uniformly, so the top-k ORDER must not change
    rows = [(i, "ice cream a b c d ice cream x y") for i in range(5)]
    df1 = _docs(spark, rows)
    df2 = _docs(spark, rows + [(i + 100, t) for i, t in rows])
    top1 = [(r["w1"], r["w2"]) for r in pmi_collocations(df1, min_count=2).collect()]
    top2 = [(r["w1"], r["w2"]) for r in pmi_collocations(df2, min_count=2).collect()]
    assert top1 == top2


def test_rake_scores_planted_phrases(spark):
    """Hand-computed RAKE on one constructed doc:
    'deep learning of red widget in deep learning' →
    phrases: [deep learning], [red widget], [deep learning].
    freq: deep 2, learning 2, red 1, widget 1; deg: deep 4, learning 4,
    red 2, widget 2.  word scores (ppm): deep 2e6, learning 2e6, red 2e6,
    widget 2e6 → both phrases score 4e6; tie broken lexicographically."""
    from pyspark.sql import Row

    from trafsys_data_transfer_spark.operators import salience

    df = spark.createDataFrame(
        [Row(doc_id=1, text="deep learning of red widget in deep learning",
             lang="en", source="s", n_chars=0)]
    )
    orig = salience.load_table
    try:
        salience.load_table = lambda _s, _d, name: df
        out = salience.text_keyphrases_rake(spark, "unused").collect()
    finally:
        salience.load_table = orig
    assert [(r["rnk"], r["phrase"], r["score_ppm"]) for r in out] == [
        (1, "deep learning", 4_000_000),
        (2, "red widget", 4_000_000),
    ]
