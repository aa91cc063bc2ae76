"""Corpus-statistics salience: distinctive terms and collocations (§2.10).

Two classic corpus-analysis operators a training-data pipeline runs for
tokenizer design, domain characterisation and boilerplate discovery:

* **Per-document salient terms** — rank a document's terms by how
  over-represented they are in the document relative to the corpus:
  ``tf_doc / df_corpus`` (term frequency over document frequency, i.e.
  TF-IDF with a linear instead of log inverse-document-frequency).
* **Collocations (PMI ranking)** — corpus-level adjacent-bigram pairs
  ranked by pointwise mutual information.  Because the corpus totals are
  constant across bigrams, ranking by ``PMI = log(p(xy)/(p(x)p(y)))`` is
  exactly ranking by the rational ``c_xy / (c_x * c_y)`` — no logarithm
  needs to be computed at all.

Oracle determinism is the design driver here: both rankings are ordered
by a SINGLE IEEE division of exact integers (counts), which every engine
rounds identically, with a lexicographic tie-break — so the row sets are
bit-identical across Spark and DuckDB without emitting any float column.
Chained float expressions (``tf * ln(N/df)``) would rank identically in
theory but can flip near-ties on last-ulp ``ln`` differences between
libm implementations; the rational form removes the hazard.

Scale (100 TB):

* Salient terms: one explode feeding a ``(doc_id, term)`` partial-agg
  shuffle; document frequency is derived FROM the tf aggregate (a second
  O(vocab) shuffle), never a second corpus pass; the join back is a
  vocab-sized equi-join Spark broadcasts when it fits and shuffles when
  it does not.  The final window shuffles on ``doc_id`` — the same key
  space as tf, no skew beyond document length.
* Collocations: bigram and unigram counts are map-side-combined before
  their shuffles (wire cost O(|vocab|²-observed) and O(|vocab|)); the
  top-20 is a TakeOrdered over the filtered aggregate, no global sort.
  ``c_x * c_y`` stays exact in int64 up to ~3e9 occurrences per term;
  beyond that, pre-scale the counts (rank is scale-invariant).

Reference basis: the reference engine (``/root/reference/script.js``)
has no text operators; these extend the mandated north-star surface
(SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..sources.fixtures import load_table

#: Salient terms kept per document.
SALIENT_TOP_N = 3

#: Minimum bigram occurrences for a collocation candidate (noise floor).
PMI_MIN_COUNT = 5

#: Collocations reported.
PMI_TOP_N = 20


def salient_terms(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", top_n: int = SALIENT_TOP_N
) -> DataFrame:
    """Top-``top_n`` most document-distinctive terms per document.

    Rank key ``tf/df`` is one division of two exact counts — engine-stable
    — with ``term ASC`` tie-break.  ``df`` is aggregated from the tf table
    (one row per (doc, term) == document frequency), not a second scan.
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # df via a window over the tf table (one row per (doc, term) ⇒ the
    # partition count IS document frequency).  A groupBy+join formulation
    # re-evaluates the whole tf lineage on both join sides (4 scans, no
    # exchange reuse, measured ~4× slower cold); the window reuses the
    # single tf aggregate and just re-partitions it by term.
    tfd = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc(F.col("tf").cast("double") / F.col("df")), F.asc("term")
    )
    return (
        tfd.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= top_n)
        .select("doc_id", "term", "tf", "df", "rnk")
    )


@register(
    "text_salient_terms",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
    dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    r AS (
        SELECT doc_id, term, tf, df,
               row_number() OVER (PARTITION BY doc_id
                   ORDER BY CAST(tf AS DOUBLE) / df DESC, term ASC) AS rnk
        FROM tf JOIN dfq USING (term)
    )
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= {SALIENT_TOP_N}
    ORDER BY doc_id, rnk
    """,
)
def text_salient_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 distinctive terms by the tf/df salience ratio."""
    docs = load_table(spark, sf_dir, "documents")
    return salient_terms(docs).orderBy("doc_id", "rnk")


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = PMI_MIN_COUNT,
    top_n: int = PMI_TOP_N,
) -> DataFrame:
    """Top adjacent-bigram collocations ranked by PMI via the rational
    ``c_xy / (c_x * c_y)`` (corpus totals cancel under ranking)."""
    toks = F.split(F.col(text_col), " ")
    w = docs.select(toks.alias("w")).filter(F.size("w") >= 2)
    idx = F.sequence(F.lit(1), F.size("w") - 1)
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(F.col("w"), i).alias("w1"),
            F.element_at(F.col("w"), i + 1).alias("w2"),
        ),
    )
    big = (
        w.select(F.explode(pairs).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= min_count)
    )
    uni = (
        w.select(F.explode("w").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    u1 = uni.select(F.col("term").alias("w1"), F.col("c").alias("c_x"))
    u2 = uni.select(F.col("term").alias("w2"), F.col("c").alias("c_y"))
    return (
        big.join(u1, "w1")
        .join(u2, "w2")
        .select("w1", "w2", "c_xy", "c_x", "c_y")
        .orderBy(
            F.desc(F.col("c_xy").cast("double") / (F.col("c_x") * F.col("c_y"))),
            F.asc("w1"),
            F.asc("w2"),
        )
        .limit(top_n)
    )


@register(
    "text_pmi_collocations",
    oracle=f"""
    WITH toks AS (
        SELECT string_split(text, ' ') AS w FROM documents
        WHERE len(string_split(text, ' ')) >= 2
    ),
    big AS (
        SELECT w[i] AS w1, w[i+1] AS w2, COUNT(*) AS c_xy
        FROM toks, unnest(generate_series(1, len(w) - 1)) AS t(i)
        GROUP BY w1, w2
        HAVING COUNT(*) >= {PMI_MIN_COUNT}
    ),
    uni AS (
        SELECT t.term, COUNT(*) AS c
        FROM (SELECT unnest(w) AS term FROM toks) t
        GROUP BY t.term
    )
    SELECT w1, w2, CAST(c_xy AS BIGINT) AS c_xy,
           CAST(u1.c AS BIGINT) AS c_x, CAST(u2.c AS BIGINT) AS c_y
    FROM big JOIN uni u1 ON big.w1 = u1.term JOIN uni u2 ON big.w2 = u2.term
    ORDER BY CAST(c_xy AS DOUBLE) / (u1.c * u2.c) DESC, w1 ASC, w2 ASC
    LIMIT {PMI_TOP_N}
    """,
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus top-20 collocations: adjacent bigrams ranked by PMI, emitted
    as exact counts (the log never needs computing — ranking by
    c_xy/(c_x·c_y) is PMI ranking with the constant totals cancelled)."""
    docs = load_table(spark, sf_dir, "documents")
    return pmi_collocations(docs)


# ---------------------------------------------------------------------------
# RAKE keyword extraction (phrase-level salience)
# ---------------------------------------------------------------------------

#: Candidate phrases longer than this many words are discarded (standard
#: RAKE practice; also bounds the score of stopword-free run-on text).
RAKE_MAX_PHRASE = 4
RAKE_TOP_N = 3

#: Phrase-boundary words (reuse the text module's stopword list so every
#: text operator agrees on what a function word is).
from .text import STOPWORDS as _RAKE_STOPS  # noqa: E402


def _rake_stop_in() -> str:
    return ", ".join(f"'{w}'" for w in _RAKE_STOPS)


@register(
    "text_keyphrases_rake",
    oracle=f"""
    WITH split AS (
        SELECT doc_id, string_split(text, ' ') AS parts FROM documents
    ),
    toks AS (
        SELECT doc_id, CAST(t.i AS BIGINT) AS pos, parts[t.i] AS tok,
               parts[t.i] IN ({_rake_stop_in()}) AS is_stop
        FROM split, unnest(generate_series(1, len(parts))) AS t(i)
    ),
    marked AS (
        -- island id BEFORE dropping stopword rows: a WHERE on the same
        -- SELECT would make the window see only non-stop rows (grp = 0
        -- everywhere, one giant phrase per doc)
        SELECT doc_id, pos, tok, is_stop,
               SUM(CASE WHEN is_stop THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM toks
    ),
    grouped AS (
        SELECT doc_id, pos, tok, grp FROM marked WHERE NOT is_stop
    ),
    phrases AS (
        SELECT doc_id, grp,
               STRING_AGG(tok, ' ' ORDER BY pos) AS phrase,
               COUNT(*) AS plen
        FROM grouped GROUP BY doc_id, grp
        HAVING COUNT(*) <= {RAKE_MAX_PHRASE}
    ),
    members AS (
        SELECT p.doc_id, p.grp, p.phrase, p.plen, g.tok
        FROM phrases p JOIN grouped g
          ON g.doc_id = p.doc_id AND g.grp = p.grp
    ),
    word_stats AS (
        SELECT tok, COUNT(*) AS freq, SUM(plen) AS deg
        FROM members GROUP BY tok
    ),
    phrase_scores AS (
        SELECT m.doc_id, m.phrase,
               SUM(w.deg * 1000000 // w.freq) AS score_ppm
        FROM members m JOIN word_stats w USING (tok)
        GROUP BY m.doc_id, m.grp, m.phrase
    ),
    dedup AS (
        SELECT doc_id, phrase, MAX(score_ppm) AS score_ppm
        FROM phrase_scores GROUP BY doc_id, phrase
    ),
    ranked AS (
        SELECT doc_id, phrase, CAST(score_ppm AS BIGINT) AS score_ppm,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score_ppm DESC, phrase) AS rnk
        FROM dedup
    )
    SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, phrase, score_ppm
    FROM ranked WHERE rnk <= {RAKE_TOP_N}
    ORDER BY doc_id, rnk
    """,
)
def text_keyphrases_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction: candidate phrases are maximal stopword-free
    token runs (gaps-and-islands on a per-doc window) capped at
    RAKE_MAX_PHRASE words; corpus-level word scores ``deg/freq`` (deg =
    sum of lengths of phrases containing the word, freq = occurrences)
    in exact integer ppm; a phrase scores the sum of its words' scores —
    top-3 distinct phrases per document.

    Scale: the island window is per-doc (bounded by doc length); word
    stats are one O(phrase-vocab) shuffle; scores join back on the word
    key; ranking is a per-doc WindowGroupLimit.  All integer arithmetic —
    floor-divide per word THEN sum, so the oracle agrees bit-for-bit.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "tok"),
    ).withColumn("is_stop", F.col("tok").isin(*_RAKE_STOPS))
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    grouped = (
        toks.withColumn(
            "grp", F.sum(F.col("is_stop").cast("int")).over(w_doc)
        )
        .filter(~F.col("is_stop"))
        .select("doc_id", "pos", "tok", "grp")
    )
    phrases = (
        grouped.groupBy("doc_id", "grp")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
            ).alias("phrase"),
            F.count(F.lit(1)).alias("plen"),
        )
        .filter(F.col("plen") <= RAKE_MAX_PHRASE)
    )
    members = phrases.join(grouped, ["doc_id", "grp"]).select(
        "doc_id", "grp", "phrase", "plen", "tok"
    )
    word_stats = members.groupBy("tok").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("deg")
    )
    phrase_scores = (
        members.join(word_stats, "tok")
        .groupBy("doc_id", "grp", "phrase")
        .agg(F.sum(F.expr("deg * 1000000 div freq")).alias("score_ppm"))
    )
    dedup = phrase_scores.groupBy("doc_id", "phrase").agg(
        F.max("score_ppm").alias("score_ppm")
    )
    rnk_w = Window.partitionBy("doc_id").orderBy(
        F.col("score_ppm").desc(), "phrase"
    )
    return (
        dedup.withColumn("rnk", F.row_number().over(rnk_w).cast("bigint"))
        .filter(F.col("rnk") <= RAKE_TOP_N)
        .select("doc_id", "rnk", "phrase", "score_ppm")
        .orderBy("doc_id", "rnk")
    )
