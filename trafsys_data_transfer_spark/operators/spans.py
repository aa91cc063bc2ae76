"""Substring-level (segment) duplication mass (north star §2.10).

Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better") showed that document-level dedup misses the dominant duplication
mode: repeated SPANS inside otherwise-distinct documents.  Their exact
substring dedup finds 50-token spans occurring more than once in the
corpus.  This operator quantifies that signal per document: chunk every
document into fixed SEGMENT_WORDS-word segments, count each segment's
corpus-wide occurrences, and report how much of each document is
duplicated text — the decision input for span-level dedup policies.

Relation to the existing dedup tiers: whole-doc fingerprints
(``dedup_exact``), shingle signatures (``dedup_minhash_lsh``) and
winnowing (``text_winnow_candidates``) find *document pairs*; this
operator measures *duplicated mass* — "17% of this doc exists elsewhere"
— which no pair-finder reports.

Scale design (100 TB):

* Segments are digested to md5 IMMEDIATELY after chunking — only
  ``(doc_id, digest)`` rows ever shuffle; segment text never leaves the
  scan stage (the snapshot-diff discipline).
* Two shuffles total, both on pre-reduced rows: per-(doc, digest) term
  frequencies (map-side combined), then the corpus count join on the
  digest key.  Corpus counts derive from the tf relation — no rescan.
* Fixed-width word chunking is deterministic and stateless, so the
  operator re-runs incrementally per partition with no cross-file state
  (unlike suffix-array approaches, which need a global order).

The reference engine (/root/reference/script.js) has no text operators;
this extends the mandated LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.fixtures import load_table

#: Segment width in whitespace tokens.  Lee et al. use 50 BPE tokens; 16
#: words keeps several segments per fixture document at every sf.
SEGMENT_WORDS = 16


def dup_segment_mass(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document duplicated-segment accounting.

    Returns (doc_id, n_segments, n_dup_segments, dup_frac_micro): a segment
    occurrence is "duplicated" when its exact text occurs ≥2 times across
    the corpus (including elsewhere in the same document).  Every output is
    an exact integer — ``dup_frac_micro`` is the duplicated fraction in
    parts-per-million via integer division, sidestepping the cross-engine
    ROUND half-tie that a float fraction hits (see lm.py's docstring).
    """
    toks = F.split(F.col(text_col), " ")
    n_seg = F.floor(F.size(toks) / F.lit(SEGMENT_WORDS)).cast("int")
    # Chunk → digest inside one codegen stage: the exploded rows carry a
    # 32-char digest, never the segment text.
    segs = F.transform(
        F.sequence(F.lit(0), n_seg - F.lit(1)),
        lambda i: F.md5(
            F.concat_ws(
                " ", F.slice(toks, i * F.lit(SEGMENT_WORDS) + F.lit(1), F.lit(SEGMENT_WORDS))
            )
        ),
    )
    base = (
        docs.filter(n_seg >= 1)
        .select(
            "doc_id",
            n_seg.cast("long").alias("n_segments"),
            F.explode(segs).alias("digest"),
        )
    )
    tf = base.groupBy("doc_id", "n_segments", "digest").agg(
        F.count(F.lit(1)).alias("tf")
    )
    corpus = tf.groupBy("digest").agg(F.sum("tf").alias("n_corpus"))
    out = (
        tf.join(corpus, "digest")
        .groupBy("doc_id", "n_segments")
        .agg(
            F.sum(F.when(F.col("n_corpus") >= 2, F.col("tf")).otherwise(F.lit(0)))
            .alias("n_dup_segments")
        )
    )
    return out.select(
        "doc_id",
        "n_segments",
        "n_dup_segments",
        F.expr("(n_dup_segments * 1000000) div n_segments").alias("dup_frac_micro"),
    ).orderBy("doc_id")


_DUP_SEG_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
segs AS (
    SELECT doc_id, CAST(len(t) // {SEGMENT_WORDS} AS BIGINT) AS n_segments,
           unnest(list_transform(
               generate_series(0, CAST(len(t) // {SEGMENT_WORDS} AS INT) - 1),
               i -> md5(array_to_string(
                   t[i * {SEGMENT_WORDS} + 1 : i * {SEGMENT_WORDS} + {SEGMENT_WORDS}],
                   ' ')))) AS digest
    FROM toks WHERE len(t) >= {SEGMENT_WORDS}
),
tf AS (
    SELECT doc_id, n_segments, digest, COUNT(*) AS tf
    FROM segs GROUP BY doc_id, n_segments, digest
),
corpus AS (
    SELECT digest, CAST(SUM(tf) AS BIGINT) AS n_corpus FROM tf GROUP BY digest
)
SELECT doc_id, n_segments,
       CAST(SUM(CASE WHEN n_corpus >= 2 THEN tf ELSE 0 END) AS BIGINT)
           AS n_dup_segments,
       CAST(CAST(SUM(CASE WHEN n_corpus >= 2 THEN tf ELSE 0 END) AS BIGINT)
            * 1000000 // n_segments AS BIGINT) AS dup_frac_micro
FROM tf JOIN corpus USING (digest)
GROUP BY doc_id, n_segments
ORDER BY doc_id
"""


@register("text_dup_segments", oracle=_DUP_SEG_ORACLE)
def text_dup_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated 16-word-segment mass per document (Lee et al. signal)."""
    return dup_segment_mass(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# segment-level dedup REMOVAL (RefinedWeb-style line dedup)
# ---------------------------------------------------------------------------


def segment_dedup_clean(
    docs: DataFrame, text_col: str = "text", min_count: int = 2
) -> DataFrame:
    """Remove every occurrence of a corpus-duplicated segment and emit the
    cleaned document's fingerprint.

    ``text_dup_segments`` *measures* duplicated mass; this operator
    *applies* the policy — RefinedWeb (Penedo et al. 2023) drops ALL
    occurrences of any line repeated across the corpus, and this is that
    rule over fixed ``SEGMENT_WORDS``-word segments (the fixture corpus
    has no newlines, so fixed-width chunks stand in for lines, matching
    the ``text_dup_segments`` segmentation exactly).

    Returns (doc_id, n_segments, n_removed, clean_n_words, clean_md5),
    one row per document (including sub-segment-width docs, which pass
    through untouched).  The cleaned text itself is reduced to its md5 so
    only fixed-width rows leave the rebuild stage.

    Scale design (100 TB):

    * Duplicate DISCOVERY shuffles digests only — ``(doc_id, idx,
      digest)`` rows, never segment text (the ``text_dup_segments``
      discipline).
    * The removal set is sparse: only (doc_id, idx) int pairs for
      actually-duplicated occurrences shuffle back, grouped into one
      sorted index array per affected doc.
    * Document text moves through exactly ONE doc_id-keyed join (cleaning
      needs the original row no matter what); bucketing both sides by
      doc_id makes it co-located at scale.  The rebuild is a pure
      expression (index-filtered token array), zero Python.
    """
    toks = F.split(F.col(text_col), " ")
    n_seg = F.floor(F.size(toks) / F.lit(SEGMENT_WORDS)).cast("int")
    segs_arr = F.transform(
        F.sequence(F.lit(0), n_seg - F.lit(1)),
        lambda i: F.md5(
            F.concat_ws(
                " ",
                F.slice(
                    toks,
                    i * F.lit(SEGMENT_WORDS) + F.lit(1),
                    F.lit(SEGMENT_WORDS),
                ),
            )
        ),
    )
    segs = docs.filter(n_seg >= 1).select(
        "doc_id", F.posexplode(segs_arr).alias("idx", "digest")
    )
    dup = (
        segs.groupBy("digest")
        .agg(F.count(F.lit(1)).alias("n_corpus"))
        .filter(F.col("n_corpus") >= F.lit(min_count))
        .select("digest")
    )
    removed = (
        segs.join(dup, "digest")
        .groupBy("doc_id")
        .agg(
            F.sort_array(F.collect_list("idx")).alias("removed_idx"),
            F.count(F.lit(1)).alias("n_removed"),
        )
    )
    ridx = F.coalesce(F.col("removed_idx"), F.array().cast("array<int>"))
    clean = F.filter(
        toks,
        lambda _, i: ~F.array_contains(
            ridx, F.floor(i / F.lit(SEGMENT_WORDS)).cast("int")
        ),
    )
    return (
        docs.join(removed, "doc_id", "left")
        .select(
            "doc_id",
            n_seg.cast("long").alias("n_segments"),
            F.coalesce(F.col("n_removed"), F.lit(0)).alias("n_removed"),
            F.size(clean).cast("long").alias("clean_n_words"),
            F.md5(F.concat_ws(" ", clean)).alias("clean_md5"),
        )
        .orderBy("doc_id")
    )


_SEG_CLEAN_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
segs AS (
    SELECT doc_id, CAST(i AS INT) AS idx,
           md5(array_to_string(
               t[i * {SEGMENT_WORDS} + 1 : i * {SEGMENT_WORDS} + {SEGMENT_WORDS}],
               ' ')) AS digest
    FROM toks,
         unnest(generate_series(0, CAST(len(t) // {SEGMENT_WORDS} AS INT) - 1))
             AS u(i)
    WHERE len(t) >= {SEGMENT_WORDS}
),
dup AS (
    SELECT digest FROM segs GROUP BY digest HAVING COUNT(*) >= 2
),
removed AS (
    SELECT doc_id, list_sort(list(idx)) AS ridx,
           CAST(COUNT(*) AS BIGINT) AS n_removed
    FROM segs JOIN dup USING (digest) GROUP BY doc_id
),
rebuilt AS (
    SELECT d.doc_id,
           CAST(len(t) // {SEGMENT_WORDS} AS BIGINT) AS n_segments,
           COALESCE(r.n_removed, 0) AS n_removed,
           list_where(t, list_transform(
               generate_series(1, len(t)),
               p -> NOT list_contains(COALESCE(r.ridx, []),
                                      CAST((p - 1) // {SEGMENT_WORDS} AS INT))
           )) AS clean
    FROM toks d LEFT JOIN removed r USING (doc_id)
)
SELECT doc_id, n_segments, n_removed,
       CAST(len(clean) AS BIGINT) AS clean_n_words,
       -- array_to_string([]) is NULL in DuckDB but '' via Spark's
       -- concat_ws: coalesce so a fully-deduplicated doc hashes alike.
       md5(COALESCE(array_to_string(clean, ' '), '')) AS clean_md5
FROM rebuilt
ORDER BY doc_id
"""


@register("text_segment_dedup_clean", oracle=_SEG_CLEAN_ORACLE)
def text_segment_dedup_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb-style removal of corpus-duplicated 16-word segments."""
    return segment_dedup_clean(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# per-source boilerplate detection (C4-style template stripping)
# ---------------------------------------------------------------------------

#: A segment is boilerplate within a source when it appears in >= 30% of
#: the source's documents and in at least this many distinct documents.
BOILER_MIN_DOCS = 3
BOILER_PCT_X10 = 3  # numerator of 3/10 (30%), kept integral for the oracle


def plant_boilerplate(docs: DataFrame) -> DataFrame:
    """Prepend a deterministic 16-word source header to 60% of documents.

    The synthetic fixture corpus has no real site templates, so — like
    ``pii._plant_dirty_text`` — the op plants its own signal: documents
    with ``doc_id % 10 < 6`` get a header of 16 copies of
    ``boiler_<source>``, which lands exactly on segment index 0 and
    shifts the original text by a whole segment width (alignment with
    the corpus-dedup segmentation is preserved)."""
    header = F.concat_ws(
        " ",
        F.array_repeat(
            F.concat(F.lit("boiler_"), F.col("source")), SEGMENT_WORDS
        ),
    )
    return docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 < 6, F.concat(header, F.lit(" "), F.col("text"))
        ).otherwise(F.col("text")),
    )


def boilerplate_by_source(docs: DataFrame) -> DataFrame:
    """Per-source template (boilerplate) segment accounting.

    A segment is *boilerplate* for a source when it occurs in ≥30% of the
    source's documents and in ≥3 distinct documents — the C4/quality-
    pipeline rule that catches navigation bars, cookie banners, and
    licence footers that corpus-wide dedup misses (a template shared by
    only one site never reaches a global duplicate threshold at 100 TB,
    but dominates that site's text).

    Returns one row per source: document count, boilerplate-digest count,
    documents affected, total boilerplate segment occurrences, and the
    removed-word share in ppm.

    Scale design: segments shuffle as digests only, keyed by (source,
    digest) — the natural partitioning, since the decision is per-source;
    the boilerplate digest set is tiny (templates, not content) and
    broadcast back for the affected-doc count."""
    toks = F.split(F.col("text"), " ")
    n_seg = F.floor(F.size(toks) / F.lit(SEGMENT_WORDS)).cast("int")
    segs_arr = F.transform(
        F.sequence(F.lit(0), n_seg - F.lit(1)),
        lambda i: F.md5(
            F.concat_ws(
                " ",
                F.slice(
                    toks,
                    i * F.lit(SEGMENT_WORDS) + F.lit(1),
                    F.lit(SEGMENT_WORDS),
                ),
            )
        ),
    )
    segs = docs.filter(n_seg >= 1).select(
        "source", "doc_id", F.explode(segs_arr).alias("digest")
    )
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(toks)).alias("total_words"),
    )
    stats = segs.groupBy("source", "digest").agg(
        F.count(F.lit(1)).alias("occ"),
        F.countDistinct("doc_id").alias("nd"),
    )
    boiler = (
        stats.join(per_source, "source")
        .filter(
            (F.col("nd") >= F.lit(BOILER_MIN_DOCS))
            & (F.col("nd") * 10 >= F.col("n_docs") * F.lit(BOILER_PCT_X10))
        )
        .select("source", "digest", "occ")
    )
    boiler_agg = boiler.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_boiler_digests"),
        F.sum("occ").alias("boiler_occurrences"),
    )
    affected = (
        segs.join(F.broadcast(boiler.select("source", "digest")), ["source", "digest"])
        .groupBy("source")
        .agg(F.countDistinct("doc_id").alias("n_affected_docs"))
    )
    return (
        per_source.join(boiler_agg, "source", "left")
        .join(affected, "source", "left")
        .select(
            "source",
            "n_docs",
            "total_words",
            F.coalesce(F.col("n_boiler_digests"), F.lit(0)).alias(
                "n_boiler_digests"
            ),
            F.coalesce(F.col("n_affected_docs"), F.lit(0)).cast("long").alias(
                "n_affected_docs"
            ),
            F.coalesce(F.col("boiler_occurrences"), F.lit(0)).alias(
                "boiler_occurrences"
            ),
            F.expr(
                f"coalesce(boiler_occurrences, 0) * {SEGMENT_WORDS} * 1000000"
                " div total_words"
            ).alias("removed_word_ppm"),
        )
        .orderBy("source")
    )


_BOILER_ORACLE = f"""
WITH planted AS (
    SELECT doc_id, source,
           CASE WHEN doc_id % 10 < 6
                THEN array_to_string(list_transform(
                         generate_series(1, {SEGMENT_WORDS}),
                         x -> 'boiler_' || source), ' ') || ' ' || text
                ELSE text END AS text
    FROM documents
),
toks AS (
    SELECT doc_id, source, string_split(text, ' ') AS t FROM planted
),
segs AS (
    SELECT source, doc_id,
           md5(array_to_string(
               t[i * {SEGMENT_WORDS} + 1 : i * {SEGMENT_WORDS} + {SEGMENT_WORDS}],
               ' ')) AS digest
    FROM toks,
         unnest(generate_series(0, CAST(len(t) // {SEGMENT_WORDS} AS INT) - 1))
             AS u(i)
    WHERE len(t) >= {SEGMENT_WORDS}
),
per_source AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(t)) AS BIGINT) AS total_words
    FROM toks GROUP BY source
),
stats AS (
    SELECT source, digest, CAST(COUNT(*) AS BIGINT) AS occ,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd
    FROM segs GROUP BY source, digest
),
boiler AS (
    SELECT s.source, s.digest, s.occ
    FROM stats s JOIN per_source p USING (source)
    WHERE s.nd >= {BOILER_MIN_DOCS}
      AND s.nd * 10 >= p.n_docs * {BOILER_PCT_X10}
),
boiler_agg AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_boiler_digests,
           CAST(SUM(occ) AS BIGINT) AS boiler_occurrences
    FROM boiler GROUP BY source
),
affected AS (
    SELECT g.source, CAST(COUNT(DISTINCT g.doc_id) AS BIGINT)
               AS n_affected_docs
    FROM segs g JOIN (SELECT DISTINCT source, digest FROM boiler) b
        USING (source, digest)
    GROUP BY g.source
)
SELECT p.source, p.n_docs, p.total_words,
       COALESCE(ba.n_boiler_digests, 0) AS n_boiler_digests,
       COALESCE(a.n_affected_docs, 0) AS n_affected_docs,
       COALESCE(ba.boiler_occurrences, 0) AS boiler_occurrences,
       COALESCE(ba.boiler_occurrences, 0) * {SEGMENT_WORDS} * 1000000
           // p.total_words AS removed_word_ppm
FROM per_source p
LEFT JOIN boiler_agg ba USING (source)
LEFT JOIN affected a USING (source)
ORDER BY p.source
"""


@register("text_boilerplate_by_source", oracle=_BOILER_ORACLE)
def text_boilerplate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate-segment audit over planted site templates."""
    return boilerplate_by_source(
        plant_boilerplate(load_table(spark, sf_dir, "documents"))
    )
