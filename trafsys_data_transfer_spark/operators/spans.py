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
