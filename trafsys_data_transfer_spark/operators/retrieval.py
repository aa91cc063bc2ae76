"""BM25 keyword retrieval over the ``documents`` table (north star §2.10).

Training-data pipelines run keyword retrieval constantly — quality mining
("find docs about X to upsample"), targeted decontamination probes, and
eval-set curation all reduce to scoring a corpus against a small term set.
BM25 (Robertson/Spärck Jones; the Okapi formulation with k1/b defaults) is
the standard lexical scorer.

Scale design (100 TB):

* The corpus is tokenized and exploded ONCE, and the explode is filtered
  to the query terms IMMEDIATELY — the only rows that ever reach a shuffle
  are (doc, query-term) hits, a vanishing fraction of the corpus.
* Document length rides along through the explode, so no join back to a
  per-doc stats table is needed.
* Corpus-level constants (N, total token count) and per-term document
  frequencies are tiny aggregates joined via **broadcast**; the big side
  shuffles once, on ``(doc_id)``, only for the hit rows.
* Per-document scores are materialised per term and added in a FIXED
  expression order (not a SUM over an unordered group), so the double
  addition is bit-identical between Spark and the DuckDB oracle.

The reference engine (/root/reference/script.js) has no text operators;
this extends the mandated LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..sources.fixtures import load_table

#: Okapi BM25 constants (the standard defaults).
BM25_K1 = 1.2
BM25_B = 0.75

#: Deterministic fixture query: terms present in the fixture vocabulary.
BM25_QUERY = ("spark", "merge", "window", "scan")

#: Result size.
BM25_TOPK = 20


def bm25_topk(
    docs: DataFrame,
    terms: tuple[str, ...] = BM25_QUERY,
    k: int = BM25_TOPK,
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by BM25 score against ``terms``.

    idf = ln((N - df + 0.5) / (df + 0.5) + 1)  (the non-negative variant);
    tf component = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).
    """
    toks = F.split(F.col(text_col), " ")
    # (doc, dl, term) hit rows: explode then filter — predicate applies
    # before any shuffle, so only query-term occurrences survive the scan.
    base = (
        docs.select("doc_id", F.size(toks).alias("dl"), F.explode(toks).alias("term"))
        .filter(F.col("term").isin(*terms))
    )
    tf = base.groupBy("doc_id", "dl", "term").agg(F.count(F.lit(1)).alias("tf"))

    # Corpus constants: one row, broadcast. dl/avgdl == dl*N/total_dl.
    stats = docs.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(toks)).alias("total_dl"),
    )
    return _score_hits(tf, stats, terms, k)


def _score_hits(tf: DataFrame, stats: DataFrame, terms, k: int) -> DataFrame:
    """Shared BM25 ranking over hit rows ``(term, doc_id, dl, tf)`` plus a
    1-row stats frame ``(n_docs, total_dl)`` — the SAME double expression
    and fixed-order sum whether hits come from an inline corpus explode
    (:func:`bm25_topk`) or a stored postings index
    (:func:`bm25_index_probe`), so the two tiers are bit-identical."""
    # Document frequency per term: one row per query term, broadcast.
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats))
        .withColumn(
            "s",
            F.log(
                (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
                + F.lit(1.0)
            )
            * (F.col("tf") * F.lit(BM25_K1 + 1))
            / (
                F.col("tf")
                + F.lit(BM25_K1)
                * (
                    F.lit(1 - BM25_B)
                    + F.lit(BM25_B)
                    * F.col("dl")
                    * F.col("n_docs")
                    / F.col("total_dl").cast("double")
                )
            ),
        )
    )
    # One conditional-agg column per term, then FIXED-ORDER addition:
    # bit-identical double math in Spark and the oracle.
    per_term = scored.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.col("term") == t, F.col("s"))).alias(f"s_{t}")
            for t in terms
        ]
    )
    score = None
    for t in terms:
        c = F.coalesce(F.col(f"s_{t}"), F.lit(0.0))
        score = c if score is None else score + c
    return (
        per_term.select("doc_id", F.round(score, 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(k)
    )


def _bm25_oracle(terms: tuple[str, ...], k: int) -> str:
    fixed_sum = " + ".join(
        f"COALESCE(MAX(CASE WHEN term = '{t}' THEN s END), 0.0)" for t in terms
    )
    in_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
    WITH base AS (
        SELECT doc_id, len(string_split(text, ' ')) AS dl,
               unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    hits AS (
        SELECT doc_id, dl, term, COUNT(*) AS tf
        FROM base WHERE term IN ({in_list})
        GROUP BY doc_id, dl, term
    ),
    stats AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_dl
        FROM documents
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM hits GROUP BY term),
    scored AS (
        SELECT h.doc_id, h.term,
               ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
               * (h.tf * {BM25_K1 + 1}) /
                 (h.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * h.dl * n_docs
                                      / CAST(total_dl AS DOUBLE))) AS s
        FROM hits h JOIN dfreq USING (term) CROSS JOIN stats
    )
    SELECT doc_id, ROUND({fixed_sum}, 6) AS bm25
    FROM scored
    GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT {k}
    """


@register("text_bm25_topk", oracle=_bm25_oracle(BM25_QUERY, BM25_TOPK))
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents by Okapi BM25 against a fixed 4-term query."""
    return bm25_topk(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# stored inverted index (postings as parquet — the sparse-retrieval serving
# tier, mirroring similarity.py's stored SQ8/PQ index-as-table contract)
# ---------------------------------------------------------------------------


def bm25_index_write(docs: DataFrame, path: str, text_col: str = "text") -> None:
    """Materialize the full inverted index: ``(term, doc_id, tf, dl)``
    postings parquet, range-partitioned and sorted by term so a probe's
    ``term IN (...)`` predicate prunes row groups via min/max stats —
    the storage ORDER is the index, the ivf partition-directory idea at
    the row-group grain (term cardinality is far too high for one
    directory per term).

    ``dl`` rides every posting row (denormalized) so probes never join a
    doc-length table; corpus constants land in ``_stats.json``
    (underscore prefix → invisible to parquet listings) as exact ints.
    """
    import json
    import os

    from ..session import spread

    toks = F.split(F.col(text_col), " ")
    # spread (r11, guide §2): tokenize+explode are the build's per-row
    # heavy work and otherwise run on the scan's single partition.
    base = spread(docs.select("doc_id", text_col), "doc_id").select(
        "doc_id", F.size(toks).alias("dl"), F.explode(toks).alias("term")
    )
    postings = base.groupBy("term", "doc_id", "dl").agg(
        F.count(F.lit(1)).alias("tf")
    )
    # Materialise the aggregated postings once so the corpus is tokenized
    # in ONE pass (r11, guide §1.2): the range-partitioned write and the
    # sidecar stats both read this relation instead of re-running the
    # split+explode lineage.
    postings = postings.localCheckpoint(eager=False)
    (
        postings.repartitionByRange("term")
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite")
        .parquet(path)
    )
    # Corpus stats from the postings themselves: every token occurrence
    # lands in exactly one posting's tf, so SUM(tf) == SUM(size(tokens))
    # and (split() always yields >= 1 element for non-null text) every
    # doc owns >= 1 posting.  The ONLY divergent case is a NULL text
    # (no postings; legacy arithmetic counts it as size(NULL) = -1), so
    # one narrow count pass detects it directly — no tokenize — and only
    # then does the legacy full re-tokenize expression run (ADVICE r11:
    # the former countDistinct(postings)==count(docs) guard compared two
    # separate evaluations of the docs lineage; this guard reads docs
    # once and postings once.  Deterministic-input assumption: ``docs``
    # must evaluate to the same rows across this function's two passes —
    # same contract as any write of a derived table).
    counts = docs.select(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.isnull(F.col(text_col)).cast("long")), F.lit(0)
        ).alias("n_null"),
    ).first()
    n_docs = int(counts["n"])
    if counts["n_null"] == 0:
        # coalesce → 0: an EMPTY corpus writes {n_docs: 0, total_dl: 0}
        # instead of raising on int(None) (ADVICE r11 empty-corpus fix).
        st = postings.agg(
            F.coalesce(F.sum("tf"), F.lit(0)).alias("tdl")
        ).first()
        total_dl = int(st["tdl"])
    else:  # NULL-text docs present: reproduce the exact legacy arithmetic
        total_dl = int(docs.select(F.sum(F.size(toks))).first()[0])
    with open(os.path.join(path, "_stats.json"), "w") as f:
        json.dump({"n_docs": int(n_docs), "total_dl": int(total_dl)}, f)


def bm25_index_probe(
    spark: SparkSession,
    path: str,
    terms: tuple[str, ...] = BM25_QUERY,
    k: int = BM25_TOPK,
) -> DataFrame:
    """BM25 top-k FROM THE STORED INDEX: the scan reads only the pruned
    postings rows (``PushedFilters: In(term, ...)`` — plan-asserted in
    tests), the corpus text appears nowhere in the plan, and scoring is
    the shared :func:`_score_hits` expression, so results are
    bit-identical to the inline tier."""
    import json
    import os

    with open(os.path.join(path, "_stats.json")) as f:
        st = json.load(f)
    hits = spark.read.parquet(path).filter(F.col("term").isin(*terms))
    stats = spark.createDataFrame(
        [(st["n_docs"], st["total_dl"])], "n_docs bigint, total_dl bigint"
    )
    return _score_hits(hits, stats, terms, k)


@register("text_bm25_index_probe", oracle=_bm25_oracle(BM25_QUERY, BM25_TOPK))
def text_bm25_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build-then-probe the stored inverted index: shares
    ``text_bm25_topk``'s hash-checked oracle, proving the postings
    round-trip (including the denormalized dl and sidecar stats) loses
    nothing vs the inline corpus explode."""
    import os

    from ..fsutil import process_staging_dir

    docs = load_table(spark, sf_dir, "documents")
    path = process_staging_dir(
        f"bm25index_{os.path.basename(os.path.normpath(sf_dir))}"
    )
    bm25_index_write(docs, path)
    return bm25_index_probe(spark, path)


def bm25_index_append(
    docs_delta: DataFrame, path: str, text_col: str = "text"
) -> None:
    """Incrementally maintain the stored inverted index: the delta's
    postings land as NEW term-sorted parquet files appended to the index
    directory, and the sidecar corpus stats are advanced additively.

    No stored posting is rewritten — BM25's per-term scoring needs only
    (tf, dl) per posting plus corpus totals, all of which are additive,
    so ingest cost is O(delta), not O(index).  Parquet row-group pruning
    still works: each appended file carries its own term min/max stats,
    so a probe's ``term IN (...)`` prunes base and delta files alike
    (slightly more files per term over time — the compaction operator is
    the maintenance answer, same as any LSM-ish layout).
    """
    import json
    import os

    from ..session import spread

    toks = F.split(F.col(text_col), " ")
    # One narrow count pass: delta size + NULL-text detection together
    # (ADVICE r11 — same single-guard discipline as bm25_index_write).
    counts = docs_delta.select(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.isnull(F.col(text_col)).cast("long")), F.lit(0)
        ).alias("n_null"),
    ).first()
    d_docs = int(counts["n"])
    if d_docs == 0:
        # Empty delta: no postings write, sidecar stats unchanged.
        return
    # Same one-tokenize-pass recipe as bm25_index_write (r11): spread the
    # delta ahead of the explode, materialise the aggregated postings,
    # and derive the stats delta from them with the NULL-text fallback.
    base = spread(docs_delta.select("doc_id", text_col), "doc_id").select(
        "doc_id", F.size(toks).alias("dl"), F.explode(toks).alias("term")
    )
    postings = base.groupBy("term", "doc_id", "dl").agg(
        F.count(F.lit(1)).alias("tf")
    )
    postings = postings.localCheckpoint(eager=False)
    (
        postings.repartitionByRange("term")
        .sortWithinPartitions("term", "doc_id")
        .write.mode("append")
        .parquet(path)
    )
    if counts["n_null"] == 0:
        st_delta = postings.agg(
            F.coalesce(F.sum("tf"), F.lit(0)).alias("tdl")
        ).first()
        d_dl = int(st_delta["tdl"])
    else:  # NULL-text docs in the delta: exact legacy arithmetic
        d_dl = int(
            docs_delta.select(
                F.coalesce(F.sum(F.size(toks)), F.lit(0))
            ).first()[0]
        )
    stats_path = os.path.join(path, "_stats.json")
    with open(stats_path) as f:
        st = json.load(f)
    st["n_docs"] += int(d_docs)
    st["total_dl"] += int(d_dl)
    # Single-writer contract (same as versioned_commit's administrator
    # caveat): the read-modify-write below is atomic against READERS via
    # os.replace, but concurrent appenders must be externally serialized.
    tmp_path = f"{stats_path}.tmp.{os.getpid()}"
    with open(tmp_path, "w") as f:
        json.dump(st, f)
    os.replace(tmp_path, stats_path)


def bm25_index_compact(spark: SparkSession, path: str) -> tuple[int, int]:
    """LSM-style maintenance for the stored index (VERDICT r06 task 2):
    merge the base runs plus every appended delta file back into
    term-sorted runs, so probe-side file counts stay O(range partitions)
    instead of growing with every ingest batch.  Returns
    (files_before, files_after).

    The rewrite is the same physical recipe as :func:`bm25_index_write`
    — ``repartitionByRange(term)`` + ``sortWithinPartitions(term,
    doc_id)`` — so each output file covers a tight term interval and the
    probe's ``term IN (...)`` keeps pruning via parquet min/max stats.
    Logical content is untouched (appends carry disjoint doc_ids), so
    ``compact(append(index)) == rebuild(corpus)`` posting-for-posting;
    the sidecar stats are already correct and are carried over as-is.

    Single-administrator action (like layout compaction / vacuum): the
    swap is rename-based — stage the merged runs beside the index, move
    the live directory aside, promote the staged one — and concurrent
    probes/appends must be quiesced for that instant."""
    import json
    import os
    import shutil

    def _count_parquet(d: str) -> int:
        return len(
            [
                f
                for f in os.listdir(d)
                if f.endswith(".parquet") and not f.startswith(("_", "."))
            ]
        )

    files_before = _count_parquet(path)
    with open(os.path.join(path, "_stats.json")) as f:
        stats = json.load(f)
    staged = f"{path}.compact{os.getpid()}"
    (
        spark.read.parquet(path)
        .repartitionByRange("term")
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite")
        .parquet(staged)
    )
    with open(os.path.join(staged, "_stats.json"), "w") as f:
        json.dump(stats, f)
    old = f"{path}.old{os.getpid()}"
    os.rename(path, old)
    os.rename(staged, path)
    shutil.rmtree(old)
    return files_before, _count_parquet(path)


@register(
    "text_bm25_index_incremental",
    oracle=_bm25_oracle(BM25_QUERY, BM25_TOPK),
)
def text_bm25_index_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-maintenance lifecycle: build the stored index from the
    corpus MINUS tonight's ingest batch, APPEND the batch's postings
    (O(delta) — no stored posting rewritten), then probe.  Shares the
    inline tier's hash-checked full-corpus oracle, so a single posting
    lost or double-counted at the append seam is a hash mismatch."""
    import os

    from ..fsutil import process_staging_dir
    from .dedup import INCREMENTAL_BATCH_SOURCES

    docs = load_table(spark, sf_dir, "documents")
    is_batch = F.col("source").isin(*INCREMENTAL_BATCH_SOURCES)
    path = process_staging_dir(
        f"bm25inc_{os.path.basename(os.path.normpath(sf_dir))}"
    )
    bm25_index_write(docs.filter(~is_batch), path)
    bm25_index_append(docs.filter(is_batch), path)
    return bm25_index_probe(spark, path)


@register(
    "text_bm25_index_compacted",
    oracle=_bm25_oracle(BM25_QUERY, BM25_TOPK),
)
def text_bm25_index_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full LSM lifecycle: build base runs, append an ingest batch's
    delta files, COMPACT the file set back into term-sorted runs, probe.
    Shares the inline tier's hash-checked oracle — a posting lost,
    duplicated, or mis-sorted by the merge is a hash mismatch — and the
    compaction==rebuild pytest pins posting-level equality."""
    import os

    from ..fsutil import process_staging_dir
    from .dedup import INCREMENTAL_BATCH_SOURCES

    docs = load_table(spark, sf_dir, "documents")
    is_batch = F.col("source").isin(*INCREMENTAL_BATCH_SOURCES)
    path = process_staging_dir(
        f"bm25cmp_{os.path.basename(os.path.normpath(sf_dir))}"
    )
    bm25_index_write(docs.filter(~is_batch), path)
    bm25_index_append(docs.filter(is_batch), path)
    before, after = bm25_index_compact(spark, path)
    assert after <= before
    return bm25_index_probe(spark, path)


# ---------------------------------------------------------------------------
# Positional postings / phrase search
# ---------------------------------------------------------------------------

#: Static phrase set for the registered query (distinct words, so the
#: overlap-free occurrence count agrees with a sequential-scan oracle).
PHRASES = (
    "row column sort",
    "window fast query",
    "stream table hash",
)


def phrase_search(
    docs: DataFrame, phrases: tuple[str, ...] = PHRASES, text_col: str = "text"
) -> DataFrame:
    """Exact phrase matching via POSITIONAL postings — the capability a
    bag-of-words index (BM25 postings) structurally lacks: "word order
    matters" queries need per-term position lists, intersected under a
    +1 shift per phrase slot.

    Plan shape (the scale path a LIKE-scan can't give): tokenize +
    posexplode ONCE, filter immediately to the phrase vocabulary — only
    (doc, phrase-term, position) hits survive to the single (doc_id)
    shuffle; per-document position arrays then resolve every phrase with
    JVM array intersections (``transform``/``array_intersect``), no
    Python, no re-scan per phrase.  With a STORED positional index the
    probe reads only the phrase terms' postings — same serving economics
    as the BM25 index tier.

    Occurrences are counted at every start position; for phrases with
    pairwise-distinct words (enforced here) that equals the
    non-overlapping sequential count, which is what the oracle computes
    by split-scanning the normalized text.
    """
    vocab = sorted({w for p in phrases for w in p.split(" ")})
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " ")), " "
    )
    hits = (
        docs.select("doc_id", F.posexplode(toks).alias("pos", "term"))
        .filter(F.col("term").isin(*vocab))
    )
    plists = hits.groupBy("doc_id", "term").agg(
        F.array_sort(F.collect_list("pos")).alias("ps")
    )
    # doc → map(term → positions): one row per candidate doc
    bydoc = plists.groupBy("doc_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("term", "ps"))
        ).alias("pm")
    )
    out = None
    for ph in phrases:
        words = ph.split(" ")
        starts = F.col("pm").getItem(words[0])
        for w in words[1:]:
            starts = F.array_intersect(
                F.transform(starts, lambda x: x + 1),
                F.coalesce(
                    F.col("pm").getItem(w),
                    F.array().cast("array<int>"),
                ),
            )
        n = F.size(F.coalesce(starts, F.array().cast("array<int>")))
        leg = bydoc.select(
            F.lit(ph).alias("phrase"),
            "doc_id",
            # the chained intersection leaves END positions; the count is
            # what matters and is shift-invariant
            n.alias("n_hits"),
        ).filter(F.col("n_hits") > 0)
        out = leg if out is None else out.unionByName(leg)
    return out.orderBy("phrase", "doc_id")


def _phrase_oracle() -> str:
    # positional three-way self-join per phrase: exact at every start
    # offset (a padded split-scan undercounts ADJACENT repeats because
    # the delimiter consumes the shared space)
    legs = []
    for ph in PHRASES:
        w0, w1, w2 = ph.split(" ")
        legs.append(f"""
    SELECT '{ph}' AS phrase, a.doc_id, CAST(COUNT(*) AS INT) AS n_hits
    FROM w a
    JOIN w b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
    JOIN w c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
    WHERE a.term = '{w0}' AND b.term = '{w1}' AND c.term = '{w2}'
    GROUP BY a.doc_id""")
    body = "\n    UNION ALL".join(legs)
    return f"""
    WITH n AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                            ' ') AS ws
        FROM documents
    ),
    w AS (
        SELECT doc_id, unnest(ws) AS term, generate_subscripts(ws, 1) AS pos
        FROM n
    )
    {body}
    ORDER BY phrase, doc_id
    """


@register("text_phrase_search", oracle=_phrase_oracle())
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional-postings phrase search over the documents corpus for
    three fixed distinct-word phrases; per (phrase, doc) occurrence
    counts hash-checked against a sequential split-scan oracle."""
    return phrase_search(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of the lexical and dense legs
# ---------------------------------------------------------------------------

#: RRF constant (the standard k=60) and fused-list size.
RRF_K = 60
RRF_TOPK = 20
RRF_LEG_K = 50


def _rrf_oracle() -> str:
    fixed_sum = " + ".join(
        f"COALESCE(MAX(CASE WHEN term = '{t}' THEN s END), 0.0)"
        for t in BM25_QUERY
    )
    in_list = ", ".join(f"'{t}'" for t in BM25_QUERY)
    return f"""
    WITH base AS (
        SELECT doc_id, len(string_split(text, ' ')) AS dl,
               unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    hits AS (
        SELECT doc_id, dl, term, COUNT(*) AS tf
        FROM base WHERE term IN ({in_list})
        GROUP BY doc_id, dl, term
    ),
    stats AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_dl
        FROM documents
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM hits GROUP BY term),
    scored AS (
        SELECT h.doc_id, h.term,
               ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
               * (h.tf * {BM25_K1 + 1}) /
                 (h.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * h.dl * n_docs
                                      / CAST(total_dl AS DOUBLE))) AS s
        FROM hits h JOIN dfreq USING (term) CROSS JOIN stats
    ),
    lex_list AS (
        SELECT doc_id, ROUND({fixed_sum}, 6) AS bm25
        FROM scored GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id LIMIT {RRF_LEG_K}
    ),
    lex AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
        FROM lex_list
    ),
    dense AS (
        SELECT neighbor_id AS doc_id, rank AS dense_rank FROM (
            SELECT c.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (
                       ORDER BY list_cosine_similarity(
                           q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                       c.vec_id) AS rank
            FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
            WHERE q.vec_id = 0
        ) WHERE rank <= {RRF_LEG_K}
    ),
    fused AS (
        SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
               l.lex_rank, d.dense_rank,
               COALESCE(1000000 // (60 + l.lex_rank), 0)
               + COALESCE(1000000 // (60 + d.dense_rank), 0) AS rrf_ppm
        FROM lex l FULL JOIN dense d ON l.doc_id = d.doc_id
    )
    SELECT doc_id, CAST(rrf_ppm AS BIGINT) AS rrf_ppm,
           CAST(lex_rank AS INT) AS lex_rank,
           CAST(dense_rank AS INT) AS dense_rank
    FROM fused
    ORDER BY rrf_ppm DESC, doc_id
    LIMIT {RRF_TOPK}
    """


@register("retrieval_hybrid_rrf", oracle=_rrf_oracle())
def retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID retrieval: the lexical leg (Okapi BM25 over the fixed term
    query) and the dense leg (exact cosine neighbors of document 0's
    embedding — vec_id ≡ doc_id in the fixture) fused by reciprocal-rank
    fusion, score = Σ 1 000 000 ÷ (60 + rank) in exact integer ppm-style
    units so the fusion is bit-identical across engines.  RRF is the
    standard zero-tuning fusion for sparse+dense rankers; docs appearing
    in only one leg keep that leg's term (COALESCE 0 on the other).

    Plan: each leg is the already-verified ranker (bm25_topk's
    filter-before-shuffle explode; topk_bruteforce's broadcast matmul);
    fusion itself is a 50-row full outer join — O(leg k), scale-free.
    """
    from .similarity import topk_bruteforce

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lex = bm25_topk(docs, k=RRF_LEG_K)
    # Leg is already top-k (≤ RRF_LEG_K rows) — assert it before the global
    # re-rank pass (VERDICT r10 task 3).
    from .guards import bounded_window_guard

    lex = bounded_window_guard(lex, "retrieval_hybrid_rrf", max_rows=10_000)
    w = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    lex = lex.select("doc_id", F.row_number().over(w).alias("lex_rank"))
    dense = (
        topk_bruteforce(emb, emb.filter(F.col("vec_id") == 0), k=RRF_LEG_K)
        .select(F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("dense_rank"))
    )
    leg = lambda r: F.expr(f"1000000 div (60 + {r})")  # noqa: E731
    fused = (
        lex.join(dense, "doc_id", "full")
        .select(
            "doc_id",
            (
                F.coalesce(leg("lex_rank"), F.lit(0))
                + F.coalesce(leg("dense_rank"), F.lit(0))
            ).cast("long").alias("rrf_ppm"),
            "lex_rank",
            "dense_rank",
        )
        .orderBy(F.desc("rrf_ppm"), F.asc("doc_id"))
        .limit(RRF_TOPK)
    )
    return fused


# ---------------------------------------------------------------------------
# Percolation: standing queries matched against arriving documents
# ---------------------------------------------------------------------------

#: Standing conjunctive queries (alerting rules): a document matches when
#: it contains EVERY term of the query.
STANDING_QUERIES = {
    1: ("spark", "merge"),
    2: ("window", "scan", "filter"),
    3: ("vector", "batch"),
    4: ("customer", "order", "join"),
}


def percolate(
    docs: DataFrame,
    queries: dict[int, tuple[str, ...]] = STANDING_QUERIES,
    text_col: str = "text",
) -> DataFrame:
    """REVERSE search: instead of one query scanning a corpus, every
    arriving document is matched against the registered standing queries
    (the Elasticsearch percolator shape — alerting, routing, saved
    searches).  A doc matches a query iff it contains all its terms.

    Plan: tokenize + explode ONCE, filter immediately to the union
    vocabulary of all queries (same discipline as bm25_topk — only
    matching terms reach the shuffle), distinct (doc, term) hits, then
    one broadcast join against the exploded query-term table and a
    per-(doc, query) count compared to the query's term count.  Cost is
    O(hits × avg queries per term), never O(docs × queries)."""
    vocab = sorted({t for ts in queries.values() for t in ts})
    qrows = [(qid, t, len(ts)) for qid, ts in queries.items() for t in ts]
    spark = docs.sparkSession
    qdf = spark.createDataFrame(qrows, "query_id int, term string, n_terms int")
    toks = F.split(F.col(text_col), " ")
    hits = (
        docs.select("doc_id", F.explode(toks).alias("term"))
        .filter(F.col("term").isin(*vocab))
        .distinct()
    )
    return (
        hits.join(F.broadcast(qdf), "term")
        .groupBy("query_id", "doc_id", "n_terms")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .filter(F.col("n_hit") == F.col("n_terms"))
        .select("query_id", "doc_id")
        .orderBy("query_id", "doc_id")
    )


def _percolate_oracle() -> str:
    legs = []
    for qid, ts in STANDING_QUERIES.items():
        conj = " AND ".join(
            f"list_contains(ws, '{t}')" for t in ts
        )
        legs.append(
            f"    SELECT {qid} AS query_id, doc_id FROM w WHERE {conj}"
        )
    body = "\n    UNION ALL\n".join(legs)
    return f"""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    )
    {body}
    ORDER BY query_id, doc_id
    """


@register("text_percolate", oracle=_percolate_oracle())
def text_percolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Match every fixture document against the standing conjunctive
    queries; (query_id, doc_id) pairs hash-checked against a
    list_contains conjunction oracle."""
    return percolate(load_table(spark, sf_dir, "documents"))


#: substring pattern for the registered trigram-search query
TRGM_PATTERN = "widge"


@register(
    "part_trigram_search",
    # index-accelerated substring search (pg_trgm): the oracle is the
    # full-scan LIKE — the engine must return exactly its rows while
    # never evaluating LIKE outside the gram-candidate set
    oracle=f"""
    SELECT p_partkey, p_name FROM part
    WHERE p_name LIKE '%{TRGM_PATTERN}%'
    ORDER BY p_partkey
    """,
)
def part_trigram_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram-indexed substring search (the pg_trgm recipe): explode
    each name's DISTINCT 3-grams into an inverted (gram, key) index,
    semi-join the pattern's grams with an all-grams count match (the
    relational-division step), and only then verify the ~selectivity%
    survivors with the actual ``contains`` — LIKE never touches the full
    table.  At 100 TB the gram index is the stored artifact (partitioned
    by gram, same posture as the BM25 postings) and a query reads only
    its pattern's gram partitions; the LIKE-verify cost is bounded by
    candidate count, not corpus size.  False positives (grams present,
    substring absent — split across positions) are removed by the
    verify, so the result is EXACTLY the full-scan answer."""
    parts = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    grams = F.array_distinct(
        F.expr(
            "transform(sequence(1, greatest(length(p_name) - 2, 0)),"
            " i -> substring(p_name, i, 3))"
        )
    )
    index = parts.select(
        "p_partkey", "p_name", F.explode(grams).alias("g")
    )
    if len(TRGM_PATTERN) < 3:
        # A sub-trigram pattern has NO grams: the candidate set would be
        # empty while the LIKE oracle still matches — the gram index
        # cannot serve it, so fail loudly (ADVICE r10 #4).
        raise ValueError(
            f"pattern {TRGM_PATTERN!r} shorter than 3 chars cannot be "
            "served by a trigram index; fall back to a full LIKE scan"
        )
    # Dedup pattern grams: countDistinct(g) over the matched rows can reach
    # at most the number of DISTINCT pattern grams, so comparing against
    # the raw (possibly repeated) gram count would return zero candidates
    # for any pattern with a repeated trigram (ADVICE r10 #4).
    pgrams = sorted(
        {TRGM_PATTERN[i : i + 3] for i in range(len(TRGM_PATTERN) - 2)}
    )
    return (
        index.where(F.col("g").isin(pgrams))
        .groupBy("p_partkey", "p_name")
        .agg(F.countDistinct("g").alias("n_hit"))
        .where(F.col("n_hit") == len(pgrams))
        .where(F.col("p_name").contains(TRGM_PATTERN))
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# Contrastive training-pair mining (positives / hard / random negatives)
# ---------------------------------------------------------------------------

#: Per query term: top-N_POS BM25 docs are positives, the next N_HARD
#: are hard negatives, and N_RAND hash-picked docs NOT containing the
#: term are random negatives.
NEG_N_POS = 3
NEG_N_HARD = 3
NEG_N_RAND = 3


def negative_sampling_pairs(docs: DataFrame) -> DataFrame:
    """Training triples for a contrastive retriever: for each query
    term, (positive, negative, kind) document pairs — positives are the
    BM25 top ranks, hard negatives the ranks just past the cutoff (the
    in-batch-indistinguishable ones dense retrievers need), random
    negatives a deterministic hash pick from documents WITHOUT the term.

    This is the data-prep step for DPR/contrastive fine-tuning, run as
    three bounded slices of relations the retrieval stack already
    builds: the per-term ranking (one hit-explode + per-term window) and
    an anti-join for the no-term pool ordered by ``hash(term || doc)``
    (deterministic, uncorrelated across terms).  Output is
    O(terms × N² ) rows — training pairs, not corpus-sized.
    """
    from .dedup import portable_hash60

    toks = F.split(F.col("text"), " ")
    base = docs.select(
        "doc_id", F.size(toks).alias("dl"), F.explode(toks).alias("term")
    ).filter(F.col("term").isin(*BM25_QUERY))
    tf = base.groupBy("doc_id", "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    stats = docs.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).alias("total_dl"),
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats))
        .withColumn(
            "s",
            F.round(
                F.log(
                    (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                    + F.lit(1.0)
                )
                * (F.col("tf") * F.lit(BM25_K1 + 1))
                / (
                    F.col("tf")
                    + F.lit(BM25_K1)
                    * (
                        F.lit(1 - BM25_B)
                        + F.lit(BM25_B)
                        * F.col("dl")
                        * F.col("n_docs")
                        / F.col("total_dl").cast("double")
                    )
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("term").orderBy(F.desc("s"), F.asc("doc_id"))
    ranked = scored.withColumn("rn", F.row_number().over(w))
    pos = ranked.filter(F.col("rn") <= NEG_N_POS).select(
        "term", F.col("doc_id").alias("pos_doc_id")
    )
    hard = ranked.filter(
        (F.col("rn") > NEG_N_POS) & (F.col("rn") <= NEG_N_POS + NEG_N_HARD)
    ).select("term", F.col("doc_id").alias("neg_doc_id"), F.lit("hard").alias("neg_kind"))
    terms_df = ranked.select("term").distinct()
    no_term_pool = (
        terms_df.crossJoin(docs.select("doc_id"))
        .join(tf.select("term", "doc_id"), ["term", "doc_id"], "left_anti")
        .withColumn(
            "hk",
            portable_hash60(
                F.concat(F.col("term"), F.lit(":"), F.col("doc_id").cast("string"))
            ),
        )
    )
    w_rand = Window.partitionBy("term").orderBy("hk", "doc_id")
    rand = (
        no_term_pool.withColumn("rr", F.row_number().over(w_rand))
        .filter(F.col("rr") <= NEG_N_RAND)
        .select(
            "term",
            F.col("doc_id").alias("neg_doc_id"),
            F.lit("random").alias("neg_kind"),
        )
    )
    negs = hard.unionByName(rand)
    return (
        pos.join(negs, "term")
        .select("term", "pos_doc_id", "neg_doc_id", "neg_kind")
        .orderBy("term", "pos_doc_id", "neg_kind", "neg_doc_id")
    )


def _negsample_oracle() -> str:
    from .dedup import PORTABLE_HASH60_SQL

    in_list = ", ".join(f"'{t}'" for t in BM25_QUERY)
    hk = PORTABLE_HASH60_SQL.format(s="term || ':' || CAST(doc_id AS VARCHAR)")
    return f"""
    WITH base AS (
        SELECT doc_id, len(string_split(text, ' ')) AS dl,
               unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    hits AS (
        SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM base WHERE term IN ({in_list})
        GROUP BY doc_id, dl, term
    ),
    stats AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_dl
        FROM documents
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM hits GROUP BY term),
    ranked AS (
        SELECT h.doc_id, h.term,
               ROW_NUMBER() OVER (PARTITION BY h.term ORDER BY
                   ROUND(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                   * (h.tf * {BM25_K1 + 1}) /
                     (h.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * h.dl
                      * n_docs / CAST(total_dl AS DOUBLE))), 6) DESC,
                   h.doc_id ASC) AS rn
        FROM hits h JOIN dfreq USING (term) CROSS JOIN stats
    ),
    pos AS (
        SELECT term, doc_id AS pos_doc_id FROM ranked
        WHERE rn <= {NEG_N_POS}
    ),
    hard AS (
        SELECT term, doc_id AS neg_doc_id, 'hard' AS neg_kind FROM ranked
        WHERE rn > {NEG_N_POS} AND rn <= {NEG_N_POS + NEG_N_HARD}
    ),
    pool AS (
        SELECT t.term, d.doc_id, {hk} AS hk
        FROM (SELECT DISTINCT term FROM ranked) t
        CROSS JOIN (SELECT doc_id FROM documents) d
        WHERE NOT EXISTS (SELECT 1 FROM hits h
                          WHERE h.term = t.term AND h.doc_id = d.doc_id)
    ),
    rand AS (
        SELECT term, doc_id AS neg_doc_id, 'random' AS neg_kind FROM (
            SELECT term, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY term
                                      ORDER BY hk, doc_id) AS rr
            FROM pool
        ) WHERE rr <= {NEG_N_RAND}
    ),
    negs AS (SELECT * FROM hard UNION ALL SELECT * FROM rand)
    SELECT p.term, p.pos_doc_id, n.neg_doc_id, n.neg_kind
    FROM pos p JOIN negs n USING (term)
    ORDER BY p.term, p.pos_doc_id, n.neg_kind, n.neg_doc_id
    """


@register("retrieval_negative_sampling", oracle=_negsample_oracle())
def retrieval_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive training pairs: BM25 positives × (hard + random)
    negatives per query term."""
    return negative_sampling_pairs(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Snippet extraction (RAG context windows)
# ---------------------------------------------------------------------------

#: Words kept on each side of the first match.
SNIPPET_RADIUS = 3


def snippet_extract(docs: DataFrame) -> DataFrame:
    """±R-word snippet around the FIRST occurrence of each query term in
    each document containing it — the context-window extraction a RAG
    stack runs after retrieval (serve the relevant span, not the whole
    document).

    Pure array expressions: ``array_position`` finds the hit, ``slice``
    takes the window, ``concat_ws`` re-joins — no regex backtracking, no
    Python, and the scan only carries documents that contain a term (the
    explode+filter prunes before any shuffle).  Output is one row per
    (term, matching doc): (term, doc_id, first_pos, snippet).
    """
    toks = F.split(F.col("text"), " ")
    hits = docs.select(
        "doc_id", toks.alias("t"), F.explode(F.array_distinct(toks)).alias("term")
    ).filter(F.col("term").isin(*BM25_QUERY))
    pos = hits.withColumn(
        "first_pos", F.array_position(F.col("t"), F.col("term")).cast("long")
    )
    start = F.greatest(F.col("first_pos") - SNIPPET_RADIUS, F.lit(1))
    # slice length to cover [start, first_pos + R]
    length = (
        F.least(
            F.col("first_pos") + SNIPPET_RADIUS,
            F.size(F.col("t")).cast("long"),
        )
        - start
        + 1
    )
    return (
        pos.select(
            "term",
            "doc_id",
            "first_pos",
            F.concat_ws(
                " ", F.slice(F.col("t"), start.cast("int"), length.cast("int"))
            ).alias("snippet"),
        )
        .orderBy("term", "doc_id")
    )


def _snippet_oracle() -> str:
    in_list = ", ".join(f"'{t}'" for t in BM25_QUERY)
    return f"""
    WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    hits AS (
        SELECT doc_id, t, term
        FROM (SELECT doc_id, t, unnest(list_distinct(t)) AS term FROM tok)
        WHERE term IN ({in_list})
    ),
    pos AS (
        SELECT doc_id, t, term,
               CAST(list_position(t, term) AS BIGINT) AS first_pos
        FROM hits
    )
    SELECT term, doc_id, first_pos,
           array_to_string(
               t[GREATEST(first_pos - {SNIPPET_RADIUS}, 1):
                 LEAST(first_pos + {SNIPPET_RADIUS}, len(t))], ' ')
               AS snippet
    FROM pos
    ORDER BY term, doc_id
    """


@register("text_snippet_extract", oracle=_snippet_oracle())
def text_snippet_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG snippet windows around the first query-term hit per document."""
    return snippet_extract(load_table(spark, sf_dir, "documents"))
