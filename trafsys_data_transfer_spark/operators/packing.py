"""Sequence packing and sharded-export assignment (§2.10 training export).

The last stage of a training-data pipeline turns a curated corpus into
fixed-length token sequences and evenly sized shards:

* **Sequence packing** — the GPT-style concat-and-chunk recipe:
  concatenate every document's tokens in a canonical order and split the
  stream every ``chunk_tokens`` tokens.  The per-document accounting
  (global start offset, first/last chunk touched) is a **prefix sum**
  over document lengths.
* **Shard assignment** — deterministic shard id plus a pseudorandom
  within-shard position (md5 sort key), so the export order is a pure
  function of content — reproducible across runs, engines and cluster
  sizes, like everything in ``sampling.py``.

Scale design (100 TB): a naive prefix sum —
``SUM(n) OVER (ORDER BY doc_id)`` with no PARTITION BY — collapses to a
**single task** in Spark (one unpartitioned window = one reducer
scanning the entire corpus).  The implementation here is the textbook
two-phase distributed scan instead:

1. assign each row a *deterministic* range bucket (integer arithmetic on
   the key — no sampling, unlike ``repartitionByRange``, so the same row
   lands in the same bucket every run);
2. one shuffle: per-bucket local prefix sums (window partitioned by
   bucket) and per-bucket totals (groupBy bucket) share the exchange;
3. the NB bucket totals — NB rows, independent of corpus size — come to
   the driver, are cumulated in bucket order, and rejoin as a broadcast
   map: ``global_offset = bucket_base + local_prefix``.

Total cost: one bucket shuffle + an O(NB) driver step, vs the
single-reducer bottleneck.  The result is bit-identical to the global
window (asserted by a bucket-count-invariance property test).

Reference basis: the reference (``/root/reference/script.js``) exports
nothing; these extend the mandated north-star surface (SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..sources.fixtures import load_table

#: Tokens per packed training sequence (fixture-scale; production 2k-8k).
CHUNK_TOKENS = 512

#: Prefix-sum buckets == shuffle width of the packing pass.
PACK_BUCKETS = 32

#: Export shard count.
N_SHARDS = 8


def pack_offsets(
    docs: DataFrame,
    key: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    chunk_tokens: int = CHUNK_TOKENS,
    n_buckets: int = PACK_BUCKETS,
) -> DataFrame:
    """Concat-and-chunk accounting via a two-phase distributed prefix sum.

    Returns ``key, n_tokens, start_off, first_chunk, last_chunk`` where
    ``start_off`` is the document's 0-based offset in the concatenated
    token stream (ordered by ``key``) and ``first_chunk``/``last_chunk``
    are the fixed-size chunks its tokens land in.

    The two bounded ``collect()``s are O(1) and O(n_buckets) rows
    respectively (never corpus-sized): the min/max of the key, and one
    partial-sum row per bucket.
    """
    lo, hi = docs.agg(F.min(key), F.max(key)).first()
    span = max(int(hi) - int(lo) + 1, 1)
    # Deterministic equal-width range bucket: pure integer arithmetic on the
    # key — unlike repartitionByRange there is no sampled boundary, so bucket
    # membership (and with it every offset) is stable across runs.
    bucket = ((F.col(key) - F.lit(int(lo))) * n_buckets / F.lit(span)).cast("int")
    rows = docs.select(
        F.col(key), F.col(n_tokens_col).cast("bigint").alias("n_tokens")
    ).withColumn("_bucket", bucket)

    totals = (
        rows.groupBy("_bucket").agg(F.sum("n_tokens").alias("t")).orderBy("_bucket")
    ).collect()
    base, bases = 0, []
    for r in totals:
        bases.append((r["_bucket"], base))
        base += r["t"]
    offsets = rows.sparkSession.createDataFrame(bases, "_bucket int, _base bigint")

    local = Window.partitionBy("_bucket").orderBy(key)
    start = (F.col("_base") + F.sum("n_tokens").over(local) - F.col("n_tokens")).alias(
        "start_off"
    )
    return (
        rows.join(F.broadcast(offsets), "_bucket")
        .select(key, "n_tokens", start)
        .select(
            key,
            "n_tokens",
            "start_off",
            F.expr(f"start_off DIV {chunk_tokens}").alias("first_chunk"),
            F.expr(f"(start_off + n_tokens - 1) DIV {chunk_tokens}").alias(
                "last_chunk"
            ),
        )
    )


@register(
    "docs_pack_sequences",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_tokens,
               CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - n_tokens AS BIGINT) AS start_off
        FROM t
    )
    SELECT doc_id, n_tokens, start_off,
           start_off // {CHUNK_TOKENS} AS first_chunk,
           (start_off + n_tokens - 1) // {CHUNK_TOKENS} AS last_chunk
    FROM c
    ORDER BY doc_id
    """,
)
def docs_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack the documents corpus into CHUNK_TOKENS-token training
    sequences: per-doc global offset and chunk span, computed with the
    distributed prefix sum (the oracle uses the equivalent — but
    single-reducer — global window)."""
    docs = load_table(spark, sf_dir, "documents")
    with_counts = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    )
    return pack_offsets(with_counts).orderBy("doc_id")


@register(
    "export_shard_assign",
    oracle=f"""
    SELECT doc_id,
           doc_id % {N_SHARDS} AS shard,
           CAST(row_number() OVER (
                PARTITION BY doc_id % {N_SHARDS}
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS BIGINT) AS pos
    FROM documents
    ORDER BY doc_id
    """,
)
def export_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sharded-export order: shard id + md5-shuffled position
    within the shard.  The md5 sort key is the engine-portable stand-in for
    a seeded shuffle — the export order never changes under re-runs or
    repartitioning, which is what makes training jobs resumable against it.
    One shuffle on the shard key; each shard sorts independently (no global
    sort)."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("shard").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (
        docs.select("doc_id", (F.col("doc_id") % N_SHARDS).alias("shard"))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .orderBy("doc_id")
    )


@register(
    "docs_chunk_manifest",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_tokens,
               CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - n_tokens AS BIGINT) AS start_off
        FROM t WHERE n_tokens > 0
    ),
    m AS (
        SELECT doc_id, n_tokens, start_off,
               unnest(generate_series(start_off // {CHUNK_TOKENS},
                                      (start_off + n_tokens - 1) // {CHUNK_TOKENS})) AS chunk_id
        FROM c
    )
    SELECT CAST(chunk_id AS BIGINT) AS chunk_id, doc_id,
           CAST(GREATEST(start_off, chunk_id * {CHUNK_TOKENS}) - start_off AS BIGINT) AS doc_tok_start,
           CAST(LEAST(start_off + n_tokens, (chunk_id + 1) * {CHUNK_TOKENS})
                - GREATEST(start_off, chunk_id * {CHUNK_TOKENS}) AS BIGINT) AS n_tok
    FROM m
    ORDER BY chunk_id, doc_id
    """,
)
def docs_chunk_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The loader-facing packing manifest: one row per (chunk, document)
    overlap, with the document-local token slice each chunk takes.  This is
    what a training data-loader actually reads — given a chunk id it lists
    exactly which token spans of which documents to concatenate.

    Built by exploding each document's ``first_chunk..last_chunk`` span
    from :func:`pack_offsets` (distributed prefix sum — no global window);
    the explode is narrow (≤ n_tokens/chunk + 1 rows per doc) and every
    output column is exact int64 arithmetic, so the manifest is
    bit-identical across engines and cluster sizes.  Row count is
    O(total_tokens / chunk_tokens + n_docs) — the manifest is ~1000×
    smaller than the token stream it describes."""
    docs = load_table(spark, sf_dir, "documents")
    with_counts = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    off = pack_offsets(with_counts)
    c = F.lit(CHUNK_TOKENS)
    return (
        off.select(
            "doc_id",
            "n_tokens",
            "start_off",
            F.explode(
                F.sequence(
                    F.expr(f"start_off DIV {CHUNK_TOKENS}"),
                    F.expr(f"(start_off + n_tokens - 1) DIV {CHUNK_TOKENS}"),
                )
            ).alias("chunk_id"),
        )
        .select(
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            "doc_id",
            (F.greatest(F.col("start_off"), F.col("chunk_id") * c) - F.col("start_off"))
            .cast("bigint")
            .alias("doc_tok_start"),
            (
                F.least(
                    F.col("start_off") + F.col("n_tokens"),
                    (F.col("chunk_id") + 1) * c,
                )
                - F.greatest(F.col("start_off"), F.col("chunk_id") * c)
            )
            .cast("bigint")
            .alias("n_tok"),
        )
        .orderBy("chunk_id", "doc_id")
    )


#: Retrieval-chunking window/stride (tokens).  Stride < window ⇒ overlap.
RAG_WINDOW = 64
RAG_STRIDE = 48


@register(
    "docs_overlap_chunks",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        FROM documents
    ),
    c AS (
        SELECT doc_id, n,
               unnest(generate_series(0, CAST(
                   CASE WHEN n <= {RAG_WINDOW} THEN 0
                        ELSE (n - {RAG_WINDOW} + {RAG_STRIDE - 1}) // {RAG_STRIDE}
                   END AS BIGINT))) AS chunk_idx
        FROM t
    )
    SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(chunk_idx * {RAG_STRIDE} AS BIGINT) AS tok_start,
           CAST(LEAST(n - chunk_idx * {RAG_STRIDE}, {RAG_WINDOW}) AS BIGINT) AS n_tok
    FROM c
    ORDER BY doc_id, chunk_idx
    """,
)
def docs_overlap_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document overlapping retrieval chunks (window RAG_WINDOW=64,
    stride RAG_STRIDE=48): the RAG-style chunker, as opposed to
    :func:`docs_pack_sequences`' cross-document concat-and-chunk.  Chunk
    starts advance by the stride; the final chunk is the one whose window
    reaches the document end, so every token is covered and consecutive
    chunks overlap by window−stride tokens.

    Scale: pure per-document integer arithmetic — a narrow explode with
    ≤ n_tokens/stride + 1 rows per document, no shuffle, no Python.  The
    chunk table is the input to embedding/indexing jobs; its determinism
    (a pure function of the text length) is what lets those jobs resume
    and incrementally refresh from a corpus_snapshot_diff change feed
    without re-chunking the unchanged corpus."""
    docs = load_table(spark, sf_dir, "documents")
    n = F.size(F.split(F.col("text"), " ")).cast("bigint")
    last_idx = F.when(n <= RAG_WINDOW, F.lit(0).cast("bigint")).otherwise(
        F.floor((n - RAG_WINDOW + RAG_STRIDE - 1) / RAG_STRIDE).cast("bigint")
    )
    return (
        docs.select("doc_id", n.alias("n"), last_idx.alias("last_idx"))
        .select(
            "doc_id",
            "n",
            F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("last_idx"))).alias(
                "chunk_idx"
            ),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            (F.col("chunk_idx") * RAG_STRIDE).cast("bigint").alias("tok_start"),
            F.least(
                F.col("n") - F.col("chunk_idx") * RAG_STRIDE, F.lit(RAG_WINDOW)
            )
            .cast("bigint")
            .alias("n_tok"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


#: Bin capacity (tokens) for boundary-preserving packing.  Far above the
#: fixture's max doc length (~100 tokens), so every document fits whole.
BESTFIT_CAPACITY = 256


def pack_bestfit_bins(
    docs: DataFrame,
    capacity: int = BESTFIT_CAPACITY,
    n_groups: int = PACK_BUCKETS,
) -> DataFrame:
    """Boundary-preserving bin packing: first-fit-decreasing WITHIN each
    of ``n_groups`` hash groups, each document intact in exactly one bin
    — the padded-packing regime (T5/SFT style) beside the concat-chunk
    splitter (:func:`pack_offsets`), where waste = padding instead of a
    split document.

    Returns per-doc assignments ``(doc_id, n_tokens, group, bin_idx)``.
    Scale: grouping is one hash shuffle; FFD runs per group in one Arrow
    batch (group token mass is ~total/n_groups — bounded by choosing
    n_groups ∝ corpus size); the first-fit invariant guarantees at most
    ONE bin per group at most half full, so global bin count ≤
    2·total/capacity + n_groups — within 2× of optimal at any scale."""
    import pandas as pd

    toks = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_groups))
        .cast("int")
        .alias("group"),
    )
    if toks.where(F.col("n_tokens") > capacity).limit(1).count() > 0:
        raise ValueError(
            f"document longer than bin capacity {capacity}; split oversize "
            "docs with the concat-chunk packer first"
        )

    def ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        )
        fills: list[int] = []
        assign = []
        for n in rows["n_tokens"]:
            n = int(n)
            for b, f in enumerate(fills):
                if f + n <= capacity:
                    fills[b] = f + n
                    assign.append(b)
                    break
            else:
                fills.append(n)
                assign.append(len(fills) - 1)
        out = rows[["doc_id", "n_tokens", "group"]].copy()
        out["bin_idx"] = assign
        return out

    return toks.groupBy("group").applyInPandas(
        ffd, "doc_id long, n_tokens long, group int, bin_idx int"
    )


@register(
    "docs_pack_bestfit",
    # STRICT certificate: the bin ASSIGNMENT is algorithm-dependent, so
    # the registered row carries the oracle-recomputable corpus facts
    # plus in-band booleans proving the packing contract - no bin over
    # capacity, token mass conserved, and the first-fit half-full bound
    # (at most one <= half-full bin per group -> bins <= 2*ceil(total/C)
    # + n_groups).  The assignment table stays available via
    # pack_bestfit_bins.
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           CAST(MAX(len(string_split(text, ' '))) AS BIGINT)
               AS max_doc_tokens,
           TRUE AS no_overflow, TRUE AS fill_conserved,
           TRUE AS halffull_bound
    FROM documents
    """,
)
def docs_pack_bestfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boundary-preserving FFD packing certificate over ``documents``:
    corpus facts the oracle recomputes (doc count, token mass, longest
    doc) plus the three packing invariants computed from the actual bin
    assignment."""
    docs = load_table(spark, sf_dir, "documents")
    # The assignment forks into bin fills AND doc stats — checkpoint so
    # the FFD pass runs once, not per branch.
    assigned = pack_bestfit_bins(docs).localCheckpoint(eager=False)
    bins = assigned.groupBy("group", "bin_idx").agg(
        F.sum("n_tokens").alias("fill")
    )
    bin_stats = bins.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.max("fill").alias("max_fill"),
        F.sum("fill").alias("fill_sum"),
    )
    doc_stats = assigned.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.max("n_tokens").alias("max_doc_tokens"),
    )
    c = F.lit(BESTFIT_CAPACITY)
    return doc_stats.join(F.broadcast(bin_stats)).select(
        "n_docs",
        "total_tokens",
        "max_doc_tokens",
        (F.col("max_fill") <= c).alias("no_overflow"),
        (F.col("fill_sum") == F.col("total_tokens")).alias("fill_conserved"),
        (
            F.col("n_bins")
            <= 2 * F.ceil(F.col("total_tokens") / c) + F.lit(PACK_BUCKETS)
        ).alias("halffull_bound"),
    )
