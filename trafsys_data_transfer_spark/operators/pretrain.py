"""The capstone composition: a full pretraining-data curation funnel.

Every stage below ships — and is individually oracle- or pytest-verified
— elsewhere in this engine; this operator runs them AS ONE PIPELINE over
the corpus and reports the stage-by-stage yield funnel, which is the
artifact a data lead actually reviews before a training run:

    ingest → Gopher quality gate → corpus-LM perplexity filter
           → exact dedup → MinHash near-dup clustering
           → benchmark decontamination → sequence accounting

Composition is the point: id spaces must line up across seven operators,
keeper elections must not resurrect dropped docs, and the funnel counts
must be monotone non-increasing — invariants pytest asserts.  Registered
rows-only (MinHash banding and the LM are not ANSI-SQL), with every
count an exact integer so the driver's rows-only check is stable.

Scale posture is inherited from the components (each documented in its
own module): the funnel adds only narrow flag columns and O(stages)
bookkeeping on top — no new shuffle beyond what the components already
pay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.fixtures import load_table
from .contamination import EVAL_SOURCES, decontaminate_hits
from .dedup import fingerprint, minhash_near_dups
from .graph import connected_components
from .lm import lm_score_docs
from .text import (
    GOPHER_MAX_MEAN_WORD_LEN,
    GOPHER_MAX_SYMBOL_RATIO,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_ALPHA_WORD_FRAC,
    GOPHER_MIN_MEAN_WORD_LEN,
    GOPHER_MIN_STOPWORD_HITS,
    GOPHER_MIN_WORDS,
    STOPWORDS,
)

#: Keep documents at or below this corpus-LM percentile (drop the least
#: predictable tail — the CCNet-style noise filter run in reverse).
LM_KEEP_PCTILE = 0.95

#: Target training sequence length for the final token accounting.
SEQ_LEN = 2048


def pretrain_funnel(
    spark: SparkSession,
    docs: DataFrame,
    lm_keep_pctile: float = LM_KEEP_PCTILE,
) -> DataFrame:
    """Run the full curation funnel; returns (stage_no, stage, n_docs,
    n_tokens) with exact-integer counts.  ``lm_keep_pctile=1.0`` keeps
    every document at the LM stage (cut = max score) — the knob tests
    use to exercise the machinery without the corpus-dependent drop."""
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    base = docs.select("doc_id", "source", "text", n_tokens.alias("n_tokens"))

    stages: list[tuple[str, DataFrame]] = [("ingest", base)]

    # 1. Gopher quality gate (text_gopher_rules semantics, inline flags)
    n_nonspace = F.length(F.regexp_replace(F.col("text"), " ", ""))
    n_symbols = F.regexp_count(F.col("text"), F.lit(r"#|\.\.\."))
    alpha_words = F.size(F.filter(toks, lambda x: x.rlike("[a-z]")))
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    mean_wl = n_nonspace.cast("double") / F.col("n_tokens")
    keep_q = (
        F.col("n_tokens").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & mean_wl.between(GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MAX_MEAN_WORD_LEN)
        & (n_symbols.cast("double") / F.col("n_tokens") < GOPHER_MAX_SYMBOL_RATIO)
        & (alpha_words.cast("double") / F.col("n_tokens") >= GOPHER_MIN_ALPHA_WORD_FRAC)
        & (stop_hits >= GOPHER_MIN_STOPWORD_HITS)
    )
    # localCheckpoint: each stage is both aggregated (funnel row) and
    # consumed by the next stage — materializing once prevents the
    # funnel from re-running every prefix of the pipeline per count
    # (measured 36.8 s -> ~8 s at sf0.001; same device as graph.py).
    quality = base.filter(keep_q).localCheckpoint(eager=True)
    stages.append(("quality_gate", quality))

    # 2. Corpus-LM noise filter: drop the least-predictable tail.  The LM
    # trains on the quality survivors themselves (held-in).
    scored = lm_score_docs(quality.select("doc_id", "text")).select(
        "doc_id", "avg_nll_micro"
    )
    cut = scored.agg(
        F.expr(f"percentile(avg_nll_micro, {lm_keep_pctile})").alias("cut")
    )
    lm_kept = (
        quality.join(scored, "doc_id")
        .join(F.broadcast(cut))
        .filter(F.col("avg_nll_micro") <= F.col("cut"))
        .select(*base.columns)
        .localCheckpoint(eager=True)
    )
    stages.append(("lm_filter", lm_kept))

    # 3. Exact dedup: min-doc_id keeper per content fingerprint
    from pyspark.sql.window import Window

    wfp = Window.partitionBy(fingerprint(F.col("text"))).orderBy("doc_id")
    exact = (
        lm_kept.withColumn("_rn", F.row_number().over(wfp))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .localCheckpoint(eager=True)
    )
    stages.append(("exact_dedup", exact))

    # 4. Near-dup clustering: LSH pairs → components → min-id keeper
    pairs = minhash_near_dups(exact, threshold=0.5)
    comp = connected_components(
        exact.select(F.col("doc_id").alias("id")),
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
    )
    keepers = comp.groupBy("component").agg(F.min("id").alias("keeper"))
    neardup = (
        exact.join(comp, exact.doc_id == comp.id)
        .join(keepers, "component")
        .filter(F.col("doc_id") == F.col("keeper"))
        .select(*base.columns)
        .localCheckpoint(eager=True)
    )
    stages.append(("neardup_dedup", neardup))

    # 5. Benchmark decontamination: drop docs sharing any 5-gram with the
    # eval shards
    eval_docs = docs.filter(F.col("source").isin(*EVAL_SOURCES))
    train = neardup.filter(~F.col("source").isin(*EVAL_SOURCES))
    hits = decontaminate_hits(train, eval_docs).select("doc_id")
    clean = train.join(hits, "doc_id", "left_anti").localCheckpoint(eager=True)
    stages.append(("decontaminated", clean))

    rows = []
    for i, (name, df) in enumerate(stages):
        rows.append(
            df.agg(
                F.lit(i).alias("stage_no"),
                F.lit(name).alias("stage"),
                F.count(F.lit(1)).alias("n_docs"),
                F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("n_tokens"),
            )
        )
    funnel = rows[0]
    for r in rows[1:]:
        funnel = funnel.unionByName(r)
    # 6. Sequence accounting: concat-and-chunk capacity of the survivors
    seqs = clean.agg(
        F.lit(len(stages)).alias("stage_no"),
        F.lit("packed_sequences").alias("stage"),
        F.expr(f"coalesce(sum(n_tokens), 0) div {SEQ_LEN}").alias("n_docs"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("n_tokens"),
    )
    return funnel.unionByName(seqs).orderBy("stage_no")


@register("pretrain_data_pipeline")  # rows-only: composes MinHash + LM
# (not ANSI-SQL); funnel invariants are pytest-asserted.
def pretrain_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage-by-stage yield funnel of the full curation pipeline."""
    return pretrain_funnel(spark, load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# token-budget curriculum selection
# ---------------------------------------------------------------------------

#: Fraction of the corpus's token mass the curriculum keeps.
CURRICULUM_BUDGET_FRAC = 0.3
#: Score bands for the distributed prefix-sum (monotone in score).
CURRICULUM_BANDS = 1000


def token_budget_curriculum(
    docs: DataFrame, budget_frac: float = CURRICULUM_BUDGET_FRAC
) -> DataFrame:
    """Quality-ordered selection under a token budget: rank documents by
    lexical diversity (type-token ratio) descending and keep the prefix
    whose cumulative token count fits ``budget_frac`` of the corpus's
    total tokens — the "best docs first, stop at the budget" curriculum
    cut every pretraining mix does at least once.

    A naive global ``SUM OVER (ORDER BY score)`` serialises the corpus
    through one task, so the prefix sum is computed in two phases, the
    segmented-scan shape that survives 100 TB:

    1. band docs by ``floor(score × B)`` (a VALUE band — monotone in
       score, narrow per-row expression, no sort); per-band token totals
       are one keyed aggregate, and the running offset over the ≤ B+1
       band rows is a guarded single-partition window over a provably
       tiny relation;
    2. the exact cumulative sum runs per band (``partitionBy(band)`` —
       each partition holds only that band's docs) and adds the band's
       offset.  Because the band is monotone in score, (band desc, score
       desc, doc_id) is exactly the global (score desc, doc_id) order, so
       the stitched prefix sums equal the naive global scan's.
    """
    from pyspark.sql.window import Window

    from .guards import bounded_window_guard

    toks = F.split(F.col("text"), " ")
    scored = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        (
            F.size(F.array_distinct(toks)).cast("double")
            / F.size(toks).cast("double")
        ).alias("score"),
    ).withColumn(
        "band", F.floor(F.col("score") * CURRICULUM_BANDS).cast("long")
    )
    band_tot = scored.groupBy("band").agg(F.sum("n_tokens").alias("bt"))
    w_bands = Window.orderBy(F.desc("band")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = bounded_window_guard(
        band_tot, "token_budget_curriculum", CURRICULUM_BANDS + 1
    ).select(
        "band",
        F.coalesce(F.sum("bt").over(w_bands), F.lit(0)).alias("offset"),
        F.sum("bt").over(
            Window.orderBy(F.desc("band")).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total_tokens"),
    )
    w_in_band = (
        Window.partitionBy("band")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        scored.join(F.broadcast(offsets), "band")
        .withColumn(
            "cum_tokens", F.col("offset") + F.sum("n_tokens").over(w_in_band)
        )
        .withColumn(
            "budget",
            F.floor(F.col("total_tokens") * F.lit(budget_frac)).cast("long"),
        )
    )
    return cum.filter(F.col("cum_tokens") <= F.col("budget")).select(
        "doc_id",
        "n_tokens",
        F.round(F.col("score"), 6).alias("score"),
        "cum_tokens",
    )


@register(
    "docs_token_budget_curriculum",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS score
        FROM documents
    ),
    b AS (
        SELECT CAST(FLOOR(SUM(n_tokens) * {CURRICULUM_BUDGET_FRAC}) AS BIGINT)
                   AS budget
        FROM scored
    ),
    ordered AS (
        SELECT doc_id, n_tokens, score,
               CAST(SUM(n_tokens) OVER (ORDER BY score DESC, doc_id)
                    AS BIGINT) AS cum_tokens
        FROM scored
    )
    SELECT doc_id, n_tokens, ROUND(score, 6) AS score, cum_tokens
    FROM ordered, b WHERE cum_tokens <= budget
    """,
)
def docs_token_budget_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum cut at 30% of corpus tokens, quality = type-token
    ratio.  The oracle is the naive single-scan prefix sum; the Spark
    side must reproduce it exactly from the banded two-phase plan."""
    docs = load_table(spark, sf_dir, "documents")
    return token_budget_curriculum(docs)
