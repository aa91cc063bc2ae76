"""Deterministic sampling & splitting for training-data pipelines.

``df.sample``/``randomSplit`` are seed-dependent **and partitioning-
dependent** — the same row can land in different splits when the file
layout changes, which silently leaks test data into training sets across
pipeline re-runs.  The production-safe form is *content-hash bucketing*:
a row's split is a pure function of its key, stable across runs, engines,
partitionings, and cluster sizes.

The bucket is the first 8 hex chars of ``md5(key)`` compared as a string
threshold — md5 is bit-identical in every engine (unlike xxhash64 seeds or
``rand()``), which is what makes these operators oracle-checkable and,
operationally, what makes a split reproducible years later.

All operators are narrow (no shuffle): split assignment is a per-row
projection; at 100 TB that is the difference between a sampling pass and a
sampling *job*.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from ..sources.fixtures import load_table

#: 16^8 hex space; a fraction f maps to the threshold hex string.
_HEX_SPACE = 16**8


def _hex_threshold(frac: float) -> str:
    """Hex threshold string for a keep-fraction, safe at the boundaries.

    ``frac >= 1.0`` must keep EVERY row.  ``format(16**8, "08x")`` would be
    the nine-char string ``'100000000'``, which compares lexicographically
    *below* any 8-char hash starting with '1'..'f' — silently keeping only
    ~6.25% of rows.  Instead return ``'g'``: every 8-hex-char bucket starts
    with '0'..'f' < 'g', so ``bucket < 'g'`` is uniformly true, in Spark and
    DuckDB alike (both compare strings bytewise).
    """
    if frac >= 1.0:
        return "g"
    if frac <= 0.0:
        return "00000000"
    return format(int(frac * _HEX_SPACE), "08x")


def hash_bucket(key: Column) -> Column:
    """Stable 8-hex-char bucket for a key column (uniform over [0, 16^8))."""
    return F.substring(F.md5(key.cast("string")), 1, 8)


def split_column(key: Column, train_frac: float = 0.8) -> Column:
    """'train' / 'test' assignment as a pure function of the key."""
    return F.when(
        hash_bucket(key) < F.lit(_hex_threshold(train_frac)), F.lit("train")
    ).otherwise(F.lit("test"))


def deterministic_sample(df: DataFrame, key: Column, frac: float) -> DataFrame:
    """Keep ~frac of rows, chosen by key hash — the same rows every run."""
    if frac >= 1.0:
        return df  # keep-all: no filter, no hash evaluation
    return df.filter(hash_bucket(key) < F.lit(_hex_threshold(frac)))


def stratified_sample(
    df: DataFrame, key: Column, stratum: Column, fractions: dict[str, float]
) -> DataFrame:
    """Per-stratum deterministic sampling (``sampleBy`` without the seed
    fragility): each stratum value gets its own hash threshold."""
    thr = None
    for value, frac in fractions.items():
        branch = (stratum == value, F.lit(_hex_threshold(frac)))
        thr = F.when(*branch) if thr is None else thr.when(*branch)
    thr = thr.otherwise(F.lit("00000000"))  # unlisted strata: drop
    return df.filter(hash_bucket(key) < thr)


@register(
    "split_train_test",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{_hex_threshold(0.8)}'
                THEN 'train' ELSE 'test' END AS split
    FROM documents
    ORDER BY doc_id
    """,
)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/20 content-hash train/test split of the documents corpus —
    reproducible across engines and partitionings (same md5, same split)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", split_column(F.col("doc_id"), 0.8).alias("split")
    ).orderBy("doc_id")


#: Mixture-sampling knobs: α=0.5 temperature (sqrt weighting) and a target
#: of half the corpus.  Weights are FLOOR(SQRT(count)) **integers** so both
#: engines sum them exactly; the single double division that produces the
#: rate is then IEEE-identical in Spark and DuckDB, which is what lets a
#: *data-derived* sampling rate be oracle-checked at all (a float sum over
#: groups would be summation-order-dependent and engine-divergent).
MIXTURE_TARGET_FRAC = 0.5
_HEX_SPACE_SQL = 4294967296  # 16^8, as a literal for the oracle


def mixture_rates(docs: DataFrame, domain: str = "lang") -> DataFrame:
    """Per-domain temperature-scaled sampling rates from corpus counts.

    rate_d = target_total * w_d / (Σw * c_d) with w_d = floor(sqrt(c_d)):
    dominant domains are downsampled hardest, rare domains kept nearly
    whole — the mixture-reweighting pass of a pre-training pipeline.
    The counts aggregate is O(domains); everything stays in the plan (no
    driver math), so the rates recompute consistently on any corpus.
    """
    counts = docs.groupBy(domain).agg(F.count("*").alias("c"))
    w = F.floor(F.sqrt(F.col("c"))).cast("bigint")
    tot = counts.agg(
        F.sum("c").alias("n"),
        F.sum(F.floor(F.sqrt(F.col("c"))).cast("bigint")).alias("wsum"),
    )
    rate = (
        F.col("n").cast("double")
        * MIXTURE_TARGET_FRAC
        * w
        / (F.col("wsum") * F.col("c"))
    )
    thr = F.least(
        F.floor(rate * _HEX_SPACE_SQL).cast("bigint"), F.lit(_HEX_SPACE_SQL - 1)
    )
    return counts.crossJoin(tot).select(
        domain, F.format_string("%08x", thr).alias("thr_hex")
    )


@register(
    "docs_mixture_sample",
    oracle=f"""
    WITH counts AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
                   CAST(SUM(CAST(FLOOR(SQRT(CAST(c AS DOUBLE))) AS BIGINT)) AS BIGINT) AS wsum
            FROM counts),
    rates AS (
        SELECT lang,
               printf('%08x', LEAST(
                   CAST(FLOOR(CAST(n AS DOUBLE) * {MIXTURE_TARGET_FRAC}
                        * CAST(FLOOR(SQRT(CAST(c AS DOUBLE))) AS BIGINT)
                        / (wsum * c) * {_HEX_SPACE_SQL}) AS BIGINT),
                   {_HEX_SPACE_SQL - 1})) AS thr_hex
        FROM counts, tot
    )
    SELECT d.doc_id AS doc_id, d.lang AS lang
    FROM documents d JOIN rates r USING (lang)
    WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < r.thr_hex
    ORDER BY d.doc_id
    """,
)
def docs_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture sampling over the language domains:
    rates derived from the corpus itself (α=0.5, half-corpus target),
    applied as a deterministic md5-threshold filter via a broadcast join
    of the O(domains) rate table — one tiny aggregate plus one narrow
    filter pass at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    rates = mixture_rates(docs, "lang")
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(hash_bucket(F.col("doc_id")) < F.col("thr_hex"))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


@register(
    "stratified_event_sample",
    oracle=f"""
    SELECT event_id, event_type
    FROM events
    WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 8) <
          CASE event_type
               WHEN 'view' THEN '{_hex_threshold(0.1)}'
               WHEN 'click' THEN '{_hex_threshold(0.5)}'
               ELSE '{_hex_threshold(1.0)}'
          END
    ORDER BY event_id
    """,
)
def stratified_event_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling: keep 10% of views, 50% of clicks, all rare
    events — the class-rebalancing pass of a training pipeline, as a
    narrow deterministic filter."""
    events = load_table(spark, sf_dir, "events")
    return (
        stratified_sample(
            events,
            key=F.col("event_id"),
            stratum=F.col("event_type"),
            fractions={
                "view": 0.1,
                "click": 0.5,
                "signup": 1.0,
                "purchase": 1.0,
                "error": 1.0,
            },
        )
        .select("event_id", "event_type")
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# k-fold cross-validation split
# ---------------------------------------------------------------------------

#: Fold count.  16 % K == 0 keeps the single-hex-digit fold assignment
#: exactly uniform over the md5 space (no modulo bias).
KFOLD_K = 4

#: Portable hex-digit value: both engines index the same alphabet, so the
#: fold is a pure cross-engine function of the key.
_HEX_ALPHABET = "0123456789abcdef"


def kfold_column(key: Column, k: int = KFOLD_K) -> Column:
    """Fold assignment in [0, k): last md5 hex digit of the key, mod k.

    Same stability contract as :func:`split_column` — a row's fold is a
    pure function of its key, immune to partitioning, seeds, and cluster
    size, so fold N's held-out set is identical in every re-run and every
    engine (the property that makes cross-validation results comparable
    across experiments months apart)."""
    digit = F.substring(F.md5(key.cast("string")), 32, 1)
    return (F.instr(F.lit(_HEX_ALPHABET), digit) - 1) % k


@register(
    "split_kfold",
    oracle=f"""
    SELECT (strpos('{_HEX_ALPHABET}',
                   substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1)
               % {KFOLD_K} AS fold,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM documents
    GROUP BY 1
    ORDER BY fold
    """,
)
def split_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold assignment over the documents corpus with
    per-fold evidence (count, char mass, id bounds).  Narrow: the fold is
    a projection; the only shuffle is the O(k)-row audit aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("fold", kfold_column(F.col("doc_id")))
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("fold")
    )


# ---------------------------------------------------------------------------
# deterministic weighted sampling (priority sampling)
# ---------------------------------------------------------------------------

#: Samples kept per stratum.
WEIGHTED_SAMPLE_K = 10
#: Priority scale: hash-uniform × SCALE div weight stays well inside int64
#: (16^6 · 10^9 ≈ 1.7·10^16).
_WSAMPLE_SCALE = 1_000_000_000


#: Priority semantics — a deterministic, integer-exact analogue of
#: Efraimidis–Spirakis A-ES weighted reservoir sampling: A-ES ranks by
#: u^(1/w) (equivalently Exp(w) clocks); here the exponential transform
#: is replaced by a weight-scaled uniform — priority = (u24+1)·SCALE
#: div w, smaller wins, heavier rows win proportionally more often.  The
#: selection is a pure function of the key (re-run / engine /
#: partitioning stable) and every quantity is exact BIGINT arithmetic so
#: the oracle hash-matches.  The trade: exact A-ES inclusion
#: probabilities need floats and libm (ln/pow), which are NOT
#: bit-portable across engines — that is the documented float tier if
#: exact PPSWOR semantics are ever required.


@register(
    "docs_weighted_sample",
    oracle=f"""
    WITH pr AS (
        SELECT doc_id, lang, n_chars,
               ((strpos('{_HEX_ALPHABET}', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 1048576
                + (strpos('{_HEX_ALPHABET}', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 65536
                + (strpos('{_HEX_ALPHABET}', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 4096
                + (strpos('{_HEX_ALPHABET}', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) * 256
                + (strpos('{_HEX_ALPHABET}', substr(md5(CAST(doc_id AS VARCHAR)), 5, 1)) - 1) * 16
                + (strpos('{_HEX_ALPHABET}', substr(md5(CAST(doc_id AS VARCHAR)), 6, 1)) - 1)
                + 1) * {_WSAMPLE_SCALE} // n_chars AS priority
        FROM documents
    )
    SELECT lang, doc_id, CAST(priority AS BIGINT) AS priority,
           CAST(rn AS INT) AS rank
    FROM (
        SELECT lang, doc_id, priority,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY priority, doc_id) AS rn
        FROM pr
    )
    WHERE rn <= {WEIGHTED_SAMPLE_K}
    ORDER BY lang, rank
    """,
)
def docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language weighted sample of documents, weight = n_chars: long
    documents are proportionally more likely to be picked — the
    byte-budget-aware corpus subsampling pass (sample by content mass,
    not row count).  Deterministic integer priorities, top-K per stratum
    via one windowed rank."""
    docs = load_table(spark, sf_dir, "documents")
    # CAST before arithmetic: conv() returns STRING, and string + int
    # coerces to DOUBLE, which loses integer exactness above 2^53 —
    # priorities reach ~1.7e16, so the whole expression must stay BIGINT.
    pr = docs.select(
        "lang",
        "doc_id",
        F.expr(
            "(CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 6),"
            " 16, 10) AS BIGINT)"
            f" + 1) * {_WSAMPLE_SCALE} div n_chars"
        ).alias("priority"),
    )
    w = W.partitionBy("lang").orderBy("priority", "doc_id")
    return (
        pr.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= WEIGHTED_SAMPLE_K)
        .select("lang", "doc_id", "priority", "rank")
        .orderBy("lang", "rank")
    )


# ---------------------------------------------------------------------------
# per-user contribution capping
# ---------------------------------------------------------------------------

#: Max events any single user may contribute per event type.
CONTRIBUTION_CAP = 5


@register(
    "events_contribution_capped",
    oracle=f"""
    WITH kept AS (
        SELECT event_type, user_id
        FROM (
            SELECT event_type, user_id,
                   row_number() OVER (PARTITION BY event_type, user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events
        )
        WHERE rn <= {CONTRIBUTION_CAP}
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS raw_events,
           CAST((SELECT COUNT(*) FROM kept k
                 WHERE k.event_type = e.event_type) AS BIGINT) AS capped_events,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
           CAST((SELECT COUNT(*) FROM kept k
                 WHERE k.event_type = e.event_type) * 1000000
                // COUNT(*) AS BIGINT) AS kept_ppm
    FROM events e
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
)
def events_contribution_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user contribution capping — the data-balancing / DP-style
    preprocessing pass: no user contributes more than
    :data:`CONTRIBUTION_CAP` events per type (earliest kept,
    deterministic (ts, event_id) order), reported as raw vs capped
    counts per type with the kept ratio in exact ppm.

    The cap bounds any single key's influence on downstream statistics
    (heavy-user domination, DP sensitivity, dedup-skew all at once).
    Plan: one (type, user) window for the rank — the same exchange then
    serves the capped aggregate; min(cap·users, raw) arithmetic never
    leaves the executors."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    ranked = events.select(
        "event_type", "user_id", F.row_number().over(w).alias("rn")
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("raw_events"),
            F.count(F.when(F.col("rn") <= CONTRIBUTION_CAP, 1)).alias(
                "capped_events"
            ),
            F.count_distinct("user_id").alias("n_users"),
        )
        .select(
            "event_type",
            "raw_events",
            "capped_events",
            "n_users",
            F.expr("capped_events * 1000000 div raw_events").alias("kept_ppm"),
        )
        .orderBy("event_type")
    )


#: Stratified sampling fraction (numerator/denominator kept integer so the
#: per-stratum quota ceil(n * NUM / DEN) is exact in both engines).
STRAT_SAMPLE_NUM, STRAT_SAMPLE_DEN = 1, 5


@register(
    "docs_stratified_sample",
    oracle=f"""
    WITH ranked AS (
        SELECT lang, doc_id, n_chars,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY lang) AS n_lang
        FROM documents
    )
    SELECT lang, doc_id, n_chars, CAST(rn AS BIGINT) AS rank,
           CAST(n_lang AS BIGINT) AS stratum_size
    FROM ranked
    WHERE rn * {STRAT_SAMPLE_DEN} <= n_lang * {STRAT_SAMPLE_NUM}
       OR rn = 1
    ORDER BY lang, rank
    """,
)
def docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportional-allocation stratified sample: EXACTLY
    floor(n·1/5) documents from every language stratum (minimum one, so
    rare strata are never silently dropped — the long-tail-language
    guarantee a plain Bernoulli ``sample()`` cannot give).  Selection
    order is the md5 of the key — a deterministic, engine-portable
    permutation, so the sample is reproducible AND hash-checkable
    against DuckDB, unlike ``rand(seed)`` which is engine-private.

    The quota predicate ``rank·DEN <= n·NUM`` stays in integers (no
    float fraction), and both the rank and the stratum size come from
    the SAME window pass — one shuffle by lang.  Skew note: strata are
    languages, bounded cardinality; a hot stratum parallelizes the sort
    within its partition range, and at 100 TB the md5 ranking keys can
    pre-aggregate per file via the same expression (the permutation is
    content-deterministic, not partition-dependent)."""
    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = docs.select("lang", "doc_id", "n_chars").withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).withColumn(
        "stratum_size",
        F.count(F.lit(1)).over(W.partitionBy("lang")).cast("long"),
    )
    return (
        ranked.filter(
            (F.col("rank") * STRAT_SAMPLE_DEN
             <= F.col("stratum_size") * STRAT_SAMPLE_NUM)
            | (F.col("rank") == 1)
        )
        .select("lang", "doc_id", "n_chars", "rank", "stratum_size")
        .orderBy("lang", "rank")
    )


@register(
    "split_group_holdout",
    oracle=f"""
    SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                     < '{_hex_threshold(0.8)}'
                THEN 'train' ELSE 'test' END AS fold,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(MIN(event_id) AS BIGINT) AS min_event,
           CAST(MAX(event_id) AS BIGINT) AS max_event
    FROM events
    GROUP BY 1
    ORDER BY fold
    """,
)
def split_group_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-aware train/test split: the fold is a function of the GROUP
    key (user_id), not the row key, so every event of a user lands on the
    same side — the leakage guard row-level splitting cannot give.  A
    model evaluated on ``test`` has never seen ANY behavior of those
    users; with ``split_train_test``'s row hashing, a user's history
    straddles the boundary and the eval leaks.

    Pure narrow projection (the fold is md5 of a column already on the
    row — no join against a user table needed); the audit aggregate is
    the only shuffle.  Same md5-threshold portability contract as the
    other splits: identical assignment in every engine, every run, every
    partitioning.  tests/test_sampling.py pins the no-straddle invariant
    (no user_id appears in both folds)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(
            split_column(F.col("user_id"), 0.8).alias("fold"),
            "user_id",
            "event_type",
            "event_id",
        )
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.countDistinct("event_type").alias("n_types"),
            F.min("event_id").alias("min_event"),
            F.max("event_id").alias("max_event"),
        )
        .orderBy("fold")
    )


def _frac_tenths_case(expr: str) -> str:
    """CASE mapping a fractional-tenths expression (0..9) to the md5-hex
    threshold admitting exactly that fraction of keys — shared verbatim
    by the Spark builder (via F.expr) and the DuckDB oracle so the extra
    replica decision is engine-portable."""
    branches = "\n          ".join(
        f"WHEN {t} THEN '{_hex_threshold(t / 10)}'" for t in range(10)
    )
    return f"(CASE {expr}\n          {branches}\n          END)"


#: Fractional-epoch schedule: source srcN repeats 1 + ((7·N) % 23)/10
#: epochs (1.0 … 3.2) — floor(w) full copies plus one extra with
#: probability frac(w), decided by the document's md5 bucket.
_EPOCH_TENTHS = "(10 + (%s * 7) %% 23)"


@register(
    "docs_epoch_upsample",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, source,
               {_EPOCH_TENTHS % "CAST(substr(source, 4) AS INT)"} AS w10,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h
        FROM documents
    ), reps AS (
        SELECT doc_id, source, w10,
               w10 // 10
               + CASE WHEN h < {_frac_tenths_case("w10 % 10")}
                      THEN 1 ELSE 0 END AS n_reps
        FROM base
    )
    SELECT doc_id, source, CAST(n_reps AS INT) AS n_reps,
           CAST(unnest(generate_series(1, n_reps)) AS INT) AS rep_idx
    FROM reps
    ORDER BY doc_id, rep_idx
    """,
)
def docs_epoch_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional-epoch corpus REPETITION — the upsampling half of mixture
    weighting (docs_mixture_sample only samples DOWN): source srcN is
    scheduled for 1.0–3.2 epochs; each document materializes floor(w)
    replicas plus one more iff its md5 bucket clears the frac(w)
    threshold, so a 2.3-epoch source repeats every doc twice and a
    deterministic, engine-portable 30% of docs a third time.  The
    replica index rides along so downstream shuffles can decorrelate
    copies.

    Plan: one narrow projection computes the replica count; ``explode(
    sequence(...))`` expands JVM-side — no Python, no join, output
    exactly Σ n_reps rows.  At 100 TB upsampling-by-repetition is how
    mixture weights > 1 are realized ahead of sequence packing."""
    docs = load_table(spark, sf_dir, "documents")
    num = F.substring("source", 4, 10).cast("int")
    w10 = F.expr(_EPOCH_TENTHS % "CAST(substr(source, 4) AS INT)")
    thr = F.expr(_frac_tenths_case("(10 + (CAST(substr(source, 4) AS INT) * 7) % 23) % 10"))
    reps = (w10 / 10).cast("int") + F.when(
        hash_bucket(F.col("doc_id")) < thr, 1
    ).otherwise(0)
    return (
        docs.select(
            "doc_id",
            "source",
            reps.cast("int").alias("n_reps"),
        )
        .select(
            "doc_id",
            "source",
            "n_reps",
            F.explode(F.sequence(F.lit(1), F.col("n_reps"))).alias("rep_idx"),
        )
        .orderBy("doc_id", "rep_idx")
    )


@register(
    "split_temporal_holdout",
    # Temporal train/embargo/test split: first 70% of the observed day
    # span trains, a 2-day embargo is discarded, the rest tests - the
    # time-series-safe split (random splits leak future into past; the
    # embargo kills boundary leakage from windowed features).
    oracle="""
    WITH anchor AS (
        SELECT CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1
        FROM events
    ),
    labeled AS (
        SELECT e.user_id, CAST(e.ts AS DATE) AS d,
               CASE WHEN CAST(e.ts AS DATE) < a.d0
                         + (date_diff('day', a.d0, a.d1) * 7 // 10)
                         * INTERVAL 1 DAY THEN 'train'
                    WHEN CAST(e.ts AS DATE) < a.d0
                         + ((date_diff('day', a.d0, a.d1) * 7 // 10) + 2)
                         * INTERVAL 1 DAY THEN 'embargo'
                    ELSE 'test' END AS split
        FROM events e, anchor a
    ),
    train_users AS (
        SELECT DISTINCT user_id FROM labeled WHERE split = 'train'
    )
    SELECT l.split,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT l.user_id) AS BIGINT) AS n_users,
           CAST(MIN(l.d) AS TIMESTAMP) AS min_day,
           CAST(MAX(l.d) AS TIMESTAMP) AS max_day,
           CAST(COUNT(DISTINCT CASE WHEN t.user_id IS NOT NULL
                                    THEN l.user_id END) AS BIGINT)
               AS users_shared_with_train
    FROM labeled l LEFT JOIN train_users t ON t.user_id = l.user_id
    GROUP BY l.split ORDER BY l.split
    """,
)
def split_temporal_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal holdout with an embargo gap: train on the first 70% of
    the day span, discard the next 2 days, test on the remainder —
    the leakage-safe split for any model with lookback features (a
    random split lets trailing-window features straddle the boundary;
    the embargo guarantees no training window reaches into test time).
    Reports per split the row/user counts, the day range, and how many
    of its users also appear in train (expected overlap for user-level
    features — surfaced so the modeler SEES it, the quantity
    ``split_group_holdout`` drives to zero).

    Plan: the 1-row (min, max) anchor broadcasts; labeling is a per-row
    CASE against two literal-derived dates; the rollup is O(3 splits)
    and the train-user overlap is one distinct-key join."""
    events = load_table(spark, sf_dir, "events")
    anchor = events.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    labeled = (
        events.join(F.broadcast(anchor))
        .select(
            "user_id",
            F.col("ts").cast("date").alias("d"),
            F.expr(
                "CASE WHEN CAST(ts AS DATE) < date_add(d0,"
                " CAST(datediff(d1, d0) * 7 div 10 AS INT)) THEN 'train'"
                " WHEN CAST(ts AS DATE) < date_add(d0,"
                " CAST(datediff(d1, d0) * 7 div 10 + 2 AS INT))"
                " THEN 'embargo' ELSE 'test' END"
            ).alias("split"),
        )
    )
    train_users = (
        labeled.filter(F.col("split") == "train")
        .select("user_id")
        .distinct()
        .withColumn("in_train", F.lit(1))
    )
    return (
        labeled.join(train_users, "user_id", "left")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("d").cast("timestamp").alias("min_day"),
            F.max("d").cast("timestamp").alias("max_day"),
            F.countDistinct(
                F.when(F.col("in_train").isNotNull(), F.col("user_id"))
            ).alias("users_shared_with_train"),
        )
        .orderBy("split")
    )
