"""Classifier evaluation metrics and coverage-driven data selection.

A curation pipeline doesn't just RUN filters — it has to EVALUATE them
before trusting them with 100 TB.  This module adds the standard offline
evaluation battery, expressed as exact-integer distributed plans, plus a
submodular subset-selection operator:

* **ROC AUC** (``classifier_auc_eval``) — per-language AUC of the hashed
  linear quality scorer (classify.py) against the Gopher rule gate
  (text.py) as ground truth: "does the cheap map-only model reproduce
  the expensive rule battery?" — the question asked before swapping a
  trained filter into a pipeline.  Computed by the Mann-Whitney rank-sum
  identity, NOT a threshold sweep.
* **Reliability / calibration bins** (``classifier_calibration_bins``) —
  the reliability-diagram table: empirical positive rate per predicted-
  score decile band.
* **Markov stationary distribution** (``events_markov_stationary``) —
  steady state of the behavioural event-transition chain by fixed-round
  power iteration (where does a user's journey settle?).
* **Greedy max-coverage selection** (``docs_coverage_greedy``) — the
  classic submodular data-selection step: pick K documents maximising
  marginal new-vocabulary coverage (facility-location-style subset
  selection for training-data curation).

Numeric discipline (the registry's portability rules):

* AUC avoids per-row real arithmetic entirely: the ranking key is a
  non-negative integer milli-score, tie handling uses the
  ``min_rank + max_rank`` identity (2× the average rank, always an
  integer), and the AUC itself is emitted as an exact integer
  numerator/denominator pair plus a 6-dp convenience quotient.
* Power iteration runs in integer ppt (parts-per-10^12) with explicit
  ``div`` at each edge term, so both engines replay bit-identical
  rounds — the graph.py temporal-reach pattern applied to mass instead
  of timestamps.

Scale design: AUC/calibration aggregate to O(distinct score buckets)
(≤1001 per language, by construction of the milli-score) BEFORE any
window; the rank pass is a per-language window over that bounded bucket
relation, never over raw rows.  The greedy loop's only driver-side data
is ONE winner row per round (K total).

The reference engine (/root/reference/script.js) has no evaluation
operators; this extends the mandated LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.fixtures import load_table
from .classify import N_WEIGHT_BUCKETS, weight_of
from .dedup import PORTABLE_HASH60_SQL
from .text import (
    GOPHER_MAX_MEAN_WORD_LEN,
    GOPHER_MAX_SYMBOL_RATIO,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_ALPHA_WORD_FRAC,
    GOPHER_MIN_MEAN_WORD_LEN,
    GOPHER_MIN_STOPWORD_HITS,
    GOPHER_MIN_WORDS,
    STOPWORDS,
    _sql_in_list,
)

#: Max per-token weight magnitude of the hashed scorer (classify.py's
#: weights are ``hash % N_WEIGHT_BUCKETS`` centred on zero).
_W_MAX = (N_WEIGHT_BUCKETS - 1) // 2


def _scored_labeled(docs: DataFrame) -> DataFrame:
    """One map-only pass producing BOTH the model score and the ground-
    truth label per document — score and label are projections over the
    same row, so no join ever happens (the eval is as scan-bound as the
    filters themselves).

    ``mw`` is the milli-score: the per-token mean weight shifted to be
    non-negative and quantized to [0, 1000] —
    ``(score_sum + W·n) · 1000 div (2·W·n)`` — all non-negative integer
    arithmetic, so Spark ``div`` and DuckDB ``//`` agree exactly.
    """
    toks = F.split(F.col("text"), " ")
    n_words = F.size(toks)
    score = F.aggregate(
        F.transform(toks, weight_of), F.lit(0).cast("long"), lambda a, x: a + x
    )
    mean_wl = (
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
        / n_words
    )
    sym_ratio = (
        F.regexp_count(F.col("text"), F.lit("#|\\.\\.\\.")).cast("double")
        / n_words
    )
    alpha_frac = (
        F.size(F.filter(toks, lambda x: x.rlike("[a-z]"))).cast("double")
        / n_words
    )
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    keep = (
        n_words.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & mean_wl.between(GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MAX_MEAN_WORD_LEN)
        & (sym_ratio < GOPHER_MAX_SYMBOL_RATIO)
        & (alpha_frac >= GOPHER_MIN_ALPHA_WORD_FRAC)
        & (stop_hits >= GOPHER_MIN_STOPWORD_HITS)
    )
    return docs.select(
        "doc_id",
        "lang",
        F.size(toks).cast("long").alias("n_tokens"),
        score.alias("score_sum"),
        keep.cast("int").alias("y"),
    ).withColumn(
        "mw",
        F.expr(
            f"(score_sum + {_W_MAX} * n_tokens) * 1000 "
            f"div ({2 * _W_MAX} * n_tokens)"
        ),
    )


#: Shared oracle CTE: score + label + milli-score per document.
_SCORED_SQL = f"""
    scored AS (
        SELECT doc_id, lang,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(list_sum(list_transform(
                   string_split(text, ' '),
                   tok -> {PORTABLE_HASH60_SQL.format(s='tok')}
                          % {N_WEIGHT_BUCKETS} - {_W_MAX}
               )) AS BIGINT) AS score_sum,
               CAST(
                 len(string_split(text, ' '))
                     BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
                 AND CAST(len(replace(text, ' ', '')) AS DOUBLE)
                     / len(string_split(text, ' '))
                     BETWEEN {GOPHER_MIN_MEAN_WORD_LEN}
                         AND {GOPHER_MAX_MEAN_WORD_LEN}
                 AND CAST(len(regexp_extract_all(text, '#|\\.\\.\\.'))
                     AS DOUBLE) / len(string_split(text, ' '))
                     < {GOPHER_MAX_SYMBOL_RATIO}
                 AND CAST(len(list_filter(string_split(text, ' '),
                              x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
                     / len(string_split(text, ' '))
                     >= {GOPHER_MIN_ALPHA_WORD_FRAC}
                 AND len(list_filter(string_split(text, ' '),
                         x -> x IN ({_sql_in_list(STOPWORDS)})))
                     >= {GOPHER_MIN_STOPWORD_HITS}
               AS INT) AS y
        FROM documents
    ),
    mscored AS (
        SELECT doc_id, lang, y,
               (score_sum + {_W_MAX} * n_tokens) * 1000
                   // ({2 * _W_MAX} * n_tokens) AS mw
        FROM scored
    )
"""


def auc_from_buckets(buckets: DataFrame) -> DataFrame:
    """Per-group ROC AUC from additive (group, mw, cnt, pos) score-bucket
    sufficient statistics, via the Mann-Whitney rank-sum identity.

    The bucket relation is what makes this 100 TB-shaped: raw rows reduce
    to ≤1001 buckets per group in ONE map-side-combinable aggregation
    (done by the caller), the ranking window runs over that bounded
    relation, and — because bucket counts are additive — the same
    statistics merge across batches, partitions, or days (the streaming
    twin folds stored per-batch partials through this exact tail).

    Tie handling is exact: for a bucket spanning ranks [min_rank,
    max_rank], every member's average rank is (min_rank + max_rank)/2, so
    2·Σ(avg ranks of positives) = Σ pos·(min_rank + max_rank) — an
    integer.  AUC = (that − P·(P+1)) / (2·P·N), emitted as the exact
    integer pair (auc_num, auc_den) plus a rounded quotient.
    """
    w = (
        Window.partitionBy("lang")
        .orderBy("mw")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = buckets.select(
        "lang",
        "pos",
        "cnt",
        (F.coalesce(F.sum("cnt").over(w), F.lit(0)) + 1).alias("min_rank"),
    ).withColumn("max_rank", F.col("min_rank") + F.col("cnt") - 1)
    agg = ranked.groupBy("lang").agg(
        F.sum("pos").alias("n_pos"),
        (F.sum("cnt") - F.sum("pos")).alias("n_neg"),
        F.sum(F.col("pos") * (F.col("min_rank") + F.col("max_rank"))).alias(
            "rank_sum2_pos"
        ),
    )
    return (
        agg.select(
            "lang",
            "n_pos",
            "n_neg",
            "rank_sum2_pos",
            (
                F.col("rank_sum2_pos")
                - F.col("n_pos") * (F.col("n_pos") + 1)
            ).alias("auc_num"),
            (F.lit(2) * F.col("n_pos") * F.col("n_neg")).alias("auc_den"),
        )
        .withColumn(
            "auc",
            F.when(
                F.col("auc_den") > 0,
                F.round(F.col("auc_num") / F.col("auc_den"), 6),
            ),
        )
        .orderBy("lang")
    )


_AUC_TAIL_SQL = """
    buckets AS (
        SELECT lang, mw,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(y) AS BIGINT) AS pos
        FROM mscored GROUP BY lang, mw
    ),
    ranked AS (
        SELECT lang, pos, cnt,
               COALESCE(SUM(cnt) OVER (
                   PARTITION BY lang ORDER BY mw
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) + 1 AS min_rank
        FROM buckets
    ),
    peraug AS (
        SELECT lang, pos, cnt, min_rank,
               min_rank + cnt - 1 AS max_rank
        FROM ranked
    ),
    agg AS (
        SELECT lang,
               CAST(SUM(pos) AS BIGINT) AS n_pos,
               CAST(SUM(cnt) - SUM(pos) AS BIGINT) AS n_neg,
               CAST(SUM(pos * (min_rank + max_rank)) AS BIGINT)
                   AS rank_sum2_pos
        FROM peraug GROUP BY lang
    )
    SELECT lang, n_pos, n_neg, rank_sum2_pos,
           CAST(rank_sum2_pos - n_pos * (n_pos + 1) AS BIGINT) AS auc_num,
           CAST(2 * n_pos * n_neg AS BIGINT) AS auc_den,
           CASE WHEN 2 * n_pos * n_neg > 0
                THEN ROUND(CAST(rank_sum2_pos - n_pos * (n_pos + 1)
                           AS DOUBLE) / (2 * n_pos * n_neg), 6)
           END AS auc
    FROM agg
    ORDER BY lang
"""


@register(
    "classifier_auc_eval",
    oracle=f"WITH {_SCORED_SQL}, {_AUC_TAIL_SQL}",
)
def classifier_auc_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language ROC AUC of the hashed linear scorer against the
    Gopher gate, by the exact rank-sum identity over score buckets."""
    scored = _scored_labeled(load_table(spark, sf_dir, "documents"))
    buckets = scored.groupBy("lang", "mw").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("pos")
    )
    return auc_from_buckets(buckets)


@register(
    "classifier_calibration_bins",
    oracle=f"""
    WITH {_SCORED_SQL}
    SELECT lang,
           (mw * 10) // 1001 AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           CAST(SUM(y) * 1000000 // COUNT(*) AS BIGINT) AS pos_rate_ppm,
           CAST(SUM(mw) // COUNT(*) AS BIGINT) AS mean_mw_milli
    FROM mscored
    GROUP BY lang, (mw * 10) // 1001
    ORDER BY lang, bin
    """,
)
def classifier_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram table: per (language, score-decile band) the
    empirical positive rate vs the band's mean score — the calibration
    check run before using a score as a sampling weight.  One hash
    aggregation over O(langs × 10) groups; integer ppm throughout."""
    scored = _scored_labeled(load_table(spark, sf_dir, "documents"))
    return (
        scored.withColumn("bin", F.expr("(mw * 10) div 1001"))
        .groupBy("lang", "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").alias("n_pos"),
            F.expr("sum(y) * 1000000 div count(1)").alias("pos_rate_ppm"),
            F.expr("sum(mw) div count(1)").alias("mean_mw_milli"),
        )
        .orderBy("lang", "bin")
    )


# ---------------------------------------------------------------------------
# Markov stationary distribution (behavioural steady state)
# ---------------------------------------------------------------------------

#: Power-iteration rounds.  The 5-state behavioural chain mixes in a
#: handful of rounds; both engines replay the SAME count, so the
#: comparison is exact even short of full convergence.
MARKOV_ROUNDS = 8

#: Probability scale: parts-per-10^12 keeps floor-loss negligible while
#: bounding every edge term (pi·cnt ≤ 10^12 · |edges|) far inside int64.
MARKOV_SCALE = 10**12


def markov_stationary(
    events: DataFrame, rounds: int = MARKOV_ROUNDS
) -> DataFrame:
    """Stationary distribution of the per-user event-transition chain by
    ``rounds`` of integer power iteration.

    Transitions are consecutive same-user events (the sessionize window);
    each round redistributes probability mass along row-normalised
    transition counts: ``pi'(v) = Σ_u (pi(u) · cnt(u,v)) div outdeg(u)``
    — all non-negative int64, so both engines floor identically and the
    replay is bit-exact.  Masses are parts-per-10^12; per-round floor
    loss is ≤|edges| parts, irrelevant at 6-dp reporting.

    Scale shape: the transition-count build is ONE user-keyed window +
    one groupBy over (u, v) — O(event-type²) output regardless of row
    count; each iteration round joins that tiny relation against the
    O(|states|) mass table (broadcast both ways).  The iteration cost is
    independent of corpus size.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        events.select("user_id", "event_id", "ts", "event_type")
        .withColumn("u", F.lag("event_type").over(w))
        .filter(F.col("u").isNotNull())
        .groupBy("u", F.col("event_type").alias("v"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_out = Window.partitionBy("u")
    edges = trans.withColumn(
        "outdeg", F.sum("cnt").over(w_out)
    ).localCheckpoint(eager=True)
    nodes = events.select(F.col("event_type").alias("v")).distinct()
    n_states = nodes.count()
    pi = nodes.select("v", F.lit(MARKOV_SCALE // n_states).alias("pi"))
    for _ in range(rounds):
        pi = (
            edges.join(F.broadcast(pi.withColumnRenamed("v", "u")), "u")
            .select("v", F.expr("pi * cnt div outdeg").alias("m"))
            .groupBy("v")
            .agg(F.sum("m").alias("pi"))
            .localCheckpoint(eager=False)
        )
    return (
        nodes.join(pi, "v", "left")
        .select(
            F.col("v").alias("event_type"),
            F.coalesce(F.col("pi"), F.lit(0)).alias("pi_scaled"),
            F.expr(f"coalesce(pi, 0) div {10**6}").alias("share_ppm"),
        )
        .orderBy("event_type")
    )


def _markov_oracle() -> str:
    """Unrolled fixed-round integer power iteration (graph.py's
    temporal-reach oracle pattern: replay the builder's exact rounds)."""
    prev = "pi0"
    ctes = [
        f"""pi0 AS (
        SELECT v, CAST({MARKOV_SCALE} // (SELECT COUNT(*) FROM nodes)
               AS BIGINT) AS pi
        FROM nodes
    )"""
    ]
    for k in range(1, MARKOV_ROUNDS + 1):
        ctes.append(
            f"""pi{k} AS (
        SELECT e.v, CAST(SUM((p.pi * e.cnt) // e.outdeg) AS BIGINT) AS pi
        FROM edges e JOIN {prev} p ON p.v = e.u
        GROUP BY e.v
    )"""
        )
        prev = f"pi{k}"
    return (
        """
    WITH seq AS (
        SELECT user_id, event_id, ts, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS u
        FROM events
    ),
    trans AS (
        SELECT u, event_type AS v, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM seq WHERE u IS NOT NULL GROUP BY u, event_type
    ),
    edges AS (
        SELECT u, v, cnt, SUM(cnt) OVER (PARTITION BY u) AS outdeg
        FROM trans
    ),
    nodes AS (SELECT DISTINCT event_type AS v FROM events),
    """
        + ",\n    ".join(ctes)
        + f"""
    SELECT n.v AS event_type,
           CAST(COALESCE(p.pi, 0) AS BIGINT) AS pi_scaled,
           COALESCE(p.pi, 0) // {10**6} AS share_ppm
    FROM nodes n LEFT JOIN {prev} p USING (v)
    ORDER BY n.v
    """
    )


@register("events_markov_stationary", oracle=_markov_oracle())
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Steady state of the behavioural transition chain (integer power
    iteration, bit-exact across engines)."""
    return markov_stationary(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Greedy max-coverage subset selection (submodular data selection)
# ---------------------------------------------------------------------------

#: Documents to select.  Greedy gives the classic (1 − 1/e) guarantee for
#: monotone submodular coverage; K rounds = K bounded Spark jobs.
COVERAGE_K = 5


def coverage_greedy(
    spark: SparkSession, docs: DataFrame, k: int = COVERAGE_K
) -> DataFrame:
    """Select ``k`` documents greedily maximising marginal new word-bigram
    coverage (ties → lowest doc_id).  Returns one row per selection round:
    (sel_round, doc_id, marginal_gain, covered_total).

    The submodular-selection shape used for training-data subset choice
    (facility location / max-coverage): each round scores every remaining
    document by how much NEW vocabulary it contributes, then commits the
    argmax.  Lazy-greedy/stochastic variants change the candidate
    schedule, not this plan shape.

    Scale design: the coverage universe (distinct bigrams of selected
    docs) stays ≤ Σ gains — small by construction — so each round is one
    BROADCAST anti-join of the doc-bigram relation against it plus a
    count aggregation; only the single argmax row is collected per round
    (K driver rows total).  The doc-bigram relation is checkpointed once
    and reused across all K rounds.
    """
    toks = F.split(F.col("text"), " ")
    bigrams = (
        docs.select(
            "doc_id",
            F.explode(
                F.when(
                    F.size(toks) >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size(toks) - 1),
                        lambda i: F.concat_ws(
                            " ",
                            F.element_at(toks, i),
                            F.element_at(toks, i + 1),
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("bg"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    covered = bigrams.select("bg").limit(0)
    out_rows: list[tuple[int, int, int, int]] = []
    covered_total = 0
    for rnd in range(1, k + 1):
        gains = (
            bigrams.join(F.broadcast(covered), "bg", "left_anti")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("gain"))
        )
        # ONE bounded row crosses to the driver per round (the argmax).
        top = gains.orderBy(F.desc("gain"), F.asc("doc_id")).take(1)
        if not top:
            break
        winner, gain = top[0]["doc_id"], top[0]["gain"]
        covered_total += gain
        out_rows.append((rnd, winner, gain, covered_total))
        covered = covered.unionByName(
            bigrams.filter(F.col("doc_id") == winner).select("bg")
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        out_rows, "sel_round bigint, doc_id bigint, marginal_gain bigint, covered_total bigint"
    ).orderBy("sel_round")


def _coverage_oracle(k: int = COVERAGE_K) -> str:
    """Unrolled greedy: round-k winner over bigrams not covered by rounds
    1..k-1, exactly the builder's argmax (gain DESC, doc_id ASC)."""
    ctes = []
    prev_cov = None
    for r in range(1, k + 1):
        not_covered = (
            f"WHERE bg NOT IN (SELECT bg FROM {prev_cov})" if prev_cov else ""
        )
        ctes.append(
            f"""w{r} AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS g
        FROM bg {not_covered}
        GROUP BY doc_id ORDER BY g DESC, doc_id LIMIT 1
    )"""
        )
        cov_prev_sel = f"SELECT bg FROM {prev_cov} UNION " if prev_cov else ""
        ctes.append(
            f"""c{r} AS (
        {cov_prev_sel}SELECT bg FROM bg
        WHERE doc_id = (SELECT doc_id FROM w{r})
    )"""
        )
        prev_cov = f"c{r}"
    selects = [
        f"""SELECT CAST({r} AS BIGINT) AS sel_round, doc_id,
               g AS marginal_gain,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM c{r}) AS covered_total
        FROM w{r}"""
        for r in range(1, k + 1)
    ]
    return (
        """
    WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    bg AS (
        SELECT DISTINCT doc_id, t[i] || ' ' || t[i + 1] AS bg
        FROM tok, unnest(generate_series(1, len(t) - 1)) AS u(i)
        WHERE len(t) >= 2
    ),
    """
        + ",\n    ".join(ctes)
        + "\n    "
        + "\n    UNION ALL\n    ".join(selects)
        + "\n    ORDER BY sel_round"
    )


@register("docs_coverage_greedy", oracle=_coverage_oracle())
def docs_coverage_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy max-coverage selection of K docs by marginal new-bigram
    coverage (submodular data-selection step)."""
    return coverage_greedy(spark, load_table(spark, sf_dir, "documents"))
