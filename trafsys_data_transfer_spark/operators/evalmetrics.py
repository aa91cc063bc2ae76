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
* **Poisson bootstrap CI** (``events_bootstrap_ci``) — the distributed
  bootstrap (per-row Poisson(1) resample weights, no global
  coordination), with deterministic portable-hash draws.
* **Information-gain feature ranking** (``quality_feature_infogain``) —
  the decision-stump split score: which quality feature explains the
  Gopher gate best, in integer micro-nats.
* **Cohen's kappa** (``text_langid_kappa``) — chance-corrected
  agreement of the lang-id heuristic, as an exact integer num/den pair.
* **Jensen-Shannon divergence** (``text_domain_js_divergence``) —
  pairwise distance between per-source unigram distributions, the
  domain-mixture design metric.
* **nDCG@10** (``retrieval_ndcg_eval``) — BM25 ranking quality against
  graded tf relevance via a literal integer discount table.

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
from .dedup import PORTABLE_HASH60_SQL, portable_hash60
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
    from ..session import spread

    toks = F.split(F.col("text"), " ")
    # spread before the bigram explode: the per-doc transform/concat pass
    # otherwise runs on the single-file scan's one partition (r11).
    bigrams = (
        spread(docs, "doc_id").select(
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
    out_rows: list[tuple[int, int, int, int]] = []
    covered_total = 0
    winners: list[int] = []
    for rnd in range(1, k + 1):
        # r11: `covered` is derived per round from the ONE materialised
        # bigram table (bigrams of the winners so far) instead of a
        # growing union-of-checkpoints — drops an eager checkpoint job +
        # driver-side plan→RDD conversion per round; the anti-join input
        # is identical by construction.
        gains = bigrams
        if winners:
            covered = bigrams.filter(
                F.col("doc_id").isin(*winners)
            ).select("bg").distinct()
            gains = bigrams.join(F.broadcast(covered), "bg", "left_anti")
        gains = gains.groupBy("doc_id").agg(F.count(F.lit(1)).alias("gain"))
        # ONE bounded row crosses to the driver per round (the argmax).
        top = gains.orderBy(F.desc("gain"), F.asc("doc_id")).take(1)
        if not top:
            break
        winner, gain = top[0]["doc_id"], top[0]["gain"]
        covered_total += gain
        out_rows.append((rnd, winner, gain, covered_total))
        winners.append(int(winner))
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


# ---------------------------------------------------------------------------
# Poisson bootstrap confidence interval (the distributed bootstrap)
# ---------------------------------------------------------------------------

#: Bootstrap replicates.  32 order statistics give a rank-2/rank-31
#: (~93.75%) interval; production tunes B, the plan shape is identical.
BOOT_B = 32

#: Inverse-CDF thresholds of Poisson(1) scaled to parts-per-1e6: a
#: uniform hash draw u maps to the count whose cumulative band contains
#: it.  Literal table => both engines draw IDENTICAL weights.
_POISSON_CDF_PPM = (367879, 735759, 919699, 981012, 996340, 999406, 999917, 999990)

#: Order statistics reported as the interval (1-indexed ranks of B sorted
#: replicate means).
BOOT_LO_RANK = 2
BOOT_HI_RANK = BOOT_B - 1


def _poisson_weight(u) -> Column:
    """Poisson(1) draw from a uniform ppm value via the literal CDF."""
    w = F.lit(len(_POISSON_CDF_PPM))
    for k in reversed(range(len(_POISSON_CDF_PPM))):
        w = F.when(u < _POISSON_CDF_PPM[k], k).otherwise(w)
    return w


def _poisson_weight_sql(u: str) -> str:
    cases = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_POISSON_CDF_PPM)
    )
    return f"CASE {cases} ELSE {len(_POISSON_CDF_PPM)} END"


def bootstrap_mean_ci(events: DataFrame, b: int = BOOT_B) -> DataFrame:
    """Poisson-bootstrap CI for the mean event value.

    The classic resample-with-replacement bootstrap is impossible
    distributed (a resample needs global coordination); the POISSON
    bootstrap replaces each row's multinomial resample count with an
    independent Poisson(1) draw — no global n needed, so each replicate
    is one embarrassingly-parallel weighted aggregate (Chamandy et al.,
    "Estimating Uncertainty for Massive Data Streams", Google 2012).

    Determinism: the draw is ``portable_hash60(event_id:b) % 1e6``
    pushed through a literal Poisson CDF — both engines replay the same
    weights, so the certificate is exact.  Values are quantized to
    integer micro-units per row BEFORE summation (engine sum order can't
    perturb), and each replicate mean is the rounded quotient of two
    exact integers.

    Scale shape: one generate (×B) + one keyed aggregate to B rows +
    a guarded B-row ranking window.  No collect, no global sort of data.
    """
    from ..session import spread

    # Narrow (event_id, v_micro) spread across the cluster BEFORE the ×B
    # explode: the per-(event, b) md5 hash chain is the dominant cost and
    # would otherwise run on the source's partitioning (one task off a
    # single-file scan — r11 probe: 7.57 s exec, all in one core).
    base = spread(
        events.select(
            "event_id",
            F.floor(F.col("value") * 1000000.0 + F.lit(0.5))
            .cast("long")
            .alias("v_micro"),
        ),
        "event_id",
    )
    drawn = base.select(
        "event_id",
        "v_micro",
        F.explode(F.sequence(F.lit(0), F.lit(b - 1))).alias("b"),
    ).withColumn(
        "w",
        _poisson_weight(
            portable_hash60(
                F.concat(F.col("event_id").cast("string"), F.lit(":"), F.col("b").cast("string"))
            )
            % F.lit(1000000)
        ),
    )
    reps = drawn.groupBy("b").agg(
        F.sum("w").alias("sum_w"),
        F.sum(F.col("w") * F.col("v_micro")).alias("sum_wv"),
    )
    reps = reps.select(
        "b",
        F.round(
            F.col("sum_wv").cast("double") / F.col("sum_w") / 1000000.0, 6
        ).alias("mean_r"),
    )
    from .guards import bounded_window_guard

    w_rank = Window.partitionBy().orderBy("mean_r", "b")
    ranked = bounded_window_guard(reps, "bootstrap_mean_ci", 100_000).select(
        "mean_r", F.row_number().over(w_rank).alias("rk")
    )
    full = events.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(
                F.floor(F.col("value") * 1000000.0 + F.lit(0.5)).cast("long")
            ).cast("double")
            / F.count(F.lit(1))
            / 1000000.0,
            6,
        ).alias("mean_full"),
    )
    # Both interval endpoints from ONE pass over the ranked replicates:
    # two filtered branches would each re-execute the whole ×B explode +
    # hash + aggregate subtree (Catalyst does not dedupe the common
    # subtree across the two crossJoin inputs — r11 before-plan shows the
    # events scan + Generate + HashAggregate chain TWICE).
    ci = ranked.agg(
        F.max(
            F.when(F.col("rk") == BOOT_LO_RANK, F.col("mean_r"))
        ).alias("ci_lo"),
        F.max(
            F.when(F.col("rk") == BOOT_HI_RANK, F.col("mean_r"))
        ).alias("ci_hi"),
    )
    return (
        full.crossJoin(F.broadcast(ci))
        .select(
            "n_events",
            F.lit(BOOT_B).cast("long").alias("b_replicates"),
            "mean_full",
            "ci_lo",
            "ci_hi",
        )
    )


_BOOT_HASH = PORTABLE_HASH60_SQL.format(
    s="CAST(event_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)"
)

_BOOT_ORACLE = f"""
WITH base AS (
    SELECT event_id,
           CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS v_micro
    FROM events
),
reps AS (
    SELECT b, CAST(SUM(w) AS BIGINT) AS sum_w,
           CAST(SUM(w * v_micro) AS BIGINT) AS sum_wv
    FROM (
        SELECT v_micro, b,
               {_poisson_weight_sql(f"({_BOOT_HASH}) % 1000000")} AS w
        FROM base, unnest(generate_series(0, {BOOT_B - 1})) AS r(b)
    )
    GROUP BY b
),
means AS (
    SELECT b,
           ROUND(CAST(sum_wv AS DOUBLE) / sum_w / 1000000.0, 6) AS mean_r,
           ROW_NUMBER() OVER (
               ORDER BY ROUND(CAST(sum_wv AS DOUBLE) / sum_w / 1000000.0, 6), b
           ) AS rk
    FROM reps
),
fullstats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(v_micro) AS DOUBLE) / COUNT(*) / 1000000.0, 6)
               AS mean_full
    FROM base
)
SELECT n_events, CAST({BOOT_B} AS BIGINT) AS b_replicates, mean_full,
       (SELECT mean_r FROM means WHERE rk = {BOOT_LO_RANK}) AS ci_lo,
       (SELECT mean_r FROM means WHERE rk = {BOOT_HI_RANK}) AS ci_hi
FROM fullstats
"""


@register("events_bootstrap_ci", oracle=_BOOT_ORACLE)
def events_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap order-statistic CI for the mean event value."""
    return bootstrap_mean_ci(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Information-gain feature ranking (decision-stump feature audit)
# ---------------------------------------------------------------------------


def _gopher_feature_bands(docs: DataFrame) -> DataFrame:
    """Per-doc integer feature bands + the Gopher label, in one map pass.

    Every band is exact integer arithmetic on counts (no FP until the
    entropy step): words-per-10 band, raw stopword hits, symbol pct,
    alpha-word decile, mean-word-length deci-units.
    """
    toks = F.split(F.col("text"), " ")
    n_words = F.size(toks).cast("long")
    n_nonspace = F.length(
        F.replace(F.col("text"), F.lit(" "), F.lit(""))
    ).cast("long")
    n_sym = F.regexp_count(F.col("text"), F.lit("#|\\.\\.\\.")).cast("long")
    n_alpha = F.size(F.filter(toks, lambda x: x.rlike("[a-z]"))).cast("long")
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast(
        "long"
    )
    mean_wl = n_nonspace.cast("double") / n_words
    sym_ratio = n_sym.cast("double") / n_words
    alpha_frac = n_alpha.cast("double") / n_words
    y = (
        n_words.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & mean_wl.between(GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MAX_MEAN_WORD_LEN)
        & (sym_ratio < GOPHER_MAX_SYMBOL_RATIO)
        & (alpha_frac >= GOPHER_MIN_ALPHA_WORD_FRAC)
        & (stop_hits >= GOPHER_MIN_STOPWORD_HITS)
    ).cast("int")
    banded = docs.select(
        y.alias("y"),
        n_words.alias("nw"),
        n_nonspace.alias("nn"),
        n_sym.alias("ns"),
        n_alpha.alias("na"),
        stop_hits.alias("sh"),
    )
    return banded.select(
        "y",
        F.expr(
            "stack(5,"
            " 'n_words_band', nw div 10,"
            " 'stopword_hits', sh,"
            " 'symbol_pct', ns * 100 div nw,"
            " 'alpha_decile', na * 10 div nw,"
            " 'mean_word_len_deci', nn * 10 div nw"
            ") AS (feature, band)"
        ),
    )


#: Oracle twin of :func:`_gopher_feature_bands` (UNION ALL = stack).
_FEATURE_BANDS_SQL = f"""
    perdoc AS (
        SELECT CAST(
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
               AS INT) AS y,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS nw,
               CAST(len(replace(text, ' ', '')) AS BIGINT) AS nn,
               CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS BIGINT)
                   AS ns,
               CAST(len(list_filter(string_split(text, ' '),
                        x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS na,
               CAST(len(list_filter(string_split(text, ' '),
                        x -> x IN ({_sql_in_list(STOPWORDS)}))) AS BIGINT)
                   AS sh
        FROM documents
    ),
    stacked AS (
        SELECT y, 'n_words_band' AS feature, nw // 10 AS band FROM perdoc
        UNION ALL
        SELECT y, 'stopword_hits', sh FROM perdoc
        UNION ALL
        SELECT y, 'symbol_pct', ns * 100 // nw FROM perdoc
        UNION ALL
        SELECT y, 'alpha_decile', na * 10 // nw FROM perdoc
        UNION ALL
        SELECT y, 'mean_word_len_deci', nn * 10 // nw FROM perdoc
    )
"""


def feature_infogain(stacked: DataFrame) -> DataFrame:
    """Information gain of each banded feature against the binary label:
    ``IG(f) = H(y) − H(y | band(f))``, in integer micro-nats.

    Every entropy term is quantized ONCE (the lm.py micro-nat rule) and
    then integer-summed, so engine summation order is irrelevant.  The
    inputs are (feature, band, y) COUNTS — one hash aggregation with
    map-side combine; everything after is O(features × bands) rows.
    This is exactly the split-scoring step of a decision-stump / tree
    trainer, run distributed.
    """
    cells = stacked.groupBy("feature", "band", "y").agg(
        F.count(F.lit(1)).alias("c_vc")
    )
    w_f = Window.partitionBy("feature")
    w_v = Window.partitionBy("feature", "band")
    w_y = Window.partitionBy("feature", "y")
    enriched = cells.select(
        "feature",
        "band",
        "y",
        "c_vc",
        F.sum("c_vc").over(w_f).alias("n"),
        F.sum("c_vc").over(w_v).alias("c_v"),
        F.sum("c_vc").over(w_y).alias("c_y"),
    )
    # H(y|f) term: (c_vc/n)·ln(c_v/c_vc); H(y) term uses the same cell
    # rows weighted within class: (c_vc/c_y)·(c_y/n)·ln(n/c_y) — summed
    # per class it telescopes to the exact class term, but quantizing
    # PER CLASS (not per cell) keeps the round-off identical in both
    # engines, so H(y) is derived from the per-(feature, y) relation.
    hy = (
        enriched.select("feature", "y", "c_y", "n")
        .distinct()
        .select(
            "feature",
            F.floor(
                (F.col("c_y") / F.col("n"))
                * F.log(F.col("n") / F.col("c_y"))
                * 1000000.0
                + F.lit(0.5)
            )
            .cast("long")
            .alias("t"),
        )
        .groupBy("feature")
        .agg(F.sum("t").alias("h_y_micro"))
    )
    hcond = enriched.select(
        "feature",
        F.floor(
            (F.col("c_vc") / F.col("n"))
            * F.log(F.col("c_v") / F.col("c_vc"))
            * 1000000.0
            + F.lit(0.5)
        )
        .cast("long")
        .alias("t"),
    ).groupBy("feature").agg(
        F.sum("t").alias("h_cond_micro"),
        F.count(F.lit(1)).alias("n_cells"),
    )
    return (
        hy.join(hcond, "feature")
        .select(
            "feature",
            "n_cells",
            "h_y_micro",
            "h_cond_micro",
            (F.col("h_y_micro") - F.col("h_cond_micro")).alias("ig_micro"),
        )
        .orderBy("feature")
    )


_INFOGAIN_ORACLE = f"""
WITH {_FEATURE_BANDS_SQL},
cells AS (
    SELECT feature, band, y, CAST(COUNT(*) AS BIGINT) AS c_vc
    FROM stacked GROUP BY feature, band, y
),
enriched AS (
    SELECT feature, band, y, c_vc,
           SUM(c_vc) OVER (PARTITION BY feature) AS n,
           SUM(c_vc) OVER (PARTITION BY feature, band) AS c_v,
           SUM(c_vc) OVER (PARTITION BY feature, y) AS c_y
    FROM cells
),
hy AS (
    SELECT feature,
           CAST(SUM(CAST(FLOOR(
               (CAST(c_y AS DOUBLE) / n) * ln(CAST(n AS DOUBLE) / c_y)
               * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS h_y_micro
    FROM (SELECT DISTINCT feature, y, c_y, n FROM enriched)
    GROUP BY feature
),
hcond AS (
    SELECT feature,
           CAST(SUM(CAST(FLOOR(
               (CAST(c_vc AS DOUBLE) / n) * ln(CAST(c_v AS DOUBLE) / c_vc)
               * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS h_cond_micro,
           CAST(COUNT(*) AS BIGINT) AS n_cells
    FROM enriched GROUP BY feature
)
SELECT feature, n_cells, h_y_micro, h_cond_micro,
       CAST(h_y_micro - h_cond_micro AS BIGINT) AS ig_micro
FROM hy JOIN hcond USING (feature)
ORDER BY feature
"""


@register("quality_feature_infogain", oracle=_INFOGAIN_ORACLE)
def quality_feature_infogain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which quality feature explains the Gopher gate best: per-feature
    information gain (micro-nats) over integer feature bands."""
    docs = load_table(spark, sf_dir, "documents")
    return feature_infogain(_gopher_feature_bands(docs))


# ---------------------------------------------------------------------------
# Cohen's kappa (chance-corrected agreement of the lang-id heuristic)
# ---------------------------------------------------------------------------


def cohens_kappa(pairs: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Chance-corrected agreement between two categorical raters.

    ``kappa = (p_o − p_e) / (1 − p_e)`` with p_o the observed agreement
    and p_e the marginal-product chance agreement — emitted as the EXACT
    integer pair ``(kappa_num, kappa_den) = (agree·n − Σ r_k·c_k,
    n² − Σ r_k·c_k)`` plus a 6-dp quotient, so no division ever happens
    in the certificate.

    Scale shape: one groupBy to the (a, b) confusion cells (map-side
    combinable), then everything is O(labels²) — marginals, their
    product-sum, the scalars.  No windows, no collects.
    """
    cells = pairs.groupBy(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    ).agg(F.count(F.lit(1)).alias("c"))
    n_agree = cells.agg(
        F.sum("c").alias("n"),
        F.coalesce(
            F.sum(F.when(F.col("a") == F.col("b"), F.col("c"))), F.lit(0)
        ).alias("agree"),
    )
    ra = cells.groupBy("a").agg(F.sum("c").alias("r"))
    cb = cells.groupBy("b").agg(F.sum("c").alias("col_n"))
    pe = (
        ra.join(cb, ra["a"] == cb["b"], "inner")
        .agg(F.coalesce(F.sum(F.col("r") * F.col("col_n")), F.lit(0)).alias("pe_num"))
    )
    return (
        n_agree.crossJoin(F.broadcast(pe))
        .select(
            "n",
            "agree",
            "pe_num",
            (F.col("agree") * F.col("n") - F.col("pe_num")).alias("kappa_num"),
            (F.col("n") * F.col("n") - F.col("pe_num")).alias("kappa_den"),
        )
        .withColumn(
            "kappa",
            F.when(
                F.col("kappa_den") > 0,
                F.round(F.col("kappa_num") / F.col("kappa_den"), 6),
            ),
        )
    )


def _kappa_oracle() -> str:
    from .text import _lang_hits_sql, _lang_id_case_sql

    return f"""
    WITH h AS ({_lang_hits_sql()}),
    pred AS (
        SELECT lang AS a, {_lang_id_case_sql()} AS b FROM h
    ),
    cells AS (
        SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c FROM pred GROUP BY a, b
    ),
    na AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n,
               CAST(COALESCE(SUM(c) FILTER (WHERE a = b), 0) AS BIGINT)
                   AS agree
        FROM cells
    ),
    ra AS (SELECT a, CAST(SUM(c) AS BIGINT) AS r FROM cells GROUP BY a),
    cb AS (SELECT b, CAST(SUM(c) AS BIGINT) AS col_n FROM cells GROUP BY b),
    pe AS (
        SELECT CAST(COALESCE(SUM(r * col_n), 0) AS BIGINT) AS pe_num
        FROM ra JOIN cb ON ra.a = cb.b
    )
    SELECT n, agree, pe_num,
           CAST(agree * n - pe_num AS BIGINT) AS kappa_num,
           CAST(n * n - pe_num AS BIGINT) AS kappa_den,
           CASE WHEN n * n - pe_num > 0
                THEN ROUND(CAST(agree * n - pe_num AS DOUBLE)
                           / (n * n - pe_num), 6)
           END AS kappa
    FROM na CROSS JOIN pe
    """


@register("text_langid_kappa", oracle=_kappa_oracle())
def text_langid_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa of the signature-word lang-id heuristic against the
    labeled language: is the heuristic better than chance, corrected for
    the label imbalance accuracy hides?"""
    from .text import _lang_hit_exprs, _lang_id_case_sql

    docs = load_table(spark, sf_dir, "documents")
    hits = _lang_hit_exprs()
    pred = docs.select(
        F.col("lang").alias("labeled"),
        *[expr.alias(f"h_{lang}") for lang, expr in hits.items()],
    ).select("labeled", F.expr(_lang_id_case_sql()).alias("predicted"))
    return cohens_kappa(pred, "labeled", "predicted")


# ---------------------------------------------------------------------------
# Jensen-Shannon divergence between per-source unigram distributions
# ---------------------------------------------------------------------------


def domain_js_divergence(docs: DataFrame) -> DataFrame:
    """Pairwise JS divergence between every two sources' unigram
    distributions — the mixture-design distance: which domains are
    near-duplicates of each other, which add genuinely new text?

    ``JS(P,Q) = ½·KL(P‖M) + ½·KL(Q‖M)``, M the even mixture.  Every KL
    term ``p·ln(p/m)`` is quantized ONCE to signed micro-nats and
    integer-summed (lm.py discipline) — engine sum order cannot move the
    result, and JS's terms are defined wherever p>0 (m ≥ p/2 > 0), so
    no smoothing constant is needed.

    Scale shape: per-source term counts are one map-side-combinable
    aggregation; the pair grid is (distinct terms) × (source pairs) —
    linear in vocabulary with a small constant (O(|sources|²) pairs,
    sources being a curated handful even at 100 TB) — built by two
    term-keyed broadcast-able joins, never a doc-level self-join.
    """
    tok = docs.select("source", F.explode(F.split(F.col("text"), " ")).alias("term"))
    counts = tok.groupBy("source", "term").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.groupBy("source").agg(F.sum("c").alias("n"))
    sources = totals.select("source", "n")
    pairs = (
        sources.alias("sa")
        .crossJoin(sources.alias("sb"))
        .filter(F.col("sa.source") < F.col("sb.source"))
        .select(
            F.col("sa.source").alias("source_a"),
            F.col("sa.n").alias("n_a"),
            F.col("sb.source").alias("source_b"),
            F.col("sb.n").alias("n_b"),
        )
    )
    terms = counts.select("term").distinct()
    grid = pairs.crossJoin(terms)
    ca = counts.select(
        F.col("source").alias("source_a"), "term", F.col("c").alias("c_a")
    )
    cb = counts.select(
        F.col("source").alias("source_b"), "term", F.col("c").alias("c_b")
    )
    joined = (
        grid.join(ca, ["source_a", "term"], "left")
        .join(cb, ["source_b", "term"], "left")
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            F.coalesce(F.col("c_a"), F.lit(0)).alias("c_a"),
            F.coalesce(F.col("c_b"), F.lit(0)).alias("c_b"),
        )
        .filter((F.col("c_a") > 0) | (F.col("c_b") > 0))
    )
    p = F.col("c_a") / F.col("n_a")
    q = F.col("c_b") / F.col("n_b")
    m = (p + q) / 2
    tkl = joined.select(
        "source_a",
        "source_b",
        F.when(
            F.col("c_a") > 0,
            F.floor(p * F.log(p / m) * 1000000.0 + F.lit(0.5)).cast("long"),
        )
        .otherwise(F.lit(0))
        .alias("tp"),
        F.when(
            F.col("c_b") > 0,
            F.floor(q * F.log(q / m) * 1000000.0 + F.lit(0.5)).cast("long"),
        )
        .otherwise(F.lit(0))
        .alias("tq"),
    )
    return (
        tkl.groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("tp").alias("klp_micro"),
            F.sum("tq").alias("klq_micro"),
        )
        .withColumn(
            "js_micro",
            # greatest(0, ·) before the halving: KL≥0 mathematically, but
            # per-term quantization can leave a few NEGATIVE micro-nats
            # on near-identical distributions, where Spark's div
            # (truncate) and DuckDB's // (floor) disagree on odd values.
            F.expr("greatest(0, klp_micro + klq_micro) div 2"),
        )
        .orderBy("source_a", "source_b")
    )


_JS_ORACLE = """
WITH tok AS (
    SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
),
counts AS (
    SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
    FROM tok GROUP BY source, term
),
totals AS (
    SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM counts GROUP BY source
),
pairs AS (
    SELECT sa.source AS source_a, sa.n AS n_a,
           sb.source AS source_b, sb.n AS n_b
    FROM totals sa CROSS JOIN totals sb
    WHERE sa.source < sb.source
),
grid AS (
    SELECT p.*, t.term
    FROM pairs p CROSS JOIN (SELECT DISTINCT term FROM counts) t
),
joined AS (
    SELECT g.source_a, g.source_b, g.n_a, g.n_b,
           COALESCE(ca.c, 0) AS c_a, COALESCE(cb.c, 0) AS c_b
    FROM grid g
    LEFT JOIN counts ca ON ca.source = g.source_a AND ca.term = g.term
    LEFT JOIN counts cb ON cb.source = g.source_b AND cb.term = g.term
    WHERE COALESCE(ca.c, 0) > 0 OR COALESCE(cb.c, 0) > 0
),
tkl AS (
    SELECT source_a, source_b,
           CASE WHEN c_a > 0 THEN CAST(FLOOR(
               (CAST(c_a AS DOUBLE) / n_a)
               * ln((CAST(c_a AS DOUBLE) / n_a)
                    / ((CAST(c_a AS DOUBLE) / n_a
                        + CAST(c_b AS DOUBLE) / n_b) / 2))
               * 1000000.0 + 0.5) AS BIGINT) ELSE 0 END AS tp,
           CASE WHEN c_b > 0 THEN CAST(FLOOR(
               (CAST(c_b AS DOUBLE) / n_b)
               * ln((CAST(c_b AS DOUBLE) / n_b)
                    / ((CAST(c_a AS DOUBLE) / n_a
                        + CAST(c_b AS DOUBLE) / n_b) / 2))
               * 1000000.0 + 0.5) AS BIGINT) ELSE 0 END AS tq
    FROM joined
)
SELECT source_a, source_b,
       CAST(COUNT(*) AS BIGINT) AS n_terms,
       CAST(SUM(tp) AS BIGINT) AS klp_micro,
       CAST(SUM(tq) AS BIGINT) AS klq_micro,
       CAST(GREATEST(0, SUM(tp) + SUM(tq)) // 2 AS BIGINT) AS js_micro
FROM tkl
GROUP BY source_a, source_b
ORDER BY source_a, source_b
"""


@register("text_domain_js_divergence", oracle=_JS_ORACLE)
def text_domain_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between source unigram
    distributions (micro-nats) — the domain-mixture design distance."""
    return domain_js_divergence(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# nDCG@k retrieval evaluation (BM25 ranking vs graded tf relevance)
# ---------------------------------------------------------------------------

#: Evaluation depth and the 1-indexed micro-discount table
#: round(1e6 / log2(i+1)) — a LITERAL shared by both engines, so DCG is
#: pure integer arithmetic (rel · discount, summed).
NDCG_K = 10
NDCG_DISCOUNT_MICRO = (
    1000000, 630930, 500000, 430677, 386853,
    356207, 333333, 315465, 301030, 289065,
)


def retrieval_ndcg(docs: DataFrame) -> DataFrame:
    """nDCG@10 of the single-term BM25 ranking against graded term-
    frequency relevance, per query term.

    The retrieval-quality eval a corpus search stack runs offline: BM25's
    length normalisation re-orders documents away from raw tf; nDCG@10
    quantifies how much.  Relevance grade = tf (graded, not binary);
    ideal ranking = tf descending.  DCG is exact integer micro-units via
    the literal discount table; ndcg_ppm is the integer ratio.

    Scale shape: candidate rows are only documents CONTAINING a query
    term (explode + filter before any shuffle); the per-term top-k
    windows run over those candidates — an offline eval over Q terms,
    partition-parallel across terms, with the same skew profile as any
    per-term postings traversal.  Rank keys are (rounded score, doc_id)
    so both engines' orderings are identical.

    Reuses retrieval.py's exact BM25 expression (same constants, same
    fixed-order double math).
    """
    from .retrieval import BM25_B, BM25_K1, BM25_QUERY

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
    w_bm = Window.partitionBy("term").orderBy(F.desc("s"), F.asc("doc_id"))
    w_ideal = Window.partitionBy("term").orderBy(
        F.desc("tf"), F.asc("doc_id")
    )
    disc = F.array(*[F.lit(d) for d in NDCG_DISCOUNT_MICRO])
    ranked = scored.select(
        "term",
        "tf",
        F.row_number().over(w_bm).alias("rn_bm"),
        F.row_number().over(w_ideal).alias("rn_ideal"),
    )
    agg = ranked.groupBy("term").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("rn_bm") <= NDCG_K,
                    F.col("tf") * F.element_at(disc, F.col("rn_bm")),
                )
            ),
            F.lit(0),
        ).alias("dcg_micro"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("rn_ideal") <= NDCG_K,
                    F.col("tf") * F.element_at(disc, F.col("rn_ideal")),
                )
            ),
            F.lit(0),
        ).alias("idcg_micro"),
    )
    return agg.select(
        "term",
        "n_candidates",
        "dcg_micro",
        "idcg_micro",
        F.expr("dcg_micro * 1000000 div idcg_micro").alias("ndcg_ppm"),
    ).orderBy("term")


def _ndcg_oracle() -> str:
    from .retrieval import BM25_B, BM25_K1, BM25_QUERY

    in_list = ", ".join(f"'{t}'" for t in BM25_QUERY)
    disc = "[" + ", ".join(str(d) for d in NDCG_DISCOUNT_MICRO) + "]"
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
    scored AS (
        SELECT h.doc_id, h.term, h.tf,
               ROUND(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
               * (h.tf * {BM25_K1 + 1}) /
                 (h.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * h.dl * n_docs
                                      / CAST(total_dl AS DOUBLE))), 6) AS s
        FROM hits h JOIN dfreq USING (term) CROSS JOIN stats
    ),
    ranked AS (
        SELECT term, tf,
               ROW_NUMBER() OVER (PARTITION BY term
                                  ORDER BY s DESC, doc_id) AS rn_bm,
               ROW_NUMBER() OVER (PARTITION BY term
                                  ORDER BY tf DESC, doc_id) AS rn_ideal
        FROM scored
    )
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS n_candidates,
           CAST(COALESCE(SUM(CASE WHEN rn_bm <= {NDCG_K}
                THEN tf * ({disc})[rn_bm] END), 0) AS BIGINT) AS dcg_micro,
           CAST(COALESCE(SUM(CASE WHEN rn_ideal <= {NDCG_K}
                THEN tf * ({disc})[rn_ideal] END), 0) AS BIGINT)
               AS idcg_micro,
           CAST(COALESCE(SUM(CASE WHEN rn_bm <= {NDCG_K}
                THEN tf * ({disc})[rn_bm] END), 0) * 1000000
                // COALESCE(SUM(CASE WHEN rn_ideal <= {NDCG_K}
                   THEN tf * ({disc})[rn_ideal] END), 0) AS BIGINT)
               AS ndcg_ppm
    FROM ranked
    GROUP BY term
    ORDER BY term
    """


@register("retrieval_ndcg_eval", oracle=_ndcg_oracle())
def retrieval_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 of single-term BM25 rankings vs graded tf relevance."""
    return retrieval_ndcg(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Leave-one-source-out ablation (data valuation)
# ---------------------------------------------------------------------------


def source_ablation(docs: DataFrame) -> DataFrame:
    """Per-source contribution to the corpus quality rate by
    leave-one-out ablation — the cheapest data-valuation readout: how
    does the Gopher keep-rate move if this source is dropped?

    The ablation needs NO recomputation per source: keep-rate without
    source s is ``(K − k_s) / (N − n_s)`` from the same per-source
    sufficient statistics — one aggregation, then O(sources) algebra.
    (Shapley-style valuations sample many subsets; each subset's value
    folds from these identical per-source partials.)

    Output per source: doc count, kept count, the source's own keep
    rate, the corpus rate without it, and the signed delta the source
    contributes — all exact ppm integers.
    """
    labeled = _scored_labeled(docs).select("doc_id", "y")
    per_source = (
        docs.select("doc_id", "source")
        .join(labeled, "doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_s"), F.sum("y").alias("k_s"))
    )
    totals = per_source.agg(
        F.sum("n_s").alias("n_all"), F.sum("k_s").alias("k_all")
    )
    return (
        per_source.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_s",
            "k_s",
            F.expr("k_s * 1000000 div n_s").alias("rate_own_ppm"),
            F.expr("k_all * 1000000 div n_all").alias("rate_full_ppm"),
            F.expr(
                "(k_all - k_s) * 1000000 div (n_all - n_s)"
            ).alias("rate_without_ppm"),
            F.expr(
                "k_all * 1000000 div n_all"
                " - (k_all - k_s) * 1000000 div (n_all - n_s)"
            ).alias("delta_ppm"),
        )
        .orderBy("source")
    )


_ABLATION_ORACLE = f"""
WITH {_SCORED_SQL},
per_source AS (
    SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_s,
           CAST(SUM(m.y) AS BIGINT) AS k_s
    FROM documents d JOIN mscored m USING (doc_id)
    GROUP BY d.source
),
totals AS (
    SELECT CAST(SUM(n_s) AS BIGINT) AS n_all,
           CAST(SUM(k_s) AS BIGINT) AS k_all
    FROM per_source
)
SELECT source, n_s, k_s,
       CAST(k_s * 1000000 // n_s AS BIGINT) AS rate_own_ppm,
       CAST(k_all * 1000000 // n_all AS BIGINT) AS rate_full_ppm,
       CAST((k_all - k_s) * 1000000 // (n_all - n_s) AS BIGINT)
           AS rate_without_ppm,
       CAST(k_all * 1000000 // n_all
            - (k_all - k_s) * 1000000 // (n_all - n_s) AS BIGINT)
           AS delta_ppm
FROM per_source CROSS JOIN totals
ORDER BY source
"""


@register("docs_source_ablation", oracle=_ABLATION_ORACLE)
def docs_source_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out keep-rate ablation (data valuation)."""
    return source_ablation(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Offline policy evaluation (inverse-propensity replay)
# ---------------------------------------------------------------------------

#: Actions the replayed policy chooses among (the logged action space).
BANDIT_ACTIONS = ("click", "purchase", "signup", "view", "error")


def bandit_ips_replay(events: DataFrame) -> DataFrame:
    """Inverse-propensity-scoring estimate of a deterministic target
    policy's value from uniformly-logged events — the offline A/B: score
    a NEW routing/ranking policy on yesterday's logs without deploying
    it.

    With logging propensity 1/K uniform over K actions, the IPS
    estimator is ``K · mean(reward · 1[π(user) = logged action])``.  The
    target policy here is a deterministic hash route
    ``π(user) = actions[hash(user) mod K]`` — the injection seam where a
    trained policy's argmax plugs in; the estimator algebra (and the
    plan: one narrow scan, one fold) is unchanged.

    Rewards quantize to integer micro-units; the output carries the
    exact (sum, count) pairs plus rounded value estimates for the
    logged baseline and the target policy.
    """
    k = len(BANDIT_ACTIONS)
    act = F.array(*[F.lit(a) for a in BANDIT_ACTIONS])
    tagged = events.select(
        F.floor(F.col("value") * 1000000.0 + F.lit(0.5))
        .cast("long")
        .alias("r_micro"),
        F.col("event_type").alias("logged"),
        F.element_at(
            act,
            (portable_hash60(F.col("user_id").cast("string")) % k + 1).cast(
                "int"
            ),
        ).alias("target"),
    )
    agg = tagged.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r_micro").alias("sum_r"),
        F.coalesce(
            F.sum(
                F.when(F.col("logged") == F.col("target"), F.col("r_micro"))
            ),
            F.lit(0),
        ).alias("sum_r_match"),
        F.coalesce(
            F.sum(F.when(F.col("logged") == F.col("target"), 1)), F.lit(0)
        ).alias("n_match"),
    )
    return agg.select(
        "n",
        "n_match",
        "sum_r",
        "sum_r_match",
        F.round(
            F.col("sum_r").cast("double") / F.col("n") / 1000000.0, 6
        ).alias("value_logged"),
        F.round(
            F.lit(k)
            * F.col("sum_r_match").cast("double")
            / F.col("n")
            / 1000000.0,
            6,
        ).alias("value_target_ips"),
    )


_BANDIT_HASH = PORTABLE_HASH60_SQL.format(s="CAST(user_id AS VARCHAR)")
_BANDIT_ACT_SQL = "[" + ", ".join(f"'{a}'" for a in BANDIT_ACTIONS) + "]"

_BANDIT_ORACLE = f"""
WITH tagged AS (
    SELECT CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS r_micro,
           event_type AS logged,
           ({_BANDIT_ACT_SQL})[
               CAST(({_BANDIT_HASH}) % {len(BANDIT_ACTIONS)} + 1 AS INT)
           ] AS target
    FROM events
)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COALESCE(SUM(CASE WHEN logged = target THEN 1 END), 0)
            AS BIGINT) AS n_match,
       CAST(SUM(r_micro) AS BIGINT) AS sum_r,
       CAST(COALESCE(SUM(CASE WHEN logged = target THEN r_micro END), 0)
            AS BIGINT) AS sum_r_match,
       ROUND(CAST(SUM(r_micro) AS DOUBLE) / COUNT(*) / 1000000.0, 6)
           AS value_logged,
       ROUND({len(BANDIT_ACTIONS)}
             * CAST(COALESCE(SUM(CASE WHEN logged = target
                                 THEN r_micro END), 0) AS DOUBLE)
             / COUNT(*) / 1000000.0, 6) AS value_target_ips
FROM tagged
"""


@register("events_bandit_ips", oracle=_BANDIT_ORACLE)
def events_bandit_ips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPS offline policy evaluation of a hash-routed target policy."""
    return bandit_ips_replay(load_table(spark, sf_dir, "events"))
