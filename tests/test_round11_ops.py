"""Session-6 operator semantics on planted inputs: k-anonymity audit,
FD violation profiling, token-budget curriculum, domain mixture weights,
tokenizer fertility."""

from __future__ import annotations

from pyspark.sql import functions as F

from trafsys_data_transfer_spark.operators.pii import k_anonymity_audit
from trafsys_data_transfer_spark.operators.pretrain import (
    token_budget_curriculum,
)
from trafsys_data_transfer_spark.operators.quality import fd_audit_one


def test_k_anonymity_flags_small_and_undiverse_groups(spark):
    # group (1,'A'): 5 members, 3 distinct sensitive values -> both pass
    # group (1,'B'): 2 members -> fails k; 2 distinct -> fails l
    # group (2,'A'): 6 members but single sensitive value -> fails l only
    rows = (
        [(1, "A", s) for s in (10, 10, 20, 30, 30)]
        + [(1, "B", s) for s in (10, 20)]
        + [(2, "A", 10)] * 6
    )
    df = spark.createDataFrame(rows, ["qi1", "qi2", "sens"])
    got = {
        (r.qi1, r.qi2): (r.group_n, r.k_anonymous, r.l_distinct, r.l_diverse)
        for r in k_anonymity_audit(df, ["qi1", "qi2"], "sens", k=5, l=3)
        .collect()
    }
    assert got[(1, "A")] == (5, True, 3, True)
    assert got[(1, "B")] == (2, False, 2, False)
    assert got[(2, "A")] == (6, True, 1, False)


def test_fd_audit_g3_is_min_rows_to_repair(spark):
    # lhs=1 maps to rhs in {x:3, y:1} -> delete 1 row to repair
    # lhs=2 maps only to x -> holds
    rows = [(1, "x")] * 3 + [(1, "y")] + [(2, "x")] * 2
    df = spark.createDataFrame(rows, ["l", "r"])
    row = fd_audit_one(df, "l", "r", "t.l->r").collect()[0]
    assert row.fd == "t.l->r"
    assert row.n_rows == 6 and row.n_lhs == 2
    assert row.violating_lhs == 1 and row.g3_rows == 1
    assert not row.holds

    held = fd_audit_one(
        spark.createDataFrame([(1, "x"), (2, "y")], ["l", "r"]), "l", "r", "k"
    ).collect()[0]
    assert held.holds and held.g3_rows == 0 and held.violating_lhs == 0


def test_token_budget_curriculum_matches_naive_prefix(spark):
    # Distinct type-token ratios so the quality order is unambiguous;
    # token masses chosen so the 30% budget cuts inside the ordering.
    docs = spark.createDataFrame(
        [
            (0, "a b c d e f g h i j"),          # ttr 1.0, 10 tokens
            (1, "a a b b c c d d e e"),          # ttr 0.5, 10 tokens
            (2, "a a a a a a a a a b"),          # ttr 0.2, 10 tokens
            (3, "x y z x y z x y z w"),          # ttr 0.4, 10 tokens
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.n_tokens, r.cum_tokens)
        for r in token_budget_curriculum(docs, budget_frac=0.6).collect()
    }
    # order: doc0 (1.0) -> doc1 (0.5) -> doc3 (0.4) -> doc2 (0.2);
    # budget = floor(40 * 0.6) = 24 -> keep doc0 (cum 10), doc1 (cum 20);
    # doc3 would reach 30 > 24.
    assert got == {0: (10, 10), 1: (10, 20)}


def test_domain_mixture_weights_floor_zero_and_sum_one(spark, sf_dir):
    from trafsys_data_transfer_spark.operators.lm import (
        domain_mixture_weights,
    )
    from trafsys_data_transfer_spark.sources.fixtures import load_table

    out = domain_mixture_weights(load_table(spark, sf_dir, "documents"))
    rows = out.collect()
    assert len(rows) == 20  # one per source
    weights = {r.source: r.weight for r in rows}
    floor_srcs = [r.source for r in rows if r.excess == 0]
    assert floor_srcs and all(weights[s] == 0.0 for s in floor_srcs)
    assert abs(sum(weights.values()) - 1.0) < 1e-4  # 6-dp rounding slack
    # weight strictly monotone in excess
    by_excess = sorted(rows, key=lambda r: r.excess)
    assert all(
        a.weight <= b.weight for a, b in zip(by_excess, by_excess[1:])
    )


def test_fertility_exact_on_planted(spark):
    from trafsys_data_transfer_spark.operators.text import BPE_REGEX

    docs = spark.createDataFrame(
        [(0, "ab 12, cd!", "en"), (1, "xy", "en"), (2, "a-b c", "fr")],
        ["doc_id", "text", "lang"],
    )
    toks = F.split(F.col("text"), " ")
    per = docs.groupBy("lang").agg(
        F.sum(F.size(toks)).alias("w"),
        F.sum(F.regexp_count(F.col("text"), F.lit(BPE_REGEX))).alias("b"),
    )
    got = {r.lang: (r.w, r.b) for r in per.collect()}
    # "ab 12, cd!" -> words 3, subwords [ab,12,',',cd,'!'] = 5; "xy" -> 1,1
    assert got["en"] == (4, 6)
    # "a-b c" -> words 2, subwords [a,'-',b,c] = 4
    assert got["fr"] == (2, 4)


def test_fd_audit_from_counts_is_batch_split_invariant(spark):
    """(lhs, rhs) counts are mergeable summaries: folding per-split
    partials must produce the identical audit row as one-shot counting —
    the invariant the streaming_fd_audit twin rides."""
    from trafsys_data_transfer_spark.operators.quality import (
        fd_audit_from_counts,
    )

    rows = [(1, "x")] * 3 + [(1, "y")] + [(2, "x")] * 2 + [(3, "z")] * 4
    df = spark.createDataFrame(rows, ["l", "r"])
    one_shot = fd_audit_one(df, "l", "r", "t").collect()[0]

    # split arbitrarily into two "micro-batches", count each, fold
    a = spark.createDataFrame(rows[:4], ["l", "r"])
    b = spark.createDataFrame(rows[4:], ["l", "r"])
    parts = a.groupBy("l", "r").agg(F.count(F.lit(1)).alias("c")).unionByName(
        b.groupBy("l", "r").agg(F.count(F.lit(1)).alias("c"))
    )
    folded = parts.groupBy("l", "r").agg(F.sum("c").alias("c"))
    from_fold = fd_audit_from_counts(folded, "l", "r", "t").collect()[0]
    assert tuple(one_shot) == tuple(from_fold)
