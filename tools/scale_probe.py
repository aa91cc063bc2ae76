"""10× replication scale probe (BASELINE.md / SCALE.md protocol).

Builds a key-shifted 10× replica of the big fixture tables
(`documents`, `embeddings`, `events`) under /tmp — ids shifted per
replica, text/vectors/timestamps perturbed so fingerprints, df
statistics, neighbor structure and session boundaries stay
non-degenerate — symlinks the untouched tables, then measures named
registry queries best-of-2 foreground wall seconds at 1× (sf0.1) vs 10×.
Optionally audits ANN recall (PQ vs brute force) at both scales: wall
clock alone can hide an approximation tier silently degrading as the
corpus grows.

Usage:
    python tools/scale_probe.py [--queries q1 q2 ...] [--recall] [--runs 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from trafsys_data_transfer_spark.registry import all_queries
from trafsys_data_transfer_spark.schemas import FIXTURE_TABLES
from trafsys_data_transfer_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/tmp/tds_scale10x"
REPS = 10
SHIFT = 10_000_000


def build_replica(spark) -> None:
    os.makedirs(DST, exist_ok=True)
    for name in FIXTURE_TABLES:
        out = os.path.join(DST, f"{name}.parquet")
        src = os.path.join(SRC, f"{name}.parquet")
        if name not in ("documents", "embeddings", "events"):
            if not os.path.lexists(out):
                os.symlink(src, out)
            continue
        if os.path.exists(os.path.join(out, "_SUCCESS")):
            continue  # replica already built
        from trafsys_data_transfer_spark.sources.fixtures import load_table

        base = load_table(spark, SRC, name)
        parts = []
        for rep in range(REPS):
            r = F.lit(rep)
            if name == "documents":
                parts.append(
                    base.select(
                        (F.col("doc_id") + r * SHIFT).alias("doc_id"),
                        # per-replica suffix breaks exact fingerprints and
                        # shifts every shingle window once
                        F.concat(
                            F.col("text"), F.lit(f" r{rep}t"),
                            (F.col("doc_id") % 7).cast("string"),
                        ).alias("text"),
                        "lang",
                        "source",
                        (F.col("n_chars") + 5).alias("n_chars"),
                    )
                )
            elif name == "embeddings":
                parts.append(
                    base.select(
                        (F.col("vec_id") + r * SHIFT).alias("vec_id"),
                        "label",
                        # deterministic per-replica rotation-ish perturbation:
                        # ±0.01·(rep+pos) keeps neighbor structure similar but
                        # not identical across replicas
                        F.expr(
                            f"transform(embedding, (x, i) -> "
                            f"CAST(x + 0.01 * sin({rep} + i) AS FLOAT))"
                        ).alias("embedding"),
                    )
                )
            else:  # events
                parts.append(
                    base.select(
                        (F.col("event_id") + r * SHIFT).alias("event_id"),
                        (F.col("user_id") + r * SHIFT).alias("user_id"),
                        (F.col("ts") + F.make_interval(secs=r * 17)).alias("ts"),
                        "event_type",
                        "value",
                        "props",
                    )
                )
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.write.mode("overwrite").parquet(out)
        print(f"replica built: {name}", file=sys.stderr)


DST_FLAT = "/tmp/tds_scale10x_flat"


def build_flat_replica(spark) -> None:
    """Constant-dup-density 10× documents replica (VERDICT r05 task 6):
    the standard replica's light suffix keeps cross-replica copies ABOVE
    the 0.7-Jaccard near-dup threshold, so planted-pair density grows
    ~10× and output-sensitive fuzzy queries look super-linear.  Here each
    replica's text is interleaved with a replica-specific marker token
    after every 3rd word — cross-replica Jaccard over 3-gram shingles
    drops to ~0.14 (no cross-replica candidates survive the verify),
    while WITHIN-replica planted pairs share the same markers at the
    same positions and stay matched — 10× corpus, ~10× pairs, constant
    density."""
    os.makedirs(DST_FLAT, exist_ok=True)
    for name in FIXTURE_TABLES:
        out = os.path.join(DST_FLAT, f"{name}.parquet")
        if name != "documents":
            src = os.path.join(DST, f"{name}.parquet")
            if not os.path.lexists(out):
                os.symlink(src, out)
            continue
        if os.path.exists(os.path.join(out, "_SUCCESS")):
            continue
        from trafsys_data_transfer_spark.sources.fixtures import load_table

        base = load_table(spark, SRC, name)
        parts = []
        for rep in range(REPS):
            parts.append(
                base.select(
                    (F.col("doc_id") + F.lit(rep) * SHIFT).alias("doc_id"),
                    F.expr(
                        "array_join(flatten(transform(split(text, ' '), "
                        f"(w, i) -> CASE WHEN i % 3 = 2 THEN array(w, 'zz{rep}q') "
                        "ELSE array(w) END)), ' ')"
                    ).alias("text"),
                    "lang",
                    "source",
                    (F.col("n_chars") + 5).alias("n_chars"),
                )
            )
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.write.mode("overwrite").parquet(out)
        print(f"flat replica built: {name}", file=sys.stderr)


DST_TAGGED = "/tmp/tds_scale10x_tagged"


def build_tagged_replica(spark) -> None:
    """df-PRESERVING 10× documents replica: every token suffixed with its
    replica id — a 1:1 token mapping, so WITHIN a replica every shingle
    relation (planted dups, n-gram stats, similarity structure) is
    byte-for-byte the 1× corpus's, while the shingle/token spaces of
    different replicas are fully disjoint.  This models "10× more data
    drawn from the same distribution" for frequency-sensitive operators:
    the standard replica multiplies every rare shingle's df by 10 (the
    real corpus growth mode would NOT — rare stays rare), which drives
    candidate counts in df-driven joins quadratic as a pure protocol
    artifact."""
    os.makedirs(DST_TAGGED, exist_ok=True)
    for name in FIXTURE_TABLES:
        out = os.path.join(DST_TAGGED, f"{name}.parquet")
        if name != "documents":
            src = os.path.join(DST, f"{name}.parquet")
            if not os.path.lexists(out):
                os.symlink(src, out)
            continue
        if os.path.exists(os.path.join(out, "_SUCCESS")):
            continue
        from trafsys_data_transfer_spark.sources.fixtures import load_table

        base = load_table(spark, SRC, name)
        parts = []
        for rep in range(REPS):
            parts.append(
                base.select(
                    (F.col("doc_id") + F.lit(rep) * SHIFT).alias("doc_id"),
                    F.expr(
                        "array_join(transform(split(text, ' '), "
                        f"w -> concat(w, '·{rep}')), ' ')"
                    ).alias("text"),
                    "lang",
                    "source",
                    (F.col("n_chars") + 5).alias("n_chars"),
                )
            )
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.write.mode("overwrite").parquet(out)
        print(f"tagged replica built: {name}", file=sys.stderr)


DST_FACT = "/tmp/tds_scale10x_fact"


def build_fact_replica(spark) -> None:
    """10× FACT-side replica (round-7 additions): ``orders`` and
    ``lineitem`` replicated with shifted order keys while dimension keys
    (custkey, suppkey, partkey, orderdate) stay 1× — the real growth
    mode of a star schema (facts grow, dims don't).  events/documents/
    embeddings symlink to the standard replica's 10× tables; true dims
    symlink to sf0.1."""
    from trafsys_data_transfer_spark.sources.fixtures import load_table

    os.makedirs(DST_FACT, exist_ok=True)
    for name in FIXTURE_TABLES:
        out = os.path.join(DST_FACT, f"{name}.parquet")
        if name in ("documents", "embeddings", "events"):
            if not os.path.lexists(out):
                os.symlink(os.path.join(DST, f"{name}.parquet"), out)
            continue
        if name not in ("orders", "lineitem"):
            if not os.path.lexists(out):
                os.symlink(os.path.join(SRC, f"{name}.parquet"), out)
            continue
        if os.path.exists(os.path.join(out, "_SUCCESS")):
            continue
        base = load_table(spark, SRC, name)
        key = "o_orderkey" if name == "orders" else "l_orderkey"
        parts = []
        for rep in range(REPS):
            shifted = base.withColumn(key, F.col(key) + F.lit(rep) * SHIFT)
            parts.append(shifted)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.write.mode("overwrite").parquet(out)
        print(f"fact replica built: {name}", file=sys.stderr)


def time_query(spark, spec, sf_dir: str, runs: int) -> float:
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        spec.build(spark, sf_dir).collect()
        took = time.perf_counter() - t0
        best = took if best is None else min(best, took)
    return best


def recall_audit(spark, sf_dir: str, n_queries: int = 20, k: int = 5) -> dict[str, float]:
    """top-k recall of each ANN tier vs brute force on `sf_dir`'s corpus."""
    from trafsys_data_transfer_spark.operators.similarity import (
        topk_bruteforce,
        topk_pq,
        topk_sq8,
        topk_sq8_rescored,
    )
    from trafsys_data_transfer_spark.sources.fixtures import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < n_queries)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in topk_bruteforce(emb, queries, k=k).collect()
    }
    out = {}
    for tier, fn in (
        ("pq", topk_pq),
        ("sq8", topk_sq8),
        ("sq8_rescored", topk_sq8_rescored),
    ):
        got = {(r.query_id, r.neighbor_id) for r in fn(emb, queries, k=k).collect()}
        out[tier] = len(truth & got) / len(truth)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", nargs="*", default=[])
    ap.add_argument("--recall", action="store_true")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--skip-1x", action="store_true")
    ap.add_argument(
        "--flat",
        action="store_true",
        help="time against the constant-dup-density replica (documents "
        "interleaved with per-replica markers) instead of the standard one",
    )
    ap.add_argument(
        "--tagged",
        action="store_true",
        help="time against the df-preserving replica (every token suffixed "
        "per replica: disjoint shingle spaces, 1x frequency distribution)",
    )
    ap.add_argument(
        "--rows",
        action="store_true",
        help="also print result-row counts at each scale (density evidence)",
    )
    ap.add_argument(
        "--fact",
        action="store_true",
        help="time against the fact-side replica (orders/lineitem 10x with "
        "1x dimension keys — the star-schema growth mode)",
    )
    args = ap.parse_args()

    spark = get_spark("scale_probe")
    build_replica(spark)
    if args.flat:
        build_flat_replica(spark)
    if args.tagged:
        build_tagged_replica(spark)
    if args.fact:
        build_fact_replica(spark)
    big = (
        DST_FACT
        if args.fact
        else DST_TAGGED if args.tagged else (DST_FLAT if args.flat else DST)
    )
    specs = all_queries()
    # warm
    specs["flagship_revenue_topk"].build(spark, SRC).collect()

    for name in args.queries:
        spec = specs[name]
        t1 = None if args.skip_1x else time_query(spark, spec, SRC, args.runs)
        t10 = time_query(spark, spec, big, args.runs)
        one = "—" if t1 is None else f"{t1:.2f} s"
        extra = ""
        if args.rows:
            r1 = "—" if args.skip_1x else spec.build(spark, SRC).count()
            r10 = spec.build(spark, big).count()
            extra = f" rows {r1}→{r10} |"
        print(f"| {name} | {one} | {t10:.2f} s |{extra}")

    if args.recall:
        r1 = recall_audit(spark, SRC)
        r10 = recall_audit(spark, DST)
        for tier in sorted(r1):
            print(
                f"| recall@5 {tier} | {r1[tier]:.2f} | {r10[tier]:.2f} |"
            )


if __name__ == "__main__":
    main()
