"""100× hot-tier scale sweep (VERDICT r07 task 5; SCALE.md twentieth).

SCALE.md's sweeps stop at 10×; this probe replicates the two hot-tier
tables 100× and measures the three components the near-dup/ANN path
lives or dies by at 100 TB:

* ``banded_signatures`` — the shared LSH front half (shingle → MinHash
  signature → banded explode): embarrassingly parallel per-row work plus
  ONE skinny (id, band, bucket) shuffle.
* ``dedup_minhash_lsh`` — the full candidate → verify pipeline, run
  against a CONSTANT-DUP-DENSITY replica (per-replica marker tokens, the
  10× flat-replica protocol): 100× corpus, ~100× planted pairs, so
  super-linear growth would expose a real plan problem, not a protocol
  artifact.
* stored IVF-PQ build + PROBE, timed separately — the probe must stay
  far below corpus growth (partition-pruned cluster dirs, 8-byte code
  rows); "probe flatness" is the serving-tier contract.

Shuffle accounting: Spark 4's AppStatusStore stageList signature isn't
py4j-reachable, so shuffle bytes are measured as the byte DELTA of the
local-mode block-manager directories (blockmgr-*) across each timed
section — local shuffle files are exactly the shuffle writes.

Usage:  python tools/scale100.py [--runs 2] [--skip-build]
Writes one markdown table row per measurement to stdout (for SCALE.md).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from trafsys_data_transfer_spark.registry import all_queries
from trafsys_data_transfer_spark.schemas import FIXTURE_TABLES
from trafsys_data_transfer_spark.session import get_spark
from trafsys_data_transfer_spark.sources.fixtures import load_table

SRC = "/root/testdata/sf0.1"
DST = "/tmp/tds_scale100x"
REPS = 100
SHIFT = 10_000_000


def build_replica(spark) -> None:
    """100× documents (constant-dup-density markers) + embeddings
    (per-replica perturbation); every other table symlinks to sf0.1."""
    os.makedirs(DST, exist_ok=True)
    for name in FIXTURE_TABLES:
        out = os.path.join(DST, f"{name}.parquet")
        if name not in ("documents", "embeddings"):
            if not os.path.lexists(out):
                os.symlink(os.path.join(SRC, f"{name}.parquet"), out)
            continue
        if os.path.exists(os.path.join(out, "_SUCCESS")):
            continue
        base = load_table(spark, SRC, name)
        parts = []
        for rep in range(REPS):
            if name == "documents":
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
            else:
                parts.append(
                    base.select(
                        (F.col("vec_id") + F.lit(rep) * SHIFT).alias("vec_id"),
                        "label",
                        F.expr(
                            f"transform(embedding, (x, i) -> "
                            f"CAST(x + 0.01 * sin({rep} + i) AS FLOAT))"
                        ).alias("embedding"),
                    )
                )
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        # 100 union legs in one write job plan fine, but repartition so the
        # output isn't 100 tiny files per leg
        df.repartition(32).write.mode("overwrite").parquet(out)
        print(f"100x replica built: {name}", file=sys.stderr)


def _blockmgr_bytes() -> int:
    total = 0
    for d in glob.glob("/tmp/blockmgr-*"):
        for root, _dirs, files in os.walk(d):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    return total


def timed(label: str, fn, runs: int = 1):
    """Best-of-N wall + shuffle-byte delta of the best run."""
    best, best_sh, result = None, None, None
    for _ in range(runs):
        sh0 = _blockmgr_bytes()
        t0 = time.time()
        result = fn()
        w = time.time() - t0
        sh = _blockmgr_bytes() - sh0
        if best is None or w < best:
            best, best_sh = w, sh
    print(f"{label}: {best:.2f} s, shuffle {best_sh/1e6:.1f} MB")
    return best, best_sh, result


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--skip-build", action="store_true")
    args = ap.parse_args()

    spark = get_spark("scale100")
    if not args.skip_build:
        build_replica(spark)
    specs = all_queries()
    specs["flagship_revenue_topk"].build(spark, SRC).collect()  # warm JVM
    # warm the Python worker pool
    specs["dedup_minhash_lsh"].build(spark, "/root/testdata/sf0.001").collect()

    from trafsys_data_transfer_spark.operators.dedup import banded_signatures
    from trafsys_data_transfer_spark.operators.similarity import (
        ivfpq_index_probe,
        ivfpq_index_write,
    )

    rows = []
    for scale, sf_dir in (("1x", SRC), ("100x", DST)):
        docs = load_table(spark, sf_dir, "documents")
        w, sh, n = timed(
            f"banded_signatures {scale}",
            lambda d=docs: d.transform(banded_signatures).count(),
            args.runs,
        )
        rows.append(("banded_signatures", scale, w, sh, n))

        w, sh, n = timed(
            f"dedup_minhash_lsh {scale}",
            lambda s=sf_dir: specs["dedup_minhash_lsh"].build(spark, s).count(),
            args.runs,
        )
        rows.append(("dedup_minhash_lsh", scale, w, sh, n))

        emb = load_table(spark, sf_dir, "embeddings")
        path = f"/tmp/tds_ivfpq_{scale}"
        w, sh, _ = timed(
            f"ivfpq_index_write {scale}",
            lambda e=emb, p=path: ivfpq_index_write(e, p),
            1,  # the build is one-time by definition
        )
        rows.append(("ivfpq_index_write", scale, w, sh, None))
        queries = emb.filter(F.col("vec_id") < 8)
        w, sh, n = timed(
            f"ivfpq_index_probe {scale}",
            lambda e=emb, q=queries, p=path: ivfpq_index_probe(
                spark, p, e, q, k=5
            ).count(),
            args.runs,
        )
        rows.append(("ivfpq_index_probe", scale, w, sh, n))

    print("\n| component | scale | wall | shuffle | result rows |")
    print("|---|---|---|---|---|")
    for comp, scale, w, sh, n in rows:
        print(
            f"| {comp} | {scale} | {w:.2f} s | {sh/1e6:.1f} MB |"
            f" {'—' if n is None else n} |"
        )


if __name__ == "__main__":
    main()
