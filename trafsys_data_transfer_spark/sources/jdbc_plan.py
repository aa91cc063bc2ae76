"""Partitioned JDBC read planning — the extraction side of the
reference's Oracle story (`/root/reference/script.js` only WRITES to
Oracle; a Spark rebuild that also backfills FROM the warehouse needs
parallel reads that don't hammer one session).

Spark's built-in ``spark.read.jdbc(column, lowerBound, upperBound,
numPartitions)`` only stripes NUMERIC/date columns uniformly — skewed
keys produce straggler partitions, and composite or string keys get no
support at all.  This module plans the predicate set explicitly:

* :func:`uniform_stride_predicates` — the classic [lo, hi) striping,
  but with exact integer bounds arithmetic (no lost rows at either end,
  NULL-key rows routed to the last stripe).
* :func:`quantile_predicates` — equi-DEPTH striping from a sample or
  stats table: each stripe carries ~equal ROWS even under key skew (the
  planner's input is the boundary list, produced by any of the engine's
  exact/sketch quantile operators).
* :func:`mod_hash_predicates` — ``MOD(key, n) = i`` striping for keys
  with pathological ranges (uniform by construction; full-scan per
  stripe on the server side, so only for indexed-hash or small tables).

Every planner returns plain WHERE-clause strings for
``spark.read.jdbc(url, table, predicates=[...])`` — one partition per
predicate, engine-agnostic ANSI SQL.  The invariants (complete, disjoint
cover of the key domain) are pinned by tests/test_jdbc_plan.py; no live
Oracle exists in this sandbox (same boundary as sinks/oracle.py).
"""

from __future__ import annotations


def uniform_stride_predicates(
    column: str, lower: int, upper: int, n: int
) -> list[str]:
    """``n`` half-open stripes covering [lower, upper] exactly, NULLs in
    the last stripe.  Matches Spark's JDBCRelation stride math but never
    drops the boundary rows Spark's open-ended first/last stripes rely
    on the caller to know about."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if upper < lower:
        raise ValueError(f"upper {upper} < lower {lower}")
    if n == 1:
        return [f"{column} IS NOT NULL OR {column} IS NULL"]
    span = upper - lower + 1
    stride, extra = divmod(span, n)
    preds = []
    lo = lower
    for i in range(n):
        hi = lo + stride + (1 if i < extra else 0)
        if i == 0:
            preds.append(f"{column} < {hi}")
        elif i == n - 1:
            preds.append(f"{column} >= {lo} OR {column} IS NULL")
        else:
            preds.append(f"{column} >= {lo} AND {column} < {hi}")
        lo = hi
    return preds

def quantile_predicates(column: str, boundaries: list) -> list[str]:
    """Equi-depth stripes from sorted interior boundaries (e.g. the
    output of the engine's quantile operators at probabilities
    1/n … (n−1)/n): ``len(boundaries) + 1`` predicates, complete and
    disjoint whatever the key skew.  String boundaries are quoted (with
    ``'`` doubled); numeric pass through."""

    def _lit(v) -> str:
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return str(v)

    bs = list(boundaries)
    if any(bs[i] >= bs[i + 1] for i in range(len(bs) - 1)):
        raise ValueError(f"boundaries must be strictly increasing: {bs}")
    if not bs:
        return [f"{column} IS NOT NULL OR {column} IS NULL"]
    preds = [f"{column} < {_lit(bs[0])}"]
    preds += [
        f"{column} >= {_lit(bs[i])} AND {column} < {_lit(bs[i + 1])}"
        for i in range(len(bs) - 1)
    ]
    preds.append(f"{column} >= {_lit(bs[-1])} OR {column} IS NULL")
    return preds


def mod_hash_predicates(column: str, n: int) -> list[str]:
    """``MOD`` striping: uniform by construction for any integer key
    distribution (including hot ranges), at the cost of a server-side
    scan per stripe unless the key is hash-indexed.  NULLs ride stripe
    0.  ANSI MOD follows the DIVIDEND's sign, so a bare ``MOD(k, n) = i``
    strands negative keys — the double-MOD normalizes to [0, n) on
    Oracle, Postgres and DuckDB alike."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    expr = f"MOD(MOD({column}, {n}) + {n}, {n})"
    preds = [f"{expr} = {i}" for i in range(1, n)]
    return [f"{expr} = 0 OR {column} IS NULL"] + preds
