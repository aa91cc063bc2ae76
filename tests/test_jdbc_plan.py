"""JDBC read-plan invariants: every planner's predicate set must be a
COMPLETE, DISJOINT cover of the key domain (plus NULLs) — verified by
executing the predicates with DuckDB against generated key sets."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from trafsys_data_transfer_spark.sources.jdbc_plan import (
    mod_hash_predicates,
    quantile_predicates,
    uniform_stride_predicates,
)


def _cover_counts(keys, preds):
    """For each key (None allowed), how many predicates admit it."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(k,) for k in keys])
    per_key = []
    for k in keys:
        cond = "k IS NULL" if k is None else f"k = {k}"
        n = sum(
            con.sql(
                f"SELECT COUNT(*) FROM t WHERE ({cond}) AND ({p})"
            ).fetchone()[0]
            > 0
            for p in preds
        )
        per_key.append((k, n))
    return per_key


@given(
    lower=st.integers(min_value=-50, max_value=50),
    span=st.integers(min_value=0, max_value=60),
    n=st.integers(min_value=1, max_value=9),
)
@settings(max_examples=25, deadline=None)
def test_uniform_stride_complete_disjoint(lower, span, n):
    upper = lower + span
    preds = uniform_stride_predicates("k", lower, upper, n)
    assert len(preds) == n if n > 1 else len(preds) == 1
    keys = list(range(lower - 2, upper + 3)) + [None]
    for k, hits in _cover_counts(keys, preds):
        assert hits == 1, (k, preds)


@given(
    bs=st.lists(
        st.integers(min_value=-100, max_value=100),
        min_size=0,
        max_size=6,
        unique=True,
    )
)
@settings(max_examples=25, deadline=None)
def test_quantile_predicates_complete_disjoint(bs):
    bs = sorted(bs)
    preds = quantile_predicates("k", bs)
    keys = sorted(
        set(
            [b for b in bs]
            + [b - 1 for b in bs]
            + [b + 1 for b in bs]
            + [-1000, 0, 1000]
        )
    ) + [None]
    for k, hits in _cover_counts(keys, preds):
        assert hits == 1, (k, preds)


def test_quantile_predicates_reject_unsorted():
    with pytest.raises(ValueError):
        quantile_predicates("k", [3, 1])


def test_quantile_predicates_quote_strings():
    preds = quantile_predicates("name", ["b'ob", "carol"])
    assert preds[0] == "name < 'b''ob'"
    assert any("'carol'" in p for p in preds)


def test_mod_hash_complete_disjoint():
    preds = mod_hash_predicates("k", 7)
    keys = list(range(-15, 40)) + [None]
    for k, hits in _cover_counts(keys, preds):
        assert hits == 1, (k, preds)


def test_mod_hash_uses_sign_normalized_mod():
    """ANSI MOD follows the dividend's sign, which would strand negative
    keys — the planner must emit the double-MOD normalization."""
    preds = mod_hash_predicates("k", 3)
    assert preds[0].startswith("MOD(MOD(k, 3) + 3, 3) = 0")
