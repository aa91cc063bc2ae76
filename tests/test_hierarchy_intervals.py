"""Recursive hierarchy rollup + interval coalescing (r8 additions):
hand-computed closures/islands, termination contracts, edge semantics."""

from __future__ import annotations

import pytest

from trafsys_data_transfer_spark.operators.hierarchy import (
    ancestor_closure,
    hierarchy_rollup,
)
from trafsys_data_transfer_spark.operators.intervals import (
    coalesce_intervals,
)


def _forest(spark):
    # 1 ← 10 ← 100, 1 ← 11, 2 (isolated root)
    return spark.createDataFrame(
        [(1, None), (10, 1), (11, 1), (100, 10), (2, None)],
        "child long, parent long",
    )


def test_ancestor_closure_hand_oracle(spark):
    got = {
        (r.node, r.anc, r.depth)
        for r in ancestor_closure(_forest(spark)).collect()
    }
    self_rows = {(n, n, 0) for n in (1, 2, 10, 11, 100)}
    want = self_rows | {
        (10, 1, 1),
        (11, 1, 1),
        (100, 10, 1),
        (100, 1, 2),
    }
    assert got == want


def test_hierarchy_rollup_sums_whole_subtrees(spark):
    values = spark.createDataFrame(
        [(1, 5), (10, 7), (11, 11), (100, 13), (2, 3)],
        "key long, value long",
    )
    got = {
        r.child: (r.n_subtree, r.subtree_value)
        for r in hierarchy_rollup(_forest(spark), values).collect()
    }
    assert got == {
        1: (4, 36),  # 5 + 7 + 11 + 13
        10: (2, 20),  # 7 + 13
        11: (1, 11),
        100: (1, 13),
        2: (1, 3),
    }


def test_hierarchy_rollup_missing_values_count_as_zero(spark):
    values = spark.createDataFrame([(100, 13)], "key long, value long")
    got = {
        r.child: (r.n_subtree, r.subtree_value)
        for r in hierarchy_rollup(_forest(spark), values).collect()
    }
    assert got[1] == (4, 13) and got[11] == (1, 0)


def test_ancestor_closure_cycle_fails_loudly(spark):
    cyc = spark.createDataFrame(
        [(1, 2), (2, 1)], "child long, parent long"
    )
    with pytest.raises(RuntimeError, match="cycle"):
        ancestor_closure(cyc, max_depth=8)


def test_coalesce_intervals_hand_oracle(spark):
    iv = spark.createDataFrame(
        [
            # key a: [0,10] [5,12] [12,20] merge (overlap + touching);
            #        [25,30] separate
            ("a", 0, 10),
            ("a", 5, 12),
            ("a", 12, 20),
            ("a", 25, 30),
            # key b: containment — [0,100] swallows [10,20]
            ("b", 0, 100),
            ("b", 10, 20),
            # key c: zero-length interval on an island edge merges
            ("c", 1, 1),
            ("c", 1, 4),
        ],
        "key string, start long, end long",
    )
    got = {
        (r.key, r.island_start, r.island_end, r.n_merged)
        for r in coalesce_intervals(iv).collect()
    }
    assert got == {
        ("a", 0, 20, 3),
        ("a", 25, 30, 1),
        ("b", 0, 100, 2),
        ("c", 1, 4, 2),
    }


def test_coalesce_intervals_out_of_order_input_is_order_free(spark):
    rows = [("k", 12, 20), ("k", 0, 10), ("k", 25, 30), ("k", 5, 12)]
    a = coalesce_intervals(
        spark.createDataFrame(rows, "key string, start long, end long")
    )
    b = coalesce_intervals(
        spark.createDataFrame(rows[::-1], "key string, start long, end long")
    )
    key = lambda r: (r.key, r.island_start)  # noqa: E731
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_coalesce_intervals_salted_matches_plain_under_skew(spark):
    """VERDICT r08 task 5: the salted two-phase plan returns EXACTLY the
    plain operator's islands — including summed n_merged — on a corpus
    where one key holds 30% of all rows (the straggler shape the salt
    exists for), across several salt widths."""
    import random

    from trafsys_data_transfer_spark.operators.intervals import (
        coalesce_intervals,
        coalesce_intervals_salted,
    )

    rng = random.Random(7)
    rows = []
    for i in range(3000):
        key = "hot" if i % 10 < 3 else f"k{rng.randrange(40)}"
        s = rng.randrange(0, 50_000)
        rows.append((key, s, s + rng.randrange(0, 30)))
    iv = spark.createDataFrame(rows, "key string, start long, end long")
    want = sorted(map(tuple, coalesce_intervals(iv).collect()))
    for n_salt in (1, 4, 16):
        got = sorted(
            map(tuple, coalesce_intervals_salted(iv, n_salt=n_salt).collect())
        )
        assert got == want, f"n_salt={n_salt}"


def test_sessionize_salted_matches_batch_under_skew(spark, sf_dir):
    """The interval reformulation of sessionization (sessionize_salted)
    emits the batch operator's exact sessions — numbers, bounds, counts
    — on the real events fixture."""
    from trafsys_data_transfer_spark.operators.sessions import (
        sessionize_batch,
        sessionize_salted,
    )
    from trafsys_data_transfer_spark.sources.fixtures import load_table

    events = load_table(spark, sf_dir, "events")
    want = sorted(map(tuple, sessionize_batch(events).collect()))
    got = sorted(map(tuple, sessionize_salted(events).collect()))
    assert got == want


def test_coalesce_intervals_plan_is_one_exchange(spark):
    """The window pass and the final groupBy must share the key
    partitioning: exactly one hash exchange in the physical plan."""
    iv = spark.createDataFrame(
        [("k", 0, 10)], "key string, start long, end long"
    )
    plan = (
        coalesce_intervals(iv)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


# ---------------------------------------------------------------------------
# streaming interval coalescing (r8) — state-fn unit semantics
# ---------------------------------------------------------------------------


def _iv_batch(rows):
    """rows: (event_id, start_minute, end_minute) on the 2024-01-01 clock."""
    import pandas as pd

    return pd.DataFrame(
        {
            "start": [pd.Timestamp(2024, 1, 1, 0, s) for _, s, _ in rows],
            "end": [pd.Timestamp(2024, 1, 1, 0, e) for _, _, e in rows],
            "event_id": [i for i, _, _ in rows],
        }
    )


def _min_ms(m):
    import pandas as pd

    ts = pd.Timestamp(2024, 1, 1) + pd.Timedelta(minutes=m)
    return int(ts.value // 1_000_000)


class _FakeState:
    """Minimal GroupState stub (mirrors tests/test_streaming.py's)."""

    def __init__(self, value=None, wm_ms=0):
        self._v = value
        self.hasTimedOut = False
        self.wm_ms = wm_ms
        self.timeout_ts = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None

    def getCurrentWatermarkMs(self):
        return self.wm_ms

    def setTimeoutTimestamp(self, ts_ms):
        self.timeout_ts = ts_ms


def test_islands_fn_merges_across_batches_and_emits_on_watermark():
    """An island stays OPEN while the watermark could still extend it;
    intervals arriving in later micro-batches merge into it; emission is
    exactly-once when the watermark passes the island end."""
    from trafsys_data_transfer_spark.streaming.islands import _islands_fn

    st = _FakeState()
    # batch 1: [1,5] and [20,25] — wm=0, nothing final
    out1 = list(_islands_fn((7,), iter([_iv_batch([(1, 1, 5), (2, 20, 25)])]), st))
    assert out1 == []
    # batch 2: [4,9] bridges into [1,9]; wm passes minute 15 → [1,9] final
    st.wm_ms = _min_ms(15)
    out2 = list(_islands_fn((7,), iter([_iv_batch([(3, 4, 9)])]), st))
    assert len(out2) == 1
    [(s, e, n)] = list(
        zip(out2[0]["start_us"], out2[0]["end_us"], out2[0]["n_merged"])
    )
    assert (s, e, n) == (_min_ms(1) * 1000, _min_ms(9) * 1000, 2)
    # [20,25] still open, held in state
    assert st.get[0] == [_min_ms(20) * 1000]
    # timeout sweep: wm far ahead flushes the tail exactly once
    st.wm_ms = _min_ms(60)
    out3 = list(_islands_fn((7,), iter([]), st))
    assert out3[0]["n_merged"].tolist() == [1]
    # VERDICT r08 #1: a fully sealed key must LEAVE the state store —
    # empty open-island set == no state, so the timeout sweep removes
    # the entry instead of pinning three empty arrays forever.
    assert not st.exists


def test_islands_fn_quiet_key_state_removed_after_timeout_sweep():
    """State-retention contract (VERDICT r08 task 2): once every island
    for a key is final, the key's state entry is REMOVED — a later
    interval simply opens a fresh island — and a never-stateful key
    (sentinels only) never creates an entry at all."""
    from trafsys_data_transfer_spark.streaming.islands import _islands_fn

    # key that buffers then fully seals in one sweep
    st = _FakeState()
    list(_islands_fn((1,), iter([_iv_batch([(1, 1, 5)])]), st))
    assert st.exists  # open island held
    st.wm_ms = _min_ms(30)
    out = list(_islands_fn((1,), iter([]), st))
    assert len(out) == 1
    assert not st.exists  # removed, not ([], [], [])
    # sentinel-only key: no state entry is ever created
    st2 = _FakeState()
    list(_islands_fn((2,), iter([_iv_batch([(-1, 50, 50)])]), st2))
    assert not st2.exists
    # re-arrival after removal opens a fresh island cleanly
    out2 = list(_islands_fn((1,), iter([_iv_batch([(9, 40, 45)])]), st))
    assert out2 == [] and st.exists and st.get[2] == [1]


def test_islands_stream_and_cap_stream_est_keys_warning(spark):
    """VERDICT r08 task 6: the stateful ingest operators surface the
    frozen-checkpoint state-partition undersizing warning BEFORE the plan
    is built, via the est_keys parameter."""
    import warnings

    from trafsys_data_transfer_spark.streaming.cap import cap_stream
    from trafsys_data_transfer_spark.streaming.islands import islands_stream

    import tempfile

    stream = spark.readStream.schema(
        "user_id long, start timestamp, end timestamp, "
        "event_type string, ts timestamp, event_id long"
    ).parquet(tempfile.mkdtemp(prefix="tds_isl_warn_"))
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        islands_stream(stream, est_keys=n_parts * 4_000 + 1)
        cap_stream(stream, cap=5, est_keys=n_parts * 4_000 + 1)
    fired = [x for x in w if "state partitions undersized" in str(x.message)]
    assert len(fired) == 2
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        islands_stream(stream, est_keys=10)  # comfortably sized: silent
    assert not [
        x for x in w if "state partitions undersized" in str(x.message)
    ]


def test_islands_fn_touching_merges_and_sentinels_never_buffer():
    from trafsys_data_transfer_spark.streaming.islands import _islands_fn

    st = _FakeState()
    # touching: [1,5] + [5,8] merge; sentinel (event_id<0) ignored
    list(
        _islands_fn(
            (9,),
            iter([_iv_batch([(1, 1, 5), (-1, 50, 50), (2, 5, 8)])]),
            st,
        )
    )
    assert st.get[0] == [_min_ms(1) * 1000]
    assert st.get[1] == [_min_ms(8) * 1000]
    assert st.get[2] == [2]


def test_islands_merge_helper_is_order_free_and_associative():
    from trafsys_data_transfer_spark.streaming.islands import _merge

    a = [(0, 10, 1), (5, 12, 1), (12, 20, 1), (25, 30, 1)]
    want = [(0, 20, 3), (25, 30, 1)]
    assert _merge(list(a)) == want
    assert _merge(list(a[::-1])) == want
    # associativity: islands(islands(X) ∪ Y) == islands(X ∪ Y)
    x, y = a[:2], a[2:]
    assert _merge(_merge(list(x)) + list(y)) == want
