"""SCD Type-2 history build: hand oracle, structural invariants, plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from trafsys_data_transfer_spark.operators.scd import (
    scd2_apply,
    scd2_build,
    scd2_pit_join,
)
from trafsys_data_transfer_spark.sources.fixtures import load_table


def _t(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def _stream(spark):
    rows = [
        # user 1: A A B A — runs [A@0, B@2, A@3]
        (1, _t(0), 10, "A"),
        (1, _t(1), 11, "A"),
        (1, _t(2), 12, "B"),
        (1, _t(3), 13, "A"),
        # user 2: single row → one open version
        (2, _t(5), 20, "X"),
        # user 3: same-ts tie broken by event_id: B(id 30) then A(id 31)
        (3, _t(7), 30, "B"),
        (3, _t(7), 31, "A"),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )


def test_scd2_hand_oracle(spark):
    out = scd2_build(_stream(spark)).collect()
    got = [
        (r.user_id, r.version, r.event_type, r.valid_from, r.valid_to, r.is_current)
        for r in out
    ]
    assert got == [
        (1, 1, "A", _t(0), _t(2), False),
        (1, 2, "B", _t(2), _t(3), False),
        (1, 3, "A", _t(3), None, True),
        (2, 1, "X", _t(5), None, True),
        (3, 1, "B", _t(7), _t(7), False),
        (3, 2, "A", _t(7), None, True),
    ]


def test_scd2_fixture_invariants(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    hist = scd2_build(events).collect()
    by_user: dict[int, list] = {}
    for r in hist:
        by_user.setdefault(r.user_id, []).append(r)
    for user, rows in by_user.items():
        rows.sort(key=lambda r: r.version)
        # contiguous versions, half-open chain, exactly one open interval
        assert [r.version for r in rows] == list(range(1, len(rows) + 1))
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to == b.valid_from
            assert a.event_type != b.event_type
            assert not a.is_current
        assert rows[-1].is_current and rows[-1].valid_to is None
    # every event's attribute is reproduced by its covering interval
    n_versions = sum(len(v) for v in by_user.values())
    ev = events.select("user_id", "ts", "event_id", "event_type").collect()
    for e in ev[:200]:
        covering = [
            r
            for r in by_user[e.user_id]
            if r.valid_from <= e.ts and (r.valid_to is None or e.ts < r.valid_to)
        ]
        # ties at a boundary (valid_to == next valid_from == e.ts) resolve
        # to the newer interval; same-ts attribute flips can cover twice.
        assert covering, (e, by_user[e.user_id])
    assert n_versions >= len(by_user)


def test_scd2_apply_equals_one_shot(spark, sf_dir):
    """For every cutoff, dim ⊕ later-batch == one-shot build."""
    events = load_table(spark, sf_dir, "events")
    lo, hi = events.selectExpr(
        "min(cast(ts as long))", "max(cast(ts as long))"
    ).first()
    one_shot = [tuple(r) for r in scd2_build(events).collect()]
    for frac in (0.25, 0.5, 0.9):
        cutoff = int(lo) + int((int(hi) - int(lo)) * frac)
        from pyspark.sql import functions as F

        early = events.filter(F.col("ts").cast("long") < cutoff)
        late = events.filter(F.col("ts").cast("long") >= cutoff)
        applied = [
            tuple(r) for r in scd2_apply(scd2_build(early), late).collect()
        ]
        assert applied == one_shot, f"cutoff frac {frac}"


def test_scd2_apply_edge_batches(spark):
    stream = _stream(spark)
    dim = scd2_build(stream)
    # appending a no-change batch (same attrs, later ts) leaves versions
    # and open/closed structure intact, with no new rows
    tail = spark.createDataFrame(
        [(1, _t(30), 99, "A"), (2, _t(31), 98, "X")],
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    out = scd2_apply(dim, tail).collect()
    assert len(out) == len(dim.collect())
    assert {(r.user_id, r.version, r.event_type, r.is_current) for r in out} == {
        (r.user_id, r.version, r.event_type, r.is_current) for r in dim.collect()
    }
    # a brand-new key in the batch opens version 1
    fresh = spark.createDataFrame(
        [(7, _t(40), 70, "Q"), (7, _t(41), 71, "R")],
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    got = [r for r in scd2_apply(dim, fresh).collect() if r.user_id == 7]
    assert [(r.version, r.event_type, r.is_current) for r in got] == [
        (1, "Q", False),
        (2, "R", True),
    ]


def test_scd2_pit_join_exactly_one_version_per_fact(spark, sf_dir):
    """Every event is covered by exactly one version (half-open chain;
    zero-length versions match nothing) and that version's attribute is
    the event's own — the self-consistency the construction guarantees."""
    ev = load_table(spark, sf_dir, "events")
    out = scd2_pit_join(ev, scd2_build(ev))
    assert out.count() == ev.count()
    assert out.groupBy("event_id").count().filter("count > 1").count() == 0
    assert out.filter(~F.col("is_consistent")).count() == 0


def test_scd2_pit_join_same_ts_flip(spark):
    """A same-ts attribute flip creates a zero-length version; the PIT
    probe must land on the surviving (second) version."""
    stream = _stream(spark)
    dim = scd2_build(stream)
    probe = spark.createDataFrame(
        [(3, _t(7), 900, "A")],
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    got = scd2_pit_join(probe, dim).collect()
    assert len(got) == 1
    assert got[0].version == 2 and got[0].attr_active == "A"


def test_scd2_single_window_stage(spark, sf_dir):
    """All window functions share one (user_id) partitioning: the plan
    must contain exactly one Exchange (plus AQE reads), no joins."""
    plan = (
        scd2_build(load_table(spark, sf_dir, "events"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    # one hashpartitioning exchange on user_id for the window stack; the
    # final orderBy adds a rangepartitioning exchange — nothing else.
    n_hash_exchanges = plan.count("Exchange hashpartitioning")
    assert n_hash_exchanges == 1, plan


def test_bitemporal_divergence_is_real_and_history_survives(spark, sf_dir):
    """The two transaction-time answers genuinely differ (stragglers
    changed the belief for some users), agree for most, and v1 stays
    readable after the v2 restatement."""
    from trafsys_data_transfer_spark.operators.scd import (
        events_scd2_bitemporal,
    )

    out = events_scd2_bitemporal(spark, sf_dir).collect()
    v1 = {r.user_id: r.attr_at_t for r in out if r.txn_version == 1}
    v2 = {r.user_id: r.attr_at_t for r in out if r.txn_version == 2}
    assert v1 and v2
    common = set(v1) & set(v2)
    changed = [u for u in common if v1[u] != v2[u]]
    assert changed, "restatement must change some point-in-time answers"
    assert len(changed) < len(common), "but not all of them"
    # stragglers can also INTRODUCE users unseen at txn 1
    assert set(v2) >= set(v1)
