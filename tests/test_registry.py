"""Registry/_PRIORITY consistency — enforced here instead of hard-failing
on the driver path (a single renamed query must cost one scorecard row,
never the whole contract)."""

from __future__ import annotations

import warnings

from trafsys_data_transfer_spark.registry import _PRIORITY, all_queries


def test_priority_matches_registry_exactly():
    qs = all_queries()
    assert set(_PRIORITY) <= set(qs), "unregistered _PRIORITY names"
    assert set(qs) <= set(_PRIORITY), (
        "registered queries missing from _PRIORITY (they would land after "
        f"the driver's scorecard window unordered): {set(qs) - set(_PRIORITY)}"
    )
    assert len(_PRIORITY) == len(set(_PRIORITY)), "duplicate _PRIORITY names"


def test_priority_window_front_loads_every_family():
    """The driver records ~50 rows; the round-9 rotation (VERDICT r08
    task 1) fills ALL 50 slots with never-driver-verified strict queries
    — 50 of the 59 that remained after r8, with the 9 deferred
    same-family twins queued directly behind the window for r10.  The
    r1-r8 driver-green names sit past the window, still covered by
    tools/verify_local.py."""
    window = set(_PRIORITY[:50])
    for family_member in (
        # r8 additions: hierarchy + interval coalescing (batch and stream)
        "customer_hierarchy_rollup",
        "events_interval_islands",
        "streaming_interval_islands",
        # the r9 rows-only→strict conversions
        "events_quantile_sketch",
        "events_grouped_quantile_sketch",
        "dedup_hll_sketch_union",
        "events_sliding_active_users_hll",
        "events_time_to_convert_approx",
        # streaming tier never yet windowed
        "streaming_trending_topk",
        "streaming_cusum_changepoints",
        "streaming_percolate",
        "streaming_ohlc_hourly",
        # layout / runtime-filter / fingerprint tiers
        "layout_bloom_file_skip",
        "bloom_prefilter_join",
        "orders_fingerprint_diff_locate",
        # analytics / quality tiers
        "events_max_drawdown",
        "profile_orders_columns",
        "supplier_abc_classification",
        "fk_integrity_audit",
        # graph + timetravel history
        "graph_lpa_communities",
        "timetravel_table_history",
    ):
        assert family_member in window, f"{family_member} outside 50-row window"
    # the deferred strict twins sit immediately after the window (r10)
    next_up = set(_PRIORITY[50:78])
    for deferred in ("events_time_to_convert", "events_sliding_active_users",
                     "split_kfold", "text_percolate"):
        assert deferred in next_up, f"{deferred} not queued for r10"


def test_priority_window_is_all_strict_oracle():
    """VERDICT r05 task 2/7: the driver's 50-row scorecard records rows-only
    queries as `err`, so every query inside the window must carry a strict
    DuckDB oracle.  Locks the round-6 curation against future rotations."""
    qs = all_queries()
    rows_only = [n for n in list(qs)[:50] if qs[n].oracle is None]
    assert rows_only == [], (
        f"rows-only queries inside the driver's 50-row window: {rows_only}; "
        "swap in a strict-oracle family representative instead"
    )


def test_all_queries_is_ordered_by_priority():
    names = list(all_queries())
    assert names[: len(_PRIORITY)] == [n for n in _PRIORITY if n in set(names)]


def test_unregistered_priority_name_warns_but_serves(monkeypatch):
    """A stale _PRIORITY entry degrades gracefully: warning + every
    registered query still served."""
    import trafsys_data_transfer_spark.registry as reg

    monkeypatch.setattr(reg, "_PRIORITY", ("no_such_query",) + reg._PRIORITY)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        qs = reg.all_queries()
    assert any("no_such_query" in str(w.message) for w in caught)
    assert "flagship_revenue_topk" in qs
    assert len(qs) == len(reg._PRIORITY) - 1
