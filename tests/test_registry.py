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
    """The driver records ~50 rows; the round-8 rotation (VERDICT r07
    task 1) fills ALL 50 slots with never-driver-verified strict queries,
    so the family representatives are now the never-windowed flagships —
    the r1-r7 driver-green names sit past the window, still covered by
    tools/verify_local.py."""
    window = set(_PRIORITY[:50])
    for family_member in (
        # traffic reference-parity tier (rollup/merge/watermark variants
        # are driver-green r1-r7; the gap-fill + uptime tier was not)
        "traffic_resample_ffill",
        "traffic_uptime_coverage",
        # streaming tier: MV refresh, CDF feed, exactly-once ingest
        "streaming_mv_refresh",
        "streaming_merge_cdf",
        "streaming_versioned_ingest",
        # timetravel/catalog tier
        "timetravel_rollback_read",
        "catalog_snapshot_join",
        # retrieval stored-index tier
        "text_bm25_index_probe",
        "retrieval_hybrid_rrf",
        # graph tier
        "graph_triangle_census",
        "dedup_components_incremental",
        # layout clustering tier
        "layout_hilbert",
        # entity resolution
        "er_golden_record",
        # behavior analytics
        "events_path_mining",
        # contribution capping (batch twin of the streaming cap)
        "events_contribution_capped",
    ):
        assert family_member in window, f"{family_member} outside 50-row window"


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
