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
    """The driver records ~50 rows; each operator family must land at least
    one query inside the window."""
    window = set(_PRIORITY[:50])
    for family_member in (
        "flagship_revenue_topk",
        "traffic_hourly_rollup",
        "traffic_merge_upsert",
        "streaming_hourly_rollup",
        # dedup/similarity-join family: the PPJoin exact near-dup join holds
        # the window row since the round-7 rotation (ngram_jaccard, the
        # bounded ground-truth audit, sits past the window driver-green)
        "docs_exact_neardup_join",
        "text_curation_pipeline",
        "sim_topk_bruteforce",
        # multimodal family: decode (real-codec round trip) holds the
        # window row since the round-5 rotation; meta sits past-window
        "multimodal_decode",
        # sessions family: the streaming variant holds the window row since
        # the round-7 rotation (batch events_sessionize sits past-window)
        "streaming_sessionize",
        "events_asof_latest_order",
        "split_train_test",
        # skew family flagship: the JOIN variant (salted agg rotated past
        # the window in round 4 for streaming_enrich_join after three
        # driver-green rounds)
        "skew_salted_join",
        # bucketing family: the AGGREGATION variant holds the window row
        # since the round-7 rotation (the JOIN variant, driver-green
        # r04-r06, sits past the window)
        "bucketed_colocated_agg",
        "layout_compaction",
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
