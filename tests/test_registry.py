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


def test_priority_window_is_never_driver_verified():
    """Round-10 rotation (VERDICT r09 task 1): the driver's 50-row window
    must contain ONLY names that never produced a CORRECTNESS row in
    rounds 1-9 (zero repeats), and the 29 names queued directly behind it
    complete the never-verified set for round 11."""
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen: set[str] = set()
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r0*.json"))):
        with open(path) as fh:
            seen.update(json.load(fh).keys())
    if not seen:  # fresh clone without driver artifacts — nothing to pin
        return
    prior = seen  # the r0* glob stops at round 9 by construction
    repeats = [n for n in _PRIORITY[:79] if n in prior]
    assert repeats == [], (
        f"r1-r9 driver-verified names inside the r10/r11 rotation: {repeats}"
    )
    # new session-4 queries queue BEHIND the rotation (VERDICT r09 task
    # 8), so positions 1-79 are exactly the pre-r10 never-verified set.


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
