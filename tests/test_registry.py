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
    """Round-11 rotation (VERDICT r10 task 1): the driver's 50-row window
    must contain ONLY names that never produced a CORRECTNESS row in
    rounds 1-10 (zero repeats) — the final 39 never-verified names plus
    the 11 session-5 additions.  After r11 every registered name has had
    a driver row at least once."""
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen: set[str] = set()
    # r1-r10: both single- and double-digit round suffixes.
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        with open(path) as fh:
            seen.update(json.load(fh).keys())
    if not seen:  # fresh clone without driver artifacts — nothing to pin
        return
    repeats = [n for n in _PRIORITY[:50] if n in seen]
    assert repeats == [], (
        f"r1-r10 driver-verified names inside the r11 window: {repeats}"
    )


#: Rows-only-by-design queries allowed inside the r11 window: these are the
#: last never-driver-verified names (VERDICT r10 task 1) and the driver is
#: observed (r6-r10 scorecards: 10 `no_oracle` rows, zero failures) to
#: record rows-only queries as a weaker rows-only check, not as `err`.
_WINDOW_ROWS_ONLY_ALLOWED = {
    "multimodal_image_neardup",
    "text_decontaminate_fuzzy",
    "dedup_incremental_neardup",
    "sim_semantic_dedup_pipeline",
    "pretrain_data_pipeline",
    "tokenizer_bpe_stats",
}


def test_priority_window_is_all_strict_oracle():
    """VERDICT r05 task 2/7 amended by r10 task 1: the window prefers
    strict-oracle queries; the ONLY rows-only entries permitted are the
    pinned never-verified set above (their scorecard rows close full
    coverage this round)."""
    qs = all_queries()
    rows_only = [n for n in list(qs)[:50] if qs[n].oracle is None]
    unexpected = [n for n in rows_only if n not in _WINDOW_ROWS_ONLY_ALLOWED]
    assert unexpected == [], (
        f"unpinned rows-only queries inside the driver's 50-row window: "
        f"{unexpected}; swap in a strict-oracle family representative instead"
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
