"""Correctness-window rotation invariants (no Spark needed).

The grading driver checks the FIRST 50 registered queries each round,
so registration order is a correctness budget: a name that never
enters the window is never driver-checked.  A previous session rotated
the window one round ahead of the driver and would have shipped six
brand-new queries unchecked (see the _LEAD_ORDER boundary comment in
plans/registry.py); these tests make that class of mistake fail the
suite instead of an audit.

Rules pinned here, derived from the CORRECTNESS_r*.json files actually
present at the repo root (the driver's own records — no hardcoded
round numbers):
1. every name the driver ever checked must still be registered OR
   carry an audit note in the registry's RETIRED ledger (renaming or
   deleting a checked query without one silently orphans its row);
2. every registered name that has NO driver row yet must sit inside
   the first 50 (new queries displace into the window the round they
   are added — the standing QUERY-ADDITION rule);
3. the window is exactly the registry's first 50 names and
   _LEAD_ORDER is consistent with it;
4. the RETIRED ledger and the live registry are disjoint, and every
   ledger entry names what subsumes it.
"""

from __future__ import annotations

import json
from pathlib import Path

from kafka_avro_order_processing_spark.plans.registry import (
    QUERIES,
    RETIRED,
    _LEAD_ORDER,
)

ROOT = Path(__file__).resolve().parents[1]
WINDOW = 50


def _driver_checked_names() -> set[str]:
    names: set[str] = set()
    for p in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        names.update(json.loads(p.read_text()).keys())
    return names


def test_every_driver_checked_name_is_still_registered():
    checked = _driver_checked_names()
    assert checked, "no CORRECTNESS files found — test layout changed?"
    missing = checked - set(QUERIES) - set(RETIRED)
    assert not missing, (
        f"driver-checked names no longer registered (renamed/deleted "
        f"without a window audit): {sorted(missing)}"
    )


def test_retired_ledger_is_audited_and_disjoint():
    overlap = set(RETIRED) & set(QUERIES)
    assert not overlap, f"retired names still registered: {sorted(overlap)}"
    checked = _driver_checked_names()
    for name, note in RETIRED.items():
        assert name in checked, (
            f"{name}: only driver-checked names need the ledger — "
            "an unchecked query can simply be deleted"
        )
        assert "subsumed by" in note and "r1" in note, (
            f"{name}: audit note must say which query subsumes it "
            "and the round retired"
        )
        # the subsuming query must itself still be live
        subsumer = note.split("subsumed by ")[1].split()[0].rstrip(",.")
        assert subsumer in QUERIES, (
            f"{name}: subsumer {subsumer!r} is not registered"
        )


def test_never_checked_names_sit_inside_the_window():
    checked = _driver_checked_names()
    window = list(QUERIES)[:WINDOW]
    never = [n for n in QUERIES if n not in checked]
    outside = [n for n in never if n not in window]
    assert not outside, (
        f"queries with no driver row registered OUTSIDE the first "
        f"{WINDOW} — they would never be correctness-checked: {outside}"
    )


def test_lead_order_is_a_prefix_and_window_sized():
    names = list(QUERIES)
    assert names[: len(_LEAD_ORDER)] == list(_LEAD_ORDER)
    assert len(_LEAD_ORDER) >= WINDOW, (
        "_LEAD_ORDER shorter than the driver window — the boundary "
        "comment's arithmetic no longer pins the checked set"
    )
