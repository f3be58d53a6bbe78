"""Unit tests for the round-open rotation chore (scripts/update_rotation.py):
the state renderer must emit valid Python with the exact literals the
window-pin test reads, the empty deferral set must render as ``set()``
(never ``{}`` — an empty dict bound to a set annotation), and the rewrite
regex must keep matching the live __spark_entry__.py so ``--apply`` can
never silently no-op."""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_script():
    spec = importlib.util.spec_from_file_location(
        "update_rotation", os.path.join(REPO, "scripts", "update_rotation.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_render_state_round_trips_through_exec():
    mod = _load_script()
    src = mod.render_state({"q_a": 1, "q_b": 2, "q_c": 2}, {"q_d"}, {"q_b"})
    ns: dict = {}
    exec(src, ns)  # the rendered block must BE valid module code
    assert ns["_DRIVER_VERIFIED_ROUND"] == {"q_a": 1, "q_b": 2, "q_c": 2}
    assert ns["_DRIVER_VERIFIED"] == {"q_a", "q_b", "q_c"}
    assert ns["_DEFERRED_TO_NEXT_ROUND"] == {"q_d"}
    assert ns["_CHANGED_SINCE_VERIFIED"] == {"q_b"}


def test_render_state_empty_deferral_is_a_set_not_a_dict():
    mod = _load_script()
    src = mod.render_state({"q_a": 3}, set(), set())
    assert "_DEFERRED_TO_NEXT_ROUND: set[str] = set()" in src
    ns: dict = {}
    exec(src, ns)
    assert ns["_DEFERRED_TO_NEXT_ROUND"] == set()
    assert isinstance(ns["_DEFERRED_TO_NEXT_ROUND"], set)
    assert ns["_CHANGED_SINCE_VERIFIED"] == set()
    assert isinstance(ns["_CHANGED_SINCE_VERIFIED"], set)


def test_rewrite_regex_matches_live_entry_module():
    mod = _load_script()
    entry_src = open(os.path.join(REPO, "__spark_entry__.py"),
                     encoding="utf-8").read()
    matches = mod.STATE_PAT.findall(entry_src)
    assert len(matches) >= 1, (
        "STATE_PAT no longer matches __spark_entry__.py — "
        "update_rotation.py --apply would silently fail to rewrite"
    )


def test_fold_semantics_refresh_and_prune():
    """Mirror main()'s fold arithmetic on a synthetic artifact: green
    names get the new round stamp (refresh included), red names keep
    their old stamp, deferred names that went green leave the set."""
    results = {
        "old_green_again": {"rows_match": True, "schema_match": True,
                            "hash_match": True, "err": None},
        "new_green": {"rows_match": True, "schema_match": True,
                      "hash_match": True, "err": None},
        "red": {"rows_match": False, "schema_match": True,
                "hash_match": False, "err": "boom"},
    }
    green = sorted(
        n for n, r in results.items()
        if r.get("rows_match") and r.get("schema_match")
        and r.get("hash_match", True) and not r.get("err")
    )
    old = {"old_green_again": 4, "red": 4}
    rnd = 6
    verified = dict(old)
    for n in green:
        verified[n] = rnd
    deferred = {n for n in {"new_green", "held_back"} if n not in green}
    assert verified == {"old_green_again": 6, "red": 4, "new_green": 6}
    assert deferred == {"held_back"}
    # changed-since-verified names drop only when the fold records a
    # fresh green row for them; red/absent names stay flagged
    changed = {n for n in {"old_green_again", "red", "never_ran"}
               if n not in green}
    assert changed == {"red", "never_ran"}
