"""Round-open chore automation: fold the latest CORRECTNESS_r*.json into
the rotation state in __spark_entry__.py.

The driver enumerates only the first 50 ``queries()`` entries per round;
the registry rotation depends on the rotation state being current, and
the verification artifact lands AFTER the round's last commit — so every
round MUST start by running this (round 5's task #1 existed because the
round-4 set went stale). The window-pin test
(test_entry_oracle.py::test_driver_window_fronts_unverified_queries)
fails until this has been run.

Rotation policy (encoded in __spark_entry__.queries()):

* while never-verified names remain they front the window, in registry
  order (``_DEFERRED_TO_NEXT_ROUND`` ranks within that block when it
  overflows 50);
* verified names follow, ordered oldest-verified-round first — so once
  every query has one green driver round, each subsequent round
  re-verifies the 50 stalest names (a perpetual regression screen).
  Folding an artifact REFRESHES the round stamp of re-verified names,
  which cycles them to the back of the queue.

Usage: python scripts/update_rotation.py            # dry run (report)
       python scripts/update_rotation.py --apply    # rewrite the state

--apply regenerates the ``_DRIVER_VERIFIED_ROUND`` and
``_DEFERRED_TO_NEXT_ROUND`` literals WHOLESALE (never in-place regex
surgery — partial deletion once left orphan comments and could degrade
a set literal to ``{}``, i.e. an empty dict).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry  # noqa: E402
from simple_anonymizer_spark.queries import QUERIES  # noqa: E402

STATE_PAT = re.compile(
    r"_DRIVER_VERIFIED_ROUND:\s*dict\[str,\s*int\]\s*=\s*\{.*?\}\n"
    r".*?_DEFERRED_TO_NEXT_ROUND:\s*set\[str\]\s*=\s*(?:\{.*?\}|set\(\))\n"
    r".*?_CHANGED_SINCE_VERIFIED:\s*set\[str\]\s*=\s*(?:\{.*?\}|set\(\))\n",
    re.DOTALL,
)


def latest_correctness() -> tuple[str, dict]:
    paths = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    if not paths:
        raise SystemExit("no CORRECTNESS_r*.json found")
    path = paths[-1]
    return path, json.load(open(path, encoding="utf-8"))


def _render_set(name: str, values: set[str]) -> list[str]:
    if not values:
        return [f"{name}: set[str] = set()"]
    lines = [f"{name}: set[str] = {{"]
    row: list[str] = []
    for n in sorted(values):
        row.append(f'"{n}"')
        if sum(len(x) + 2 for x in row) > 60:
            lines.append("    " + ", ".join(row) + ",")
            row = []
    if row:
        lines.append("    " + ", ".join(row) + ",")
    lines.append("}")
    return lines


def render_state(verified_round: dict[str, int], deferred: set[str],
                 changed: set[str]) -> str:
    """Render the full rotation-state block as it appears in
    __spark_entry__.py: a round-grouped dict literal plus the deferral
    and changed-since-verified sets (``set()`` when empty, never ``{}``)."""
    lines = ["_DRIVER_VERIFIED_ROUND: dict[str, int] = {"]
    for rnd in sorted(set(verified_round.values())):
        names = sorted(n for n, r in verified_round.items() if r == rnd)
        lines.append(f"    # round {rnd} ({len(names)} green)")
        row: list[str] = []
        for n in names:
            row.append(f'"{n}": {rnd}')
            if sum(len(x) + 2 for x in row) > 60:
                lines.append("    " + ", ".join(row) + ",")
                row = []
        if row:
            lines.append("    " + ", ".join(row) + ",")
    lines.append("}")
    lines.append("_DRIVER_VERIFIED: set[str] = set(_DRIVER_VERIFIED_ROUND)")
    lines.extend(_render_set("_DEFERRED_TO_NEXT_ROUND", deferred))
    lines.append("# Names whose SEMANTICS were rewritten after their last green driver row")
    lines.append("# (the row was earned by the old form, so stalest-first would not surface")
    lines.append("# the new form for several rounds). They rank immediately after the")
    lines.append("# never-verified block. Maintained by hand when a query's semantics")
    lines.append("# change; update_rotation.py auto-drops a name once a fold records a")
    lines.append("# fresh green row for it.")
    lines.extend(_render_set("_CHANGED_SINCE_VERIFIED", changed))
    return "\n".join(lines) + "\n"


def main() -> None:
    apply = "--apply" in sys.argv
    path, results = latest_correctness()
    round_m = re.search(r"_r(\d+)", os.path.basename(path))
    if not round_m:
        raise SystemExit(f"cannot parse round number from {path}")
    rnd = int(round_m.group(1))

    green = sorted(
        name for name, r in results.items()
        if r.get("rows_match") and r.get("schema_match")
        and r.get("hash_match", True) and not r.get("err")
    )
    red = sorted(set(results) - set(green))
    old = dict(entry._DRIVER_VERIFIED_ROUND)
    new_names = [n for n in green if n not in old]
    refreshed = [n for n in green if n in old and old[n] != rnd]

    verified_round = dict(old)
    for n in green:
        verified_round[n] = rnd
    deferred = {n for n in entry._DEFERRED_TO_NEXT_ROUND if n not in green}
    # a fresh green row re-verifies the rewritten semantics — drop the flag
    changed = {n for n in entry._CHANGED_SINCE_VERIFIED if n not in green}

    unverified_after = [n for n in QUERIES if n not in verified_round]
    print(f"{os.path.basename(path)}: {len(green)} green, {len(red)} red"
          f" ({red if red else 'none'})")
    print(f"newly verified: {len(new_names)}; round-stamp refreshed: "
          f"{len(refreshed)}; unverified after update: {len(unverified_after)}")
    if changed:
        print(f"changed-since-verified (still pending re-verification): "
              f"{sorted(changed)}")
    if len(unverified_after) > 50:
        print("NOTE: still exceeds the 50-entry window — rerank "
              "_DEFERRED_TO_NEXT_ROUND by hand (lowest-risk last 12+).")
    if (verified_round == old and deferred == entry._DEFERRED_TO_NEXT_ROUND
            and changed == entry._CHANGED_SINCE_VERIFIED):
        print("nothing to do")
        return
    if not apply:
        print("dry run — pass --apply to rewrite __spark_entry__.py")
        return

    src_path = os.path.join(REPO, "__spark_entry__.py")
    src = open(src_path, encoding="utf-8").read()
    m = STATE_PAT.search(src)
    if not m:
        raise SystemExit("could not locate the rotation-state block")
    src = src[: m.start()] + render_state(verified_round, deferred, changed) + src[m.end():]
    open(src_path, "w", encoding="utf-8").write(src)
    print(f"rewrote {src_path}; run the window-pin test to confirm:")
    print("  python -m pytest tests/test_entry_oracle.py::"
          "test_driver_window_fronts_unverified_queries -q")


if __name__ == "__main__":
    main()
