"""Round-open chore automation: fold the latest CORRECTNESS_r*.json into
``_DRIVER_VERIFIED`` in __spark_entry__.py.

The driver enumerates only the first 50 ``queries()`` entries per round;
the registry rotation depends on ``_DRIVER_VERIFIED`` being current, and
the verification artifact lands AFTER the round's last commit — so every
round MUST start by running this (round 5's task #1 existed because the
round-4 set went stale). The window-pin test
(test_entry_oracle.py::test_driver_window_fronts_unverified_queries)
fails until this has been run.

Usage: python scripts/update_rotation.py            # dry run (report)
       python scripts/update_rotation.py --apply    # rewrite the set

--apply appends the newly green names to the _DRIVER_VERIFIED literal
(grouped under a round comment) and empties _DEFERRED_TO_NEXT_ROUND of
any name that just got verified. Review + rerank deferrals by hand if
the remaining unverified block still exceeds 50.
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


def latest_correctness() -> tuple[str, dict]:
    paths = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    if not paths:
        raise SystemExit("no CORRECTNESS_r*.json found")
    path = paths[-1]
    return path, json.load(open(path, encoding="utf-8"))


def main() -> None:
    apply = "--apply" in sys.argv
    path, results = latest_correctness()
    green = sorted(
        name for name, r in results.items()
        if r.get("rows_match") and r.get("schema_match")
        and r.get("hash_match", True) and not r.get("err")
    )
    red = sorted(set(results) - set(green))
    new = [n for n in green if n not in entry._DRIVER_VERIFIED]
    print(f"{os.path.basename(path)}: {len(green)} green, {len(red)} red"
          f" ({red if red else 'none'})")
    print(f"new names for _DRIVER_VERIFIED: {len(new)}")
    unverified_after = [
        n for n in QUERIES
        if n not in entry._DRIVER_VERIFIED and n not in new
    ]
    print(f"unverified after update: {len(unverified_after)}")
    if len(unverified_after) > 50:
        print("NOTE: still exceeds the 50-entry window — rerank "
              "_DEFERRED_TO_NEXT_ROUND by hand (lowest-risk last 12+).")
    if not new:
        print("nothing to do")
        return
    if not apply:
        print("dry run — pass --apply to rewrite __spark_entry__.py")
        return

    round_m = re.search(r"_r(\d+)", os.path.basename(path))
    tag = f"round {int(round_m.group(1))}" if round_m else "latest round"
    src_path = os.path.join(REPO, "__spark_entry__.py")
    src = open(src_path, encoding="utf-8").read()

    lines = [f"    # {tag} ({os.path.basename(path)}: "
             f"{len(green)}/{len(results)} green)"]
    row: list[str] = []
    for n in new:
        row.append(f'"{n}"')
        if sum(len(x) + 2 for x in row) > 64:
            lines.append("    " + ", ".join(row) + ",")
            row = []
    if row:
        lines.append("    " + ", ".join(row) + ",")
    block = "\n".join(lines) + "\n}"

    pat = re.compile(r"(_DRIVER_VERIFIED:\s*set\[str\]\s*=\s*\{.*?)\}",
                     re.DOTALL)
    m = pat.search(src)
    if not m:
        raise SystemExit("could not locate _DRIVER_VERIFIED literal")
    src = src[: m.end(1)] + block + src[m.end():]

    # drop now-verified names from the deferral set literal
    def strip_verified(match: re.Match) -> str:
        body = match.group(1)
        for n in new:
            body = re.sub(rf'"\b{re.escape(n)}\b",?\s*', "", body)
        return body + "}"

    src = re.sub(r"(_DEFERRED_TO_NEXT_ROUND:\s*set\[str\]\s*=\s*\{.*?)\}",
                 strip_verified, src, flags=re.DOTALL)
    open(src_path, "w", encoding="utf-8").write(src)
    print(f"rewrote {src_path}; run the window-pin test to confirm:")
    print("  python -m pytest tests/test_entry_oracle.py::"
          "test_driver_window_fronts_unverified_queries -q")


if __name__ == "__main__":
    main()
