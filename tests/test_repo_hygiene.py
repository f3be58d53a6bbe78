"""Repo hygiene guards.

Round 11 accidentally committed 146 MB of generated sf1 parquet under a
directory literally named ``--help/`` (a generator invocation treated
the flag as an output path, then a blanket ``git add -A`` swept it up).
These guards make that class of accident a test failure: no tracked blob
may exceed the size cap, and no tracked parquet may live outside the
declared fixture paths (test fixtures are tiny goldens; scale data is
regenerated on demand by scripts/make_sf1.py).
"""

from __future__ import annotations

import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MAX_TRACKED_BYTES = 5 * 1024 * 1024

# directories where small binary fixtures are legitimate
FIXTURE_PREFIXES = ("tests/fixtures/", "tests/goldens/")


def _tracked_files() -> list[tuple[str, int]]:
    out = subprocess.run(
        ["git", "ls-files", "-z"], cwd=REPO, check=True,
        capture_output=True, text=True,
    ).stdout
    files = [p for p in out.split("\0") if p]
    sized = []
    for p in files:
        full = os.path.join(REPO, p)
        if os.path.isfile(full):
            sized.append((p, os.path.getsize(full)))
    return sized


def test_no_tracked_blob_exceeds_size_cap():
    oversized = [(p, s) for p, s in _tracked_files() if s > MAX_TRACKED_BYTES]
    assert not oversized, (
        f"tracked files over {MAX_TRACKED_BYTES >> 20} MB — generated data "
        f"must be regenerated (scripts/make_sf1.py), never committed: "
        f"{[(p, f'{s >> 20} MB') for p, s in oversized]}"
    )


def test_no_tracked_parquet_outside_fixture_paths():
    strays = [
        p for p, _ in _tracked_files()
        if p.endswith((".parquet", ".orc"))
        and not p.startswith(FIXTURE_PREFIXES)
    ]
    assert not strays, (
        f"tracked parquet/orc outside declared fixture paths: {strays}"
    )
