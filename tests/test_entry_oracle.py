"""Harness-mirror: run every declared query against its DuckDB oracle at
sf0.001 and compare row count, column names, and order-insensitive values —
the same comparison the driver performs at sf0.01."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

import os

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _normalize(rows, columns):
    out = []
    for row in rows:
        vals = []
        for c in columns:
            v = row[c]
            if isinstance(v, float):
                # Full round-trip precision: the engine guarantees
                # bit-identical doubles (DECIMAL accumulation policy), so
                # the mirror compares exact values — stricter than any
                # plausible driver hashing.
                v = "NaN" if math.isnan(v) else repr(v)
            elif isinstance(v, bool):
                v = int(v)
            vals.append((c, str(v)))
        out.append(tuple(vals))
    out.sort()
    return out


# Every query is oracle-gated: sketch-based aggregates emit error-bound
# booleans (each engine checks its own sketch) instead of raw sketch values.
NO_ORACLE: set[str] = set()

# Queries allowed to return ZERO rows at the suite SF, each with a reason.
# Everything else must emit >= 1 row — a 0 == 0 parity match proves only
# that both engines produce an empty table (round-10 verdict found four
# such vacuous gates; this screen keeps new ones out).
EMPTY_OK: dict[str, str] = {
    "q7_nation_volume": (
        "nation-pair x shipdate-year filter leaves no qualifying lineitem "
        "at sf0.001; the driver's sf0.01 run carries 4 rows (green r10)"
    ),
}


def test_all_queries_have_oracles():
    missing = sorted(set(QUERIES) - set(ORACLES) - NO_ORACLE)
    assert not missing, f"queries without oracle: {missing}"
    dangling = sorted(set(ORACLES) - set(QUERIES))
    assert not dangling, f"oracles without query: {dangling}"


def test_driver_window_fronts_unverified_queries():
    """The driver enumerates only the first 50 queries() entries per round.
    Rotation policy: never-driver-verified names form a contiguous block at
    the FRONT (a stale state once wasted a whole driver round, between
    rounds 4 and 5); the verified remainder is ordered stalest-verified-
    round first, so once coverage is total every round re-verifies the 50
    names whose last green row is oldest (perpetual regression screen)."""
    names = list(QUERIES)
    unverified = [n for n in names if n not in entrymod._DRIVER_VERIFIED]
    # the unverified block must be contiguous at the front — only the
    # first min(50, len(unverified)) slots are owed to unverified names
    front = names[: len(unverified)]
    stale = set(front) & entrymod._DRIVER_VERIFIED
    assert not stale, (
        f"{len(stale)} already-verified names rank ahead of "
        f"{len(unverified)} unverified ones — run "
        f"scripts/update_rotation.py --apply: {sorted(stale)[:8]}..."
    )
    # changed-since-verified names rank immediately after the unverified
    # block: their green rows were earned by pre-rewrite semantics, so
    # stalest-first alone would not re-verify the new form for rounds
    changed = [n for n in names if n in entrymod._CHANGED_SINCE_VERIFIED
               and n in entrymod._DRIVER_VERIFIED]
    n_changed = len(changed)
    assert names[len(unverified):len(unverified) + n_changed] == changed, (
        "changed-since-verified names must front the verified tail"
    )
    assert set(changed) <= set(names[:50]) or len(unverified) >= 50, (
        "changed-since-verified names fell out of the 50-entry window"
    )
    # verified tail: stalest round first (non-decreasing round stamps)
    tail_rounds = [entrymod._DRIVER_VERIFIED_ROUND[n]
                   for n in names[len(unverified) + n_changed:]]
    assert tail_rounds == sorted(tail_rounds), (
        "verified names are not ordered oldest-verified-round first"
    )
    # deferral set must never hide names forever: it only ranks names,
    # every deferred name must still be ahead of the verified tail
    for n in entrymod._DEFERRED_TO_NEXT_ROUND:
        assert n in QUERIES
        if n not in entrymod._DRIVER_VERIFIED and len(unverified) > 50:
            assert names.index(n) < len(unverified), n


def test_round8_window_previews_stalest_reverification(monkeypatch):
    """Round-8 window preview: once the 32 still-unverified names go green
    in round 7 (they all fit the 50-slot window), coverage is total and the
    policy flips to the perpetual regression screen — the NEXT window must
    front the 50 stalest names, i.e. all 41 round-1 names first, then the
    oldest remaining stamps, never a recently-refreshed name."""
    simulated = dict(entrymod._DRIVER_VERIFIED_ROUND)
    unverified = [n for n in QUERIES if n not in simulated]
    assert len(unverified) <= 50, (
        "never-verified backlog no longer fits one driver window — "
        "the preview below assumes total coverage after round 7"
    )
    for n in unverified:
        simulated[n] = 7
    simulated.setdefault("embedding_quantize_int8", 7)
    monkeypatch.setattr(entrymod, "_DRIVER_VERIFIED_ROUND", simulated)
    monkeypatch.setattr(entrymod, "_DRIVER_VERIFIED", set(simulated))
    monkeypatch.setattr(entrymod, "_DEFERRED_TO_NEXT_ROUND", set())
    monkeypatch.setattr(entrymod, "_CHANGED_SINCE_VERIFIED", set())

    window = list(entrymod.queries())[:50]
    round1 = {n for n, r in simulated.items() if r == 1}
    assert round1 <= set(window), (
        f"round-1 names missing from the round-8 window: "
        f"{sorted(round1 - set(window))[:8]}"
    )
    cutoff = max(simulated[n] for n in window)
    outside = [n for n in simulated
               if n not in window and simulated[n] < cutoff]
    assert not outside, (
        f"stale names ranked behind fresher ones: {outside[:8]}"
    )


def test_approx_aggregates_bounds_hold(spark):
    """The error-bound booleans must actually be TRUE (not just match the
    oracle's booleans) — a regression in the sketch shows up here first."""
    for r in QUERIES["agg_approx_distinct"](spark, SF_DIR).collect():
        assert r.approx_within_5pct and r.approx_median_in_range, r


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.columns) > 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_rows = [r.asDict() for r in sdf.collect()]

    cur = duck.execute(ORACLES[name])
    cols = [d[0] for d in cur.description]
    duck_rows = [dict(zip(cols, r)) for r in cur.fetchall()]

    assert sorted(sdf.columns) == sorted(cols), (
        f"{name}: column mismatch {sorted(sdf.columns)} vs {sorted(cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    if name not in EMPTY_OK:
        assert spark_rows, (
            f"{name}: 0 rows at {SF_DIR} — the parity gate is vacuous "
            "(0 == 0 proves nothing). Make the query emit rows at the "
            "suite SF or add an EMPTY_OK entry with a reason."
        )
    key = sorted(cols)
    s_norm = _normalize(spark_rows, key)
    d_norm = _normalize(duck_rows, key)
    if s_norm != d_norm:
        diffs = [(a, b) for a, b in zip(s_norm, d_norm) if a != b][:3]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
