"""Property-based tests (hypothesis): determinism, null/empty preservation,
and Python↔DuckDB parity of every anonymizer over arbitrary unicode input.

The Spark↔Python leg is pinned by the example-based parity tests; here the
cheap legs (pure Python, DuckDB) run hundreds of generated cases.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from simple_anonymizer_spark.functions import data_lists as d
from simple_anonymizer_spark.functions import pyimpl as P
from simple_anonymizer_spark.oracle import duck as O

# Exclude surrogates (not UTF-8 encodable) and NUL (cannot be inlined as a
# SQL literal in the DuckDB-parity leg — a harness limit, not an engine one).
texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    min_size=0, max_size=60,
)


@given(texts)
@settings(max_examples=200, deadline=None)
def test_determinism_and_preservation(s):
    for name, fn in P.PY_ANONYMIZERS.items():
        assert fn(s) == fn(s), name
        if s == "":
            assert fn(s) == "", name


@given(texts)
@settings(max_examples=100, deadline=None)
def test_hash_range(s):
    h = P.stable_hash(s)
    assert 0 <= h <= 0x7FFFFFFF


@given(st.lists(texts, min_size=1, max_size=25))
@settings(max_examples=30, deadline=None)
def test_python_duckdb_parity_batch(strings):
    con = duckdb.connect()
    values = ", ".join("(" + "'" + s.replace("'", "''") + "'" + ")" for s in strings)
    for name in ["full_name", "email", "phone_number", "zip_code", "redact",
                 "lorem_text", "city", "street_address"]:
        expr = O.DUCK_ANONYMIZERS[name]("s")
        got = [r[0] for r in con.execute(
            f"SELECT {expr} FROM (VALUES {values}) t(s)").fetchall()]
        expected = [P.PY_ANONYMIZERS[name](s) for s in strings]
        assert got == expected, name


@given(texts.filter(lambda s: s))
@settings(max_examples=100, deadline=None)
def test_outputs_from_frozen_lists(s):
    assert P.first_name(s) in d.FIRST_NAMES
    assert P.last_name(s) in d.LAST_NAMES
    local, _, domain = P.email(s).partition("@")
    assert domain in d.EMAIL_DOMAINS


@given(texts.filter(lambda s: s), st.integers(0, 5), st.integers(0, 5))
@settings(max_examples=100, deadline=None)
def test_partial_redact_properties(s, first, last):
    out = P.partial_redact(s, first, last)
    assert len(out) == len(s)
    if len(s) > first + last:
        assert out[:first] == s[:first]
        if last:
            assert out[len(s) - last:] == s[len(s) - last:]
        assert set(out[first:len(s) - last]) <= {"*"}
    else:
        assert set(out) <= {"*"} or out == ""


@given(texts.filter(lambda s: s))
@settings(max_examples=100, deadline=None)
def test_lorem_length_preserved(s):
    assert len(P.lorem_text(s)) == len(s)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.decimals(min_value=-9999, max_value=9999, places=2),
        min_size=2, max_size=40,
    )
)
def test_moments_match_statistics_on_random_data(spark, vals):
    import statistics

    from pyspark.sql import Row

    from simple_anonymizer_spark.operators import stats

    floats = [float(v) for v in vals]
    df = spark.createDataFrame([Row(g="p", v=v) for v in floats])
    [r] = stats.moments(df, ["g"], "v").collect()
    assert r.mean_v == pytest.approx(statistics.mean(floats), rel=1e-9, abs=1e-9)
    # stddev tolerance follows the documented cancellation bound of the
    # single-pass moment identity: ~2^-25 * |mean| * sqrt(n) absolute.
    tol = 4e-8 * max(1.0, abs(statistics.mean(floats))) * len(floats) ** 0.5
    assert r.stddev_v == pytest.approx(statistics.stdev(floats), rel=1e-7, abs=tol)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.decimals(min_value=0, max_value=9999, places=2),
        min_size=1, max_size=30,
    )
)
def test_median_matches_statistics_on_random_data(spark, vals):
    import statistics

    from pyspark.sql import Row

    from simple_anonymizer_spark.operators import stats

    floats = [float(v) for v in vals]
    df = spark.createDataFrame(
        [Row(g="p", v=v, k=i) for i, v in enumerate(floats)]
    )
    [r] = stats.grouped_median(df, ["g"], "v", "k").collect()
    assert r.median == pytest.approx(statistics.median(floats), abs=1e-9)


# ---------------------------------------------------------------------------
# Brute-force cross-checks for the late round-4 operators: the Spark
# plans must agree with direct pure-Python computations on randomized
# inputs (the reference's property-test strategy, applied to the new
# families).
# ---------------------------------------------------------------------------


def test_triangle_counts_match_bruteforce(spark):
    import itertools
    import random

    from simple_anonymizer_spark.operators.graph import triangle_stats

    rng = random.Random(11)
    edges = {(a, b) for a, b in
             ((rng.randrange(12), rng.randrange(12)) for _ in range(60))
             if a != b}
    undirected = {tuple(sorted(e)) for e in edges}
    adj = {}
    for a, b in undirected:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expected = {n: 0 for n in adj}
    for x, y, z in itertools.combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for n in (x, y, z):
                expected[n] += 1
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    got = {r.node: r.tri_count for r in triangle_stats(df).collect()}
    assert got == expected


def test_assoc_counts_match_bruteforce(spark):
    import itertools
    import random
    from collections import Counter

    from simple_anonymizer_spark.operators.assoc import association_rules

    rng = random.Random(5)
    baskets = {}
    for i in range(40):
        baskets[i] = {rng.choice("abcdefg") for _ in range(rng.randrange(1, 5))}
    supp = Counter(it for items in baskets.values() for it in items)
    pairs = Counter()
    for items in baskets.values():
        for a, b in itertools.combinations(sorted(items), 2):
            pairs[(a, b)] += 1
    rows = [(k, it) for k, items in baskets.items() for it in items]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = {(r.item_a, r.item_b): r for r in
           association_rules(df, "basket", "item", min_item_support=1).collect()}
    assert set(out) == set(pairs)
    for (a, b), r in out.items():
        assert r.pair_count == pairs[(a, b)]
        assert (r.supp_a, r.supp_b) == (supp[a], supp[b])
        assert r.n_baskets == len(baskets)
        assert r.confidence == pairs[(a, b)] / supp[a]


def test_mad_outliers_match_bruteforce(spark):
    import random

    from simple_anonymizer_spark.operators.stats import mad_outliers

    rng = random.Random(3)
    vals = [round(rng.uniform(-50, 50), 2) for _ in range(101)]
    vals += [500.0, -400.0]

    def median_cents(xs):
        s = sorted(xs)
        n = len(s)
        if n % 2:
            return 2 * s[n // 2]
        return s[n // 2 - 1] + s[n // 2]

    cents = [round(v * 100) for v in vals]
    m2 = median_cents(cents)
    dev2 = [abs(2 * u - m2) for u in cents]
    mad4 = median_cents(dev2)
    exp_out = sum(1 for d in dev2 if 2 * d > 3 * mad4)
    df = spark.createDataFrame(
        [("g", float(v), i) for i, v in enumerate(vals)],
        "g string, v double, t long",
    )
    r = mad_outliers(df, ["g"], "v", "t", c=3).collect()[0]
    assert r.n_rows == len(vals)
    assert r.median == m2 / 2 / 100
    assert r.mad == mad4 / 4 / 100
    assert r.n_outliers == exp_out


def test_ks_matches_bruteforce(spark):
    import random

    from simple_anonymizer_spark.operators.stats import ks_statistic

    rng = random.Random(17)
    a = [round(rng.gauss(0, 10), 2) for _ in range(150)]
    b = [round(rng.gauss(3, 12), 2) for _ in range(130)]

    def ecdf_sup(xs, ys):
        vals = sorted(set(xs) | set(ys))
        best = 0.0
        for v in vals:
            fa = sum(1 for x in xs if x <= v) / len(xs)
            fb = sum(1 for y in ys if y <= v) / len(ys)
            best = max(best, abs(fa - fb))
        return best

    expected = ecdf_sup(a, b)
    da = spark.createDataFrame([(v,) for v in a], "v double")
    db = spark.createDataFrame([(v,) for v in b], "v double")
    r = ks_statistic(da, db, "v").collect()[0]
    assert abs(r.ks - expected) < 1e-12
    assert (r.n_a, r.n_b) == (150, 130)


def test_bpe_segmentation_reconstructs_every_word(spark):
    import random

    from simple_anonymizer_spark.operators.textprep import (
        bpe_segment,
        bpe_train,
    )

    rng = random.Random(23)
    words = ["".join(rng.choice("abcd") for _ in range(rng.randrange(1, 7)))
             for _ in range(80)]
    docs = spark.createDataFrame(
        [(i, " ".join(words[i * 8:(i + 1) * 8])) for i in range(10)],
        "doc_id long, text string",
    )
    merges = [tuple(r) for r in bpe_train(docs, n_merges=10).collect()]
    out = {r.doc_id: r.pieces for r in bpe_segment(docs, merges).collect()}
    for i in range(10):
        # strip spaces and </w> markers: the original text must survive
        # segmentation losslessly, whatever merges were learned.
        rebuilt = out[i].replace(" ", "").replace("</w>", " ").strip()
        assert rebuilt == " ".join(words[i * 8:(i + 1) * 8])


_dirty = st.text(
    alphabet=st.sampled_from(list(" \t\n\x07\x0b\x7fabXY.#…-*")),
    min_size=0, max_size=80,
)


@given(st.lists(_dirty, min_size=1, max_size=20))
@settings(max_examples=40, deadline=None)
def test_normalize_idempotent_and_shrinking(strings):
    """normalize(normalize(x)) == normalize(x) and output never grows —
    the canonical-form property, checked on the DuckDB leg of the shared
    regex chain (identical pattern text to the Spark side) over strings
    biased toward control chars and whitespace runs."""
    from simple_anonymizer_spark.operators.textprep import normalize_text_sql

    con = duckdb.connect()
    values = ", ".join(
        "('" + s.replace("'", "''") + "')" for s in strings
    )
    once = normalize_text_sql("s")
    twice = normalize_text_sql(f"({once})")
    rows = con.execute(
        f"SELECT s, {once}, {twice} FROM (VALUES {values}) t(s)"
    ).fetchall()
    for s, a, b in rows:
        assert a == b, (s, a, b)
        assert len(a) <= len(s), (s, a)
        assert not a.startswith((" ", "\n")) and not a.endswith((" ", "\n"))


_cfg_scalar = st.one_of(
    st.sampled_from(["passthrough", "null", "first_name", "email",
                     "redact", "bogus_anon", "", "set"]),
    st.integers(-5, 5), st.none(), st.booleans(),
)
_cfg_col = st.one_of(
    _cfg_scalar,
    st.dictionaries(
        st.sampled_from(["set", "anonymizer", "lens", "extra", "where"]),
        st.one_of(_cfg_scalar,
                  st.dictionaries(st.sampled_from(["field", "array_field",
                                                   "bad_kind"]),
                                  st.text(max_size=8), max_size=1)),
        max_size=3,
    ),
)
_cfg_table = st.dictionaries(
    st.sampled_from(["where", "limit", "batch_size", "on_conflict",
                     "columns", "unknown_key"]),
    st.one_of(st.text(max_size=12), st.integers(-2, 1000), st.none(),
              st.dictionaries(st.text(min_size=1, max_size=6), _cfg_col,
                              max_size=4)),
    max_size=5,
)


@given(_cfg_table)
@settings(max_examples=150, deadline=None)
def test_spec_config_fails_closed(cfg):
    """The config front door's contract: ANY malformed policy document
    raises ValueError (or TypeError for non-int limits) at plan time —
    never a stray KeyError/AttributeError deep in the compiler — and a
    document that parses yields a TableSpec with one output column per
    configured column."""
    from simple_anonymizer_spark.plans.spec_config import spec_from_config
    from simple_anonymizer_spark.plans.table_spec import TableSpec

    try:
        spec = spec_from_config(cfg)
    except (ValueError, TypeError):
        return  # fail-closed: the allowed plan-time rejection
    assert isinstance(spec, TableSpec)
    assert len(spec.columns) == len(cfg["columns"])


# ---------------------------------------------------------------------------
# Canary audit (operators/privacy.py)
# ---------------------------------------------------------------------------


def test_canary_inject_detect_inverse(spark):
    from simple_anonymizer_spark.operators import privacy

    docs = spark.createDataFrame(
        [(i, f"document body {i}") for i in range(64)],
        "doc_id long, text string",
    )
    planted = privacy.inject_canaries(docs, rate_mod=4)
    exp = privacy.expected_canaries(docs, rate_mod=4)
    found = privacy.detect_canaries(planted)
    r = privacy.canary_report(found, exp).first()
    assert r.n_expected > 0
    assert r.n_found == r.n_expected
    assert r.n_missing == 0 and r.n_spurious == 0


def test_canary_destructive_stage_reports_missing(spark):
    from pyspark.sql import functions as F

    from simple_anonymizer_spark.operators import privacy

    docs = spark.createDataFrame(
        [(i, f"document body {i}") for i in range(64)],
        "doc_id long, text string",
    )
    planted = privacy.inject_canaries(docs, rate_mod=4)
    # a stage that truncates every document destroys the appended canaries
    truncated = planted.withColumn("text", F.substring("text", 1, 10))
    r = privacy.canary_report(
        privacy.detect_canaries(truncated),
        privacy.expected_canaries(docs, rate_mod=4),
    ).first()
    assert r.n_expected > 0
    assert r.n_found == 0
    assert r.n_missing == r.n_expected


def test_canary_spurious_content_flagged(spark):
    from simple_anonymizer_spark.operators import privacy

    docs = spark.createDataFrame(
        [(1, "clean"), (2, "already has CANARY0123456789abcdef inside")],
        "doc_id long, text string",
    )
    r = privacy.canary_report(
        privacy.detect_canaries(docs),
        privacy.expected_canaries(docs, rate_mod=1_000_000_000),
    ).first()
    assert r.n_expected == 0
    assert r.n_spurious == 1


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc"]), min_size=0, max_size=14),
        min_size=2, max_size=6,
    ),
    st.integers(min_value=2, max_value=4),
)
def test_span_islands_match_bruteforce(spark, token_lists, k):
    """duplicate_span_islands against a direct Python computation on
    random tiny-alphabet corpora (duplication-rich by construction):
    the maximal spans must coincide exactly, including the sub-k
    whole-document-gram case."""
    from simple_anonymizer_spark.operators.textprep import (
        duplicate_span_islands,
    )

    docs = [(i, " ".join(ts)) for i, ts in enumerate(token_lists)]

    grams: dict[str, set[int]] = {}
    for d, ts in enumerate(token_lists):
        n = len(ts)
        if n == 0:
            continue
        for s in range(0, max(n - k, 0) + 1):
            g = " ".join(ts[s:s + k])
            grams.setdefault(g, set()).add(d)
    dup = {g for g, ds in grams.items() if len(ds) >= 2}
    want: dict[int, list[tuple[int, int]]] = {}
    for d, ts in enumerate(token_lists):
        n = len(ts)
        if n == 0:
            continue
        covered: set[int] = set()
        for s in range(0, max(n - k, 0) + 1):
            if " ".join(ts[s:s + k]) in dup:
                covered.update(range(s, s + k))
        runs: list[list[int]] = []
        for pos in sorted(covered):
            if runs and pos == runs[-1][0] + runs[-1][1]:
                runs[-1][1] += 1
            else:
                runs.append([pos, 1])
        if runs:
            want[d] = [tuple(r) for r in runs]

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got: dict[int, list[tuple[int, int]]] = {}
    for r in duplicate_span_islands(df, k=k).collect():
        got.setdefault(r.doc_id, []).append((r.span_start, r.span_len))
    got = {d: sorted(v) for d, v in got.items()}
    want = {d: sorted(v) for d, v in want.items()}
    assert got == want
