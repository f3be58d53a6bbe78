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
