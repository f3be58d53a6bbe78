"""Three-way parity + contract tests for the anonymizers.

Ports the contracts of the reference's ``tests/AnonymizerTest.scala`` (hash
properties, per-anonymizer output shapes, null/empty preservation,
determinism) and adds the engine-specific lock: the native Spark
expression, the DuckDB oracle SQL, and the pure-Python spec must agree
bit-for-bit on every input.
"""

from __future__ import annotations

import hashlib
import re

import duckdb
import pytest
from pyspark.sql import functions as F

from simple_anonymizer_spark.functions import anonymizers as A
from simple_anonymizer_spark.functions import data_lists as d
from simple_anonymizer_spark.functions import pyimpl as P
from simple_anonymizer_spark.oracle import duck as O

INPUTS = [
    "John", "jane doe", "x", "Ünïcödé", "John Smith", "a" * 100,
    "555-123-4567", "test@example.com", "123 Main St", "",
    None, "O'Brien", 'quo"te', "tab\tsep", "line\nbreak", "ñ",
    "这是中文", "مرحبا", "🎉emoji", " leading space", "trailing ",
]
NON_EMPTY = [s for s in INPUTS if s]

PAIRED = sorted(set(P.PY_ANONYMIZERS) & set(O.DUCK_ANONYMIZERS))


# ---------- hash kernel ----------

def test_stable_hash_null_empty_zero():
    assert P.stable_hash(None) == 0
    assert P.stable_hash("") == 0


def test_stable_hash_matches_md5_prefix():
    for s in NON_EMPTY:
        digest = hashlib.md5(s.encode()).digest()
        expected = int.from_bytes(digest[:4], "big") & 0x7FFFFFFF
        assert P.stable_hash(s) == expected


def test_stable_hash_distribution():
    # Port of AnonymizerTest.scala:34-38 — hashes over 1000 inputs spread out.
    hashes = {P.stable_hash(f"input_{i}") for i in range(1000)}
    assert len(hashes) > 990


# ---------- three-way parity ----------

def _spark_outputs(spark, name):
    fn = A.ANONYMIZERS[name]
    df = spark.createDataFrame([(s,) for s in INPUTS], "s string")
    return [r.out for r in df.select(fn("s").alias("out")).collect()]


def _duck_outputs(name):
    con = duckdb.connect()
    expr = O.DUCK_ANONYMIZERS[name]("s")
    values = ", ".join(
        "(NULL)" if s is None else "('" + s.replace("'", "''") + "')" for s in INPUTS
    )
    rows = con.execute(
        f"SELECT {expr} FROM (VALUES {values}) t(s)"
    ).fetchall()
    return [r[0] for r in rows]


@pytest.mark.parametrize("name", PAIRED)
def test_three_way_parity(spark, name):
    py_fn = P.PY_ANONYMIZERS.get(name, P.stable_hash if name == "stable_hash" else None)
    expected = [py_fn(s) for s in INPUTS]
    assert _spark_outputs(spark, name) == expected, f"spark != python for {name}"
    duck = _duck_outputs(name)
    # DuckDB hash comes back as Decimal/int for stable_hash.
    if name == "stable_hash":
        duck = [int(v) if v is not None else None for v in duck]
    assert duck == expected, f"duckdb != python for {name}"


def test_stable_hash_parity_spark_vs_python(spark):
    df = spark.createDataFrame([(s,) for s in INPUTS], "s string")
    got = [r.h for r in df.select(A.stable_hash("s").alias("h")).collect()]
    assert got == [P.stable_hash(s) for s in INPUTS]


def test_partial_redact_parity(spark):
    for first, last in [(2, 2), (0, 4), (3, 0), (1, 1)]:
        df = spark.createDataFrame([(s,) for s in INPUTS], "s string")
        got = [
            r.out
            for r in df.select(A.partial_redact("s", first, last).alias("out")).collect()
        ]
        expected = [P.partial_redact(s, first, last) for s in INPUTS]
        assert got == expected

        con = duckdb.connect()
        values = ", ".join(
            "(NULL)" if s is None else "('" + s.replace("'", "''") + "')" for s in INPUTS
        )
        duck = [
            r[0]
            for r in con.execute(
                f"SELECT {O.partial_redact('s', first, last)} FROM (VALUES {values}) t(s)"
            ).fetchall()
        ]
        assert duck == expected


# ---------- output-shape contracts (AnonymizerTest.scala ports) ----------

def test_email_format_and_safe_domains():
    for s in NON_EMPTY:
        out = P.email(s)
        local, _, domain = out.partition("@")
        assert domain in d.EMAIL_DOMAINS
        assert "." in local
        assert out == out.lower() or any(ch.isupper() for ch in domain) is False


def test_phone_format():
    pat = re.compile(r"^\(\d{3}\) \d{3}-\d{4}$")
    for s in NON_EMPTY:
        assert pat.match(P.phone_number(s)), P.phone_number(s)


def test_zip_range():
    for s in NON_EMPTY:
        z = P.zip_code(s)
        assert re.match(r"^\d{5}$", z)
        assert 10000 <= int(z) <= 99999


def test_redact_exact():
    assert P.redact("hello") == "*****"
    assert P.partial_redact("1234567890") == "12******90"
    assert P.partial_redact("abc") == "***"   # len <= first+last -> full mask


def test_lorem_preserves_length():
    for s in NON_EMPTY:
        assert len(P.lorem_text(s)) == len(s)


def test_list_membership():
    for s in NON_EMPTY:
        assert P.first_name(s) in d.FIRST_NAMES
        assert P.last_name(s) in d.LAST_NAMES
        assert P.state(s) in d.STATES
        assert P.country(s) in d.COUNTRIES


def test_determinism_and_null_preservation():
    for name, fn in P.PY_ANONYMIZERS.items():
        assert fn(None) is None, name
        assert fn("") == "", name
        for s in NON_EMPTY:
            assert fn(s) == fn(s), name


def test_full_name_composition():
    for s in NON_EMPTY:
        first, _, last = P.full_name(s).partition(" ")
        assert first == P.first_name(s)
        assert last == P.last_name(s + "_last") or last in d.LAST_NAMES


# ---------------------------------------------------------------------------
# Per-entity date shifting
# ---------------------------------------------------------------------------


def test_shift_dates_preserves_intra_entity_intervals(spark):
    from pyspark.sql import functions as F

    from simple_anonymizer_spark.functions import anonymizers as A

    day_us = 86_400_000_000
    rows = [
        (1, "cust_a", 100), (2, "cust_a", 107),   # 7 days apart
        (3, "cust_b", 100), (4, "cust_b", 101),
    ]
    df = spark.createDataFrame(
        [(k, e, d * 86400 * 10**6) for k, e, d in rows],
        "k long, entity string, us long",
    ).select("k", "entity", F.timestamp_micros(F.col("us")).alias("ts"))
    out = {r.k: r.s for r in df.select(
        "k", A.shift_timestamp("ts", "entity").alias("s")).collect()}
    # intervals survive per entity
    assert out[2] - out[1] == 7 * day_us
    assert out[4] - out[3] == 1 * day_us
    # the shift is a whole number of days within +/-180
    for k, e, d in rows:
        off = out[k] - d * day_us
        assert off % day_us == 0
        assert abs(off // day_us) <= 180
    # different entities generally shift differently
    assert (out[1] - 100 * day_us) != (out[3] - 100 * day_us)


def test_shift_dates_null_propagates(spark):
    from pyspark.sql import functions as F

    from simple_anonymizer_spark.functions import anonymizers as A

    df = spark.createDataFrame(
        [(1, None, 1000), (2, "e", None)],
        "k long, entity string, us long",
    ).select("k", "entity",
             F.timestamp_micros(F.col("us")).alias("ts"))
    out = {r.k: r.s for r in df.select(
        "k", A.shift_timestamp("ts", "entity").alias("s")).collect()}
    assert out[1] is None and out[2] is None


# ---------------------------------------------------------------------------
# Luhn account numbers
# ---------------------------------------------------------------------------


def _luhn_ok(s: str) -> bool:
    total = 0
    for pos, ch in enumerate(reversed(s)):
        d = int(ch)
        if pos % 2 == 1:          # every second digit from the check digit
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def test_account_number_is_luhn_valid_and_deterministic(spark):
    from pyspark.sql import functions as F

    from simple_anonymizer_spark.functions import anonymizers as A

    df = spark.createDataFrame(
        [(f"name_{i}",) for i in range(50)], "s string"
    )
    out = [r.a for r in df.select(A.account_number("s").alias("a")).collect()]
    assert all(len(a) == 12 and a.isdigit() for a in out)
    assert all(_luhn_ok(a) for a in out)
    again = [r.a for r in df.select(A.account_number("s").alias("a")).collect()]
    assert out == again
    assert len(set(out)) > 40          # hash-spread, not constant


def test_account_number_null_empty_passthrough(spark):
    from simple_anonymizer_spark.functions import anonymizers as A

    df = spark.createDataFrame([(None,), ("",), ("x",)], "s string")
    out = {r.s: r.a for r in
           df.select("s", A.account_number("s").alias("a")).collect()}
    assert out[None] is None and out[""] == ""
    assert len(out["x"]) == 12


# ---------------------------------------------------------------------------
# Prefix-preserving IP anonymization
# ---------------------------------------------------------------------------


def _anon_ips(spark, ips):
    from simple_anonymizer_spark.functions import anonymizers as A

    df = spark.createDataFrame([(i, v) for i, v in enumerate(ips)],
                               "k long, ip long")
    out = df.select("k", A.prefix_preserving_ip("ip").alias("a")).collect()
    return [r.a for r in sorted(out, key=lambda r: r.k)]


def _lcp(a, b):
    x = (a ^ b) & 0xFFFFFFFF
    return 32 - x.bit_length()


def test_ip_anonymization_preserves_prefix_lengths_exactly(spark):
    import random

    rng = random.Random(9)
    ips = [rng.randrange(1 << 32) for _ in range(12)]
    # add structured pairs: same /24, same /16, adjacent addresses
    base = 0xC0A80100  # 192.168.1.0
    ips += [base + 5, base + 9, base ^ (1 << 12), base ^ 1]
    anon = _anon_ips(spark, ips)
    for i in range(len(ips)):
        for j in range(i + 1, len(ips)):
            assert _lcp(anon[i], anon[j]) == _lcp(ips[i], ips[j]), (
                ips[i], ips[j])
    # one-way-ish: addresses moved
    assert any(a != v for a, v in zip(anon, ips))


def test_ip_anonymization_deterministic_and_null(spark):
    from simple_anonymizer_spark.functions import anonymizers as A

    ips = [0, 1, 0xFFFFFFFF, 0x7F000001]
    assert _anon_ips(spark, ips) == _anon_ips(spark, ips)
    df = spark.createDataFrame([(1, None)], "k long, ip long")
    assert df.select(A.prefix_preserving_ip("ip").alias("a")).collect()[0].a is None
    # output stays a valid IPv4 integer
    assert all(0 <= a < (1 << 32) for a in _anon_ips(spark, ips))
