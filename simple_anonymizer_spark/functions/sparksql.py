"""Spark-SQL text mirrors of the anonymizers — native registration for
``spark.sql`` users.

Same structure as the DuckDB mirror (``oracle/duck.py``): each builder
takes a SQL expression string and returns a Spark SQL expression computing
the same value as the native Column builder in ``anonymizers.py``. All
three renderers (Column, Spark SQL, DuckDB SQL) inline the same frozen
``data_lists``, so they cannot drift; value parity across the three is
pinned by ``tests/test_anonymizers.py``.

``register_all`` turns these into SQL scalar functions
(``CREATE OR REPLACE TEMPORARY FUNCTION ... RETURN <expr>``): the body is
inlined into the calling query at analysis time, so a ``spark.sql`` user
writing ``anon_email(c_name)`` gets whole-stage codegen — NOT a
row-at-a-time Python UDF (the round-1 pitfall: ``spark.udf.register`` of
the pyimpl closures silently put production SQL on the slow path).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from . import data_lists as d

INT_MAX = 0x7FFFFFFF


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _sql_array(values: list[str]) -> str:
    return "array(" + ", ".join(_sql_str(v) for v in values) + ")"


def raw_hash(expr: str) -> str:
    """Unsigned value of the first 4 MD5 bytes, sign bit cleared (no
    null/empty guard — callers guard)."""
    return (
        f"(CAST(conv(substring(md5({expr}), 1, 8), 16, 10) AS BIGINT)"
        f" & {INT_MAX})"
    )


def _guard(expr: str, body: str) -> str:
    return f"(CASE WHEN {expr} IS NULL OR {expr} = '' THEN {expr} ELSE {body} END)"


def _guard_int(expr: str, body: str) -> str:
    return f"(CASE WHEN {expr} IS NULL OR {expr} = '' THEN CAST(0 AS BIGINT) ELSE {body} END)"


def stable_hash(expr: str) -> str:
    return _guard_int(expr, raw_hash(expr))


def _salted(expr: str, salt: str | None) -> str:
    return f"concat({expr}, {_sql_str(salt)})" if salt else expr


def pick(expr: str, values: list[str], salt: str | None = None) -> str:
    """``values[stable_hash(expr + salt) % len(values)]`` (1-based index)."""
    h = raw_hash(_salted(expr, salt))
    return (
        f"element_at({_sql_array(values)},"
        f" CAST(pmod({h}, {len(values)}) AS INT) + 1)"
    )


def _list_anon(values: list[str]):
    def build(expr: str) -> str:
        return _guard(expr, pick(expr, values))

    return build


first_name = _list_anon(d.FIRST_NAMES)
male_first_name = _list_anon(d.MALE_FIRST_NAMES)
female_first_name = _list_anon(d.FEMALE_FIRST_NAMES)
last_name = _list_anon(d.LAST_NAMES)
state = _list_anon(d.STATES)
state_abbr = _list_anon(d.STATE_ABBRS)
country = _list_anon(d.COUNTRIES)


def full_name(expr: str) -> str:
    body = (
        f"concat_ws(' ', {pick(expr, d.FIRST_NAMES)},"
        f" {pick(expr, d.LAST_NAMES, '_last')})"
    )
    return _guard(expr, body)


def email(expr: str) -> str:
    body = (
        f"concat(lower({pick(expr, d.FIRST_NAMES)}), '.',"
        f" lower({pick(expr, d.LAST_NAMES, '_last')}), '@',"
        f" {pick(expr, d.EMAIL_DOMAINS, '_domain')})"
    )
    return _guard(expr, body)


def phone_number(expr: str) -> str:
    h = raw_hash(expr)
    digits = [f"pmod(shiftright({h}, {i}) & 15, 10)" for i in range(10)]
    body = (
        "format_string('(%d%d%d) %d%d%d-%d%d%d%d', "
        + ", ".join(digits)
        + ")"
    )
    return _guard(expr, body)


def street_address(expr: str) -> str:
    number = f"(pmod({raw_hash(expr)}, 9999) + 1)"
    body = (
        f"concat_ws(' ', CAST({number} AS STRING),"
        f" {pick(expr, d.LAST_NAMES, '_street')},"
        f" {pick(expr, d.STREET_SUFFIXES, '_suffix')})"
    )
    return _guard(expr, body)


def city(expr: str) -> str:
    body = (
        f"concat({pick(expr, d.LAST_NAMES)},"
        f" {pick(expr, d.CITY_SUFFIXES, '_suffix')})"
    )
    return _guard(expr, body)


def zip_code(expr: str) -> str:
    body = f"format_string('%05d', pmod({raw_hash(expr)}, 90000) + 10000)"
    return _guard(expr, body)


def redact(expr: str) -> str:
    return _guard(expr, f"repeat('*', length({expr}))")


def partial_redact(expr: str, show_first="2", show_last="2") -> str:
    """``show_first``/``show_last`` may be int literals or SQL expressions
    (e.g. function parameter names)."""
    keep = f"({show_first} + {show_last})"
    partial = (
        f"concat(substring({expr}, 1, {show_first}),"
        f" repeat('*', length({expr}) - {keep}),"
        f" substring({expr}, length({expr}) - {show_last} + 1, {show_last}))"
    )
    return (
        f"(CASE WHEN {expr} IS NULL OR {expr} = '' THEN {expr}"
        f" WHEN length({expr}) <= {keep} THEN repeat('*', length({expr}))"
        f" ELSE {partial} END)"
    )


def lorem_text(expr: str) -> str:
    h = raw_hash(expr)
    n = f"length({expr})"
    n_words = f"(CAST(floor(({n} + 1) / 3) AS INT) + 1)"
    lorem = _sql_array(d.LOREM_WORDS)
    words = (
        f"transform(sequence(0, {n_words} - 1),"
        f" j -> element_at({lorem},"
        f" CAST(pmod({h} + j, {len(d.LOREM_WORDS)}) AS INT) + 1))"
    )
    body = f"substring(array_join({words}, ' '), 1, {n})"
    return _guard(expr, body)


SPARKSQL_ANONYMIZERS = {
    "stable_hash": stable_hash,
    "first_name": first_name,
    "male_first_name": male_first_name,
    "female_first_name": female_first_name,
    "last_name": last_name,
    "state": state,
    "state_abbr": state_abbr,
    "country": country,
    "full_name": full_name,
    "email": email,
    "phone_number": phone_number,
    "street_address": street_address,
    "city": city,
    "zip_code": zip_code,
    "redact": redact,
    "lorem_text": lorem_text,
}

_RETURN_TYPES = {"stable_hash": "BIGINT"}


def register_all(spark: SparkSession, prefix: str = "anon_") -> None:
    """Register every anonymizer as a SQL scalar function whose body is the
    native expression text — inlined at analysis time, full codegen, zero
    Python. ``anon_partial_redact`` additionally takes
    ``(show_first INT, show_last INT)``."""
    for name, build in SPARKSQL_ANONYMIZERS.items():
        rt = _RETURN_TYPES.get(name, "STRING")
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {prefix}{name}(__x STRING)"
            f" RETURNS {rt} RETURN {build('__x')}"
        )
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY FUNCTION {prefix}partial_redact"
        "(__x STRING, __first INT, __last INT) RETURNS STRING RETURN "
        + partial_redact("__x", "__first", "__last")
    )
