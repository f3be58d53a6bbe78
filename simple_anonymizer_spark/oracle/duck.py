"""DuckDB SQL mirrors of the anonymizers — the correctness oracle.

Each builder takes a SQL expression string (a column reference or nested
expression) and returns a DuckDB SQL expression computing the same value as
the corresponding native Spark expression in
``simple_anonymizer_spark.functions.anonymizers``. Lists are inlined as
DuckDB list literals from the same frozen ``data_lists`` module, so the
oracle cannot drift from the engine.

DuckDB has no base-conversion function, so ``stable_hash`` decodes the
8-char MD5 hex prefix with a list comprehension over hex digits; exact
integer parity is pinned by ``tests/test_anonymizers.py``.
"""

from __future__ import annotations

from ..functions import data_lists as d

INT_MAX = 0x7FFFFFFF


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _sql_list(values: list[str]) -> str:
    return "[" + ", ".join(_sql_str(v) for v in values) + "]"


def raw_hash(expr: str) -> str:
    """Unsigned value of the first 4 MD5 bytes, sign bit cleared (no
    null/empty guard — callers guard)."""
    return (
        "(CAST(list_sum([(strpos('0123456789abcdef', substr(md5("
        + expr
        + "), i, 1)) - 1) * (16.0 ** (8 - i)) for i in range(1, 9)]) AS BIGINT) % 2147483648)"
    )


def _guard(expr: str, body: str) -> str:
    return f"(CASE WHEN {expr} IS NULL OR {expr} = '' THEN {expr} ELSE {body} END)"


def _guard_int(expr: str, body: str) -> str:
    return f"(CASE WHEN {expr} IS NULL OR {expr} = '' THEN 0 ELSE {body} END)"


def stable_hash(expr: str) -> str:
    return _guard_int(expr, raw_hash(expr))


def _salted(expr: str, salt: str | None) -> str:
    return f"({expr} || {_sql_str(salt)})" if salt else expr


def pick(expr: str, values: list[str], salt: str | None = None) -> str:
    """``values[stable_hash(expr + salt) % len(values)]`` (1-based list index)."""
    h = raw_hash(_salted(expr, salt))
    return f"({_sql_list(values)}[CAST({h} % {len(values)} AS INT) + 1])"


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
    body = f"({pick(expr, d.FIRST_NAMES)} || ' ' || {pick(expr, d.LAST_NAMES, '_last')})"
    return _guard(expr, body)


def email(expr: str) -> str:
    body = (
        f"(lower({pick(expr, d.FIRST_NAMES)}) || '.' || "
        f"lower({pick(expr, d.LAST_NAMES, '_last')}) || '@' || "
        f"{pick(expr, d.EMAIL_DOMAINS, '_domain')})"
    )
    return _guard(expr, body)


def phone_number(expr: str) -> str:
    h = raw_hash(expr)
    digits = [f"((({h} >> {i}) & 15) % 10)" for i in range(10)]
    body = (
        "('(' || " + " || ".join(digits[0:3]) + " || ') ' || "
        + " || ".join(digits[3:6]) + " || '-' || "
        + " || ".join(digits[6:10]) + ")"
    )
    return _guard(expr, body)


def street_address(expr: str) -> str:
    number = f"(({raw_hash(expr)} % 9999) + 1)"
    body = (
        f"(CAST({number} AS VARCHAR) || ' ' || {pick(expr, d.LAST_NAMES, '_street')} "
        f"|| ' ' || {pick(expr, d.STREET_SUFFIXES, '_suffix')})"
    )
    return _guard(expr, body)


def city(expr: str) -> str:
    body = f"({pick(expr, d.LAST_NAMES)} || {pick(expr, d.CITY_SUFFIXES, '_suffix')})"
    return _guard(expr, body)


def zip_code(expr: str) -> str:
    body = f"lpad(CAST((({raw_hash(expr)} % 90000) + 10000) AS VARCHAR), 5, '0')"
    return _guard(expr, body)


def redact(expr: str) -> str:
    return _guard(expr, f"repeat('*', length({expr}))")


def partial_redact(expr: str, show_first: int = 2, show_last: int = 2) -> str:
    keep = show_first + show_last
    partial = (
        f"(substr({expr}, 1, {show_first}) || "
        f"repeat('*', length({expr}) - {keep}) || "
        f"substr({expr}, length({expr}) - {show_last - 1}, {show_last}))"
    )
    return (
        f"(CASE WHEN {expr} IS NULL OR {expr} = '' THEN {expr} "
        f"WHEN length({expr}) <= {keep} THEN repeat('*', length({expr})) "
        f"ELSE {partial} END)"
    )


def lorem_text(expr: str) -> str:
    h = raw_hash(expr)
    n = f"length({expr})"
    n_words = f"(CAST(floor(({n} + 1) / 3) AS BIGINT) + 1)"
    lorem = _sql_list(d.LOREM_WORDS)
    words = (
        f"[{lorem}[CAST(({h} + j) % {len(d.LOREM_WORDS)} AS INT) + 1] "
        f"for j in range(0, {n_words})]"
    )
    body = f"substr(array_to_string({words}, ' '), 1, {n})"
    return _guard(expr, body)


DUCK_ANONYMIZERS = {
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


def shift_timestamp(ts_expr: str, entity_expr: str, max_days: int = 180) -> str:
    """Mirror of anonymizers.shift_timestamp: same raw-hash offset, same
    epoch-microsecond emission."""
    span = 2 * max_days + 1
    h = raw_hash(f"CAST({entity_expr} AS VARCHAR)")
    off = f"(({h} % {span}) - {max_days})"
    return (
        f"(epoch_us(CAST({ts_expr} AS TIMESTAMP)) "
        f"+ {off} * 86400000000)"
    )


def account_number(expr: str) -> str:
    """Mirror of anonymizers.account_number — same two salted hashes,
    same digit extraction, same Luhn fold."""
    h1 = raw_hash(expr)
    h2 = raw_hash(f"({expr} || '_acct2')")
    payload = [f"((({h1} >> {i}) & 15) % 10)" for i in range(6)] + \
              [f"((({h2} >> {i}) & 15) % 10)" for i in range(5)]
    terms = []
    for pos_from_right, d_ in enumerate(reversed(payload)):
        if pos_from_right % 2 == 0:
            terms.append(
                f"(CASE WHEN {d_} * 2 > 9 THEN {d_} * 2 - 9 ELSE {d_} * 2 END)"
            )
        else:
            terms.append(d_)
    total = "(" + " + ".join(terms) + ")"
    check = f"((10 - ({total} % 10)) % 10)"
    digits = " || ".join(
        [f"CAST({p} AS VARCHAR)" for p in payload]
        + [f"CAST({check} AS VARCHAR)"]
    )
    body = f"({digits})"
    return _guard(expr, body)


def prefix_preserving_ip(expr: str, salt: str = "ip") -> str:
    """Mirror of anonymizers.prefix_preserving_ip — same 32 hash terms,
    same bit assembly."""
    terms = []
    for i in range(32):
        prefix = f"({expr} >> {32 - i})" if i > 0 else "0"
        key = f"('{salt}:{i}:' || CAST({prefix} AS VARCHAR))"
        flip = f"({raw_hash(key)} & 1)"
        orig = f"(({expr} >> {31 - i}) & 1)"
        terms.append(f"(xor({orig}, {flip}) << {31 - i})")
    body = "(" + " + ".join(terms) + ")"
    return f"(CASE WHEN {expr} IS NULL THEN NULL ELSE {body} END)"
