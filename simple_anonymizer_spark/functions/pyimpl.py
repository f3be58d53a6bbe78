"""Pure-Python mirror of the anonymizers — the executable spec.

Used by the test suite as the third parity leg (Spark expression ==
DuckDB oracle == this module) and as the row-at-a-time fallback for
``spark.sql`` UDF registration. Never used on the DataFrame hot path.

Semantics mirror ``src/Anonymizer.scala`` (see SURVEY.md §2.8).
"""

from __future__ import annotations

import hashlib

from . import data_lists as d

INT_MAX = 0x7FFFFFFF


def stable_hash(s: str | None) -> int:
    """First 4 MD5 bytes, big-endian, sign bit cleared; null/"" -> 0
    (Anonymizer.scala:27-36)."""
    if s is None or s == "":
        return 0
    digest = hashlib.md5(s.encode("utf-8")).digest()
    return int.from_bytes(digest[:4], "big") & INT_MAX


def _pick(s: str, values: list[str], salt: str = "") -> str:
    return values[stable_hash(s + salt) % len(values)]


def _preserving(fn):
    def wrapped(s, *args, **kwargs):
        if s is None or s == "":
            return s
        return fn(s, *args, **kwargs)

    return wrapped


@_preserving
def first_name(s: str) -> str:
    return _pick(s, d.FIRST_NAMES)


@_preserving
def male_first_name(s: str) -> str:
    return _pick(s, d.MALE_FIRST_NAMES)


@_preserving
def female_first_name(s: str) -> str:
    return _pick(s, d.FEMALE_FIRST_NAMES)


@_preserving
def last_name(s: str) -> str:
    return _pick(s, d.LAST_NAMES)


@_preserving
def state(s: str) -> str:
    return _pick(s, d.STATES)


@_preserving
def state_abbr(s: str) -> str:
    return _pick(s, d.STATE_ABBRS)


@_preserving
def country(s: str) -> str:
    return _pick(s, d.COUNTRIES)


@_preserving
def full_name(s: str) -> str:
    return f"{_pick(s, d.FIRST_NAMES)} {_pick(s, d.LAST_NAMES, '_last')}"


@_preserving
def email(s: str) -> str:
    return (
        f"{_pick(s, d.FIRST_NAMES).lower()}."
        f"{_pick(s, d.LAST_NAMES, '_last').lower()}"
        f"@{_pick(s, d.EMAIL_DOMAINS, '_domain')}"
    )


@_preserving
def phone_number(s: str) -> str:
    h = stable_hash(s)
    digits = [((h >> (i % 30)) & 0xF) % 10 for i in range(10)]
    a, b, c = digits[:3], digits[3:6], digits[6:]
    return f"({''.join(map(str, a))}) {''.join(map(str, b))}-{''.join(map(str, c))}"


@_preserving
def street_address(s: str) -> str:
    number = (stable_hash(s) % 9999) + 1
    return f"{number} {_pick(s, d.LAST_NAMES, '_street')} {_pick(s, d.STREET_SUFFIXES, '_suffix')}"


@_preserving
def city(s: str) -> str:
    return f"{_pick(s, d.LAST_NAMES)}{_pick(s, d.CITY_SUFFIXES, '_suffix')}"


@_preserving
def zip_code(s: str) -> str:
    return f"{(stable_hash(s) % 90000) + 10000:05d}"


@_preserving
def redact(s: str) -> str:
    return "*" * len(s)


def partial_redact(s: str | None, show_first: int = 2, show_last: int = 2) -> str | None:
    if s is None or s == "":
        return s
    if len(s) <= show_first + show_last:
        return "*" * len(s)
    tail = s[len(s) - show_last:] if show_last > 0 else ""
    return s[:show_first] + "*" * (len(s) - show_first - show_last) + tail


@_preserving
def lorem_text(s: str) -> str:
    target = len(s)
    h = stable_hash(s)
    out: list[str] = []
    length = 0
    j = 0
    while length < target:
        word = d.LOREM_WORDS[(h + j) % len(d.LOREM_WORDS)]
        length += len(word) + (1 if out else 0)
        out.append(word)
        j += 1
    return " ".join(out)[:target]


PY_ANONYMIZERS = {
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
