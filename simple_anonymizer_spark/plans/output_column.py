"""Output-column IR + the dynamic row DSL.

Mirrors the reference's sealed ``OutputColumn`` family
(``src/OutputColumn.scala:6-77``) and ``Dynamic`` row dispatch
(``src/TableSpec.scala:73-75``): any ``row.any_name`` attribute access
yields a passthrough ``SourceColumn``; builder methods refine it into
transformed/fixed columns. The IR compiles to Catalyst ``Column``
expressions in ``plans.compiler`` — the reference compiles the same IR to
per-row closures (``src/OutputColumn.scala:54-77``), we compile to
codegen'd expressions.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from ..functions import lens as lens_mod

StrFn = Callable[[str], str]
OptStrFn = Callable[[str | None], str | None]


@dataclass(frozen=True)
class OutputColumn:
    name: str


@dataclass(frozen=True)
class SourceColumn(OutputColumn):
    """Passthrough — raw value unchanged (``src/OutputColumn.scala:30,54-56``)."""

    def map_string(self, fn: StrFn | str, lens: lens_mod.Lens | None = None) -> "TransformedColumn":
        """Apply a string transform (skipping nulls) through an optional lens
        (``src/OutputColumn.scala:33-34``). ``fn`` may be a built-in
        anonymizer name (compiled natively) or any Python callable."""
        return TransformedColumn(self.name, fn, lens or lens_mod.Direct(), opt=False)

    def map_opt_string(self, fn: OptStrFn, lens: lens_mod.Lens | None = None) -> "TransformedColumn":
        """Like map_string but the callable also receives nulls
        (``src/OutputColumn.scala:36-38``; for JSON lenses nulls still pass
        through, ``src/Lens.scala:71-74``)."""
        return TransformedColumn(self.name, fn, lens or lens_mod.Direct(), opt=True)

    def map_json_array(self, build: Callable[["JsonObjectProxy"], "JsonFieldSpec"]) -> "TransformedColumn":
        """``row.phones.map_json_array(lambda o: o.number.map_string(f))`` →
        ``ArrayElements(Field("number"))`` lens (``src/OutputColumn.scala:41-46``)."""
        spec = build(JsonObjectProxy())
        return TransformedColumn(
            self.name,
            spec.fn,
            lens_mod.ArrayElements(lens_mod.Field(spec.field_name, spec.inner)),
            opt=False,
        )

    @property
    def nulled(self) -> "FixedColumn":
        """Write NULL (``src/OutputColumn.scala:72-73``)."""
        return FixedColumn(self.name, None)

    def set_to(self, value: Any) -> "FixedColumn":
        """Write a constant — the reference's ``:=`` (``src/OutputColumn.scala:49-52``)."""
        return FixedColumn(self.name, value)


@dataclass(frozen=True)
class TransformedColumn(OutputColumn):
    """A string transform applied through a lens. ``transform`` is a builtin
    anonymizer name (str) or a Python callable."""

    transform: StrFn | str
    lens: lens_mod.Lens = field(default_factory=lens_mod.Direct)
    opt: bool = False


@dataclass(frozen=True)
class FixedColumn(OutputColumn):
    value: Any


class Row:
    """Dynamic row proxy: attribute access mints SourceColumns
    (``src/TableSpec.scala:73-75``). ``row['weird name']`` covers
    identifiers Python attributes can't express."""

    def __getattr__(self, name: str) -> SourceColumn:
        if name.startswith("_"):
            raise AttributeError(name)
        return SourceColumn(name)

    def __getitem__(self, name: str) -> SourceColumn:
        return SourceColumn(name)


@dataclass(frozen=True)
class JsonFieldSpec:
    field_name: str
    fn: StrFn | str
    inner: lens_mod.Lens


class _JsonFieldProxy:
    def __init__(self, name: str):
        self._name = name

    def map_string(self, fn: StrFn | str) -> JsonFieldSpec:
        return JsonFieldSpec(self._name, fn, lens_mod.Direct())


class JsonObjectProxy:
    """Dynamic JSON-object proxy for map_json_array lambdas
    (``src/OutputColumn.scala:25-27``)."""

    def __getattr__(self, name: str) -> _JsonFieldProxy:
        if name.startswith("_"):
            raise AttributeError(name)
        return _JsonFieldProxy(name)

    def __getitem__(self, name: str) -> _JsonFieldProxy:
        return _JsonFieldProxy(name)
