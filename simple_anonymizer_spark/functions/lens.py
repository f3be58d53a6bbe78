"""JSON lenses — focused string transforms inside JSON column values.

Mirrors the reference lens family (``src/Lens.scala:16-119``): ``Direct``
applies the transform to the raw string; ``Field(name, inner)`` navigates
into an object field; ``ArrayElements(inner)`` maps over array elements.
Failure semantics are lossy-safe and identical to the reference: JSON parse
failures, shape mismatches (object expected / array expected / string
expected), and missing fields all WARN and return the input unchanged
(``src/Lens.scala:62-69, 86-99, 109-118``).

Two compile paths:

* ``compile_pandas`` — schema-less, Arrow-batched pandas UDF running the
  pure-Python lens interpreter. Preserves untargeted keys AND their
  insertion order for arbitrary JSON shapes (like circe's ``noSpaces``
  re-serialization), which Spark's schema-bound ``from_json`` cannot do.
  This is the default/reference-fidelity path.
* ``compile_native`` — for declared ``StructType`` schemas: pure
  ``from_json`` → ``withField`` / ``transform`` → ``to_json`` column
  algebra, entirely JVM-side (the 100 TB hot path). Canonicalizes key
  order to schema order and drops undeclared keys — callers opt in when
  the shape is known and canonicalization is acceptable.
"""

from __future__ import annotations

import json
import logging
from dataclasses import dataclass, field
from typing import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StructType

logger = logging.getLogger(__name__)

StrFn = Callable[[str], str]


# ---------------------------------------------------------------------------
# Lens tree
# ---------------------------------------------------------------------------


class Lens:
    """Base lens. ``modify_json(f)`` returns a JSON-value -> JSON-value fn;
    ``modify(f)`` returns the top-level str -> str fn."""

    def modify(self, f: StrFn) -> StrFn:
        raise NotImplementedError

    def modify_json(self, f: StrFn):
        raise NotImplementedError


@dataclass(frozen=True)
class Direct(Lens):
    """Identity focus (``Lens.scala:42-58``): top-level applies ``f`` to the
    raw string; nested, transforms JSON string scalars only."""

    def modify(self, f: StrFn) -> StrFn:
        return f

    def modify_json(self, f: StrFn):
        def go(value):
            if isinstance(value, str):
                return f(value)
            logger.warning("Expected string but got %s", type(value).__name__)
            return value

        return go


class _JsonLens(Lens):
    """Parse → navigate → compact re-serialize; parse failure passes through
    unchanged (``Lens.scala:62-69``)."""

    def modify(self, f: StrFn) -> StrFn:
        def go(s: str) -> str:
            try:
                parsed = json.loads(s)
            except (ValueError, TypeError):
                logger.warning("Failed to parse JSON")
                return s
            # separators=(",", ":") == circe noSpaces; dicts keep insertion
            # order, so untargeted keys survive byte-for-byte.
            return json.dumps(self.modify_json(f)(parsed), separators=(",", ":"),
                              ensure_ascii=False)

        return go


@dataclass(frozen=True)
class Field(_JsonLens):
    """Navigate into an object field (``Lens.scala:84-101``)."""

    field_name: str
    inner: Lens = field(default_factory=Direct)

    def modify_json(self, f: StrFn):
        inner_fn = self.inner.modify_json(f)

        def go(value):
            if not isinstance(value, dict):
                logger.warning("Expected object but got %s", type(value).__name__)
                return value
            if self.field_name not in value:
                logger.warning("Field '%s' not found in JSON object", self.field_name)
                return value
            out = dict(value)
            out[self.field_name] = inner_fn(value[self.field_name])
            return out

        return go


@dataclass(frozen=True)
class ArrayElements(_JsonLens):
    """Map the inner lens over every array element (``Lens.scala:108-119``)."""

    element_lens: Lens

    def modify_json(self, f: StrFn):
        inner_fn = self.element_lens.modify_json(f)

        def go(value):
            if not isinstance(value, list):
                logger.warning("Expected array but got %s", type(value).__name__)
                return value
            return [inner_fn(v) for v in value]

        return go


# ---------------------------------------------------------------------------
# Compilation to Spark columns
# ---------------------------------------------------------------------------


def compile_pandas(lens: Lens, leaf: StrFn) -> Callable[[Column], Column]:
    """Compile to an Arrow-batched pandas UDF running the lens interpreter.

    Null values pass through untouched (``opt.map`` semantics,
    ``src/OutputColumn.scala:33-34``). The UDF closure only captures the
    lens dataclass tree and the leaf callable — both picklable.
    """
    str_fn = lens.modify(leaf)

    @pandas_udf("string")
    def apply_lens(batch: pd.Series) -> pd.Series:
        return batch.map(lambda v: v if v is None else str_fn(v))

    return lambda c: apply_lens(c)


def compile_native(
    lens: Lens,
    leaf_expr: Callable[[Column], Column],
    schema: StructType | ArrayType,
) -> Callable[[Column], Column]:
    """Compile to pure column algebra for a declared JSON schema.

    Supports ``Field`` chains (incl. nested) and ``ArrayElements`` over
    struct elements with a ``Field`` inner lens. Unlike the pandas path,
    malformed JSON yields null structs (from_json semantics) — callers get
    reference-fidelity passthrough via a null-guard on the parse.
    """

    def rewrite(l: Lens, c: Column) -> Column:
        if isinstance(l, Direct):
            return leaf_expr(c)
        if isinstance(l, Field):
            return c.withField(l.field_name, rewrite(l.inner, c.getField(l.field_name)))
        if isinstance(l, ArrayElements):
            return F.transform(c, lambda e: rewrite(l.element_lens, e))
        raise TypeError(f"unsupported lens {l!r}")

    def apply(c: Column) -> Column:
        parsed = F.from_json(c, schema)
        out = F.to_json(rewrite(lens, parsed))
        # from_json -> null means unparseable: pass the original through.
        return F.when(c.isNull() | parsed.isNull(), c).otherwise(out)

    return apply
