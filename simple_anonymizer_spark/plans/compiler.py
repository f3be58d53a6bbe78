"""Spec → DataFrame compiler.

The reference compiles each ``OutputColumn`` to a per-row closure executed
one row at a time (``src/CopyAction.scala:186-197``). We compile the same
IR to Catalyst ``Column`` expressions: built-in anonymizers through a
``Direct`` lens become pure native expressions (whole-stage codegen, the
100 TB path); JSON-lens transforms and arbitrary user callables become
Arrow-batched pandas UDFs (the reference's entire surface is user
closures, so this is strictly faster than its baseline).

Pipeline shape per table (``SCAN → FILTER → PROJECT+TRANSFORM → [TOP-K]``,
SURVEY.md §2): filters are applied BEFORE projection so Catalyst can push
predicates into the scan over the original column set.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions import anonymizers as A
from ..functions import lens as lens_mod
from ..functions import pyimpl as P
from .output_column import FixedColumn, OutputColumn, SourceColumn, TransformedColumn
from .table_spec import TableSpec


@dataclass(frozen=True)
class NativeTransform:
    """A transform with both a native expression builder and a Python
    mirror — lets users plug custom dual implementations into the DSL."""

    expr: Callable[[Column], Column]
    py: Callable[[str | None], str | None]


def _resolve(transform) -> NativeTransform:
    """Resolve a transform spec (builtin name / callable / NativeTransform)
    into its native-expression and Python forms."""
    if isinstance(transform, NativeTransform):
        return transform
    if isinstance(transform, str):
        try:
            return NativeTransform(A.ANONYMIZERS[transform], P.PY_ANONYMIZERS[transform])
        except KeyError:
            raise KeyError(
                f"unknown builtin anonymizer {transform!r}; "
                f"available: {sorted(A.ANONYMIZERS)}"
            ) from None
    if callable(transform):
        return NativeTransform(None, transform)
    raise TypeError(f"unsupported transform {transform!r}")


def _pandas_str_udf(py_fn, include_nulls: bool) -> Callable[[Column], Column]:
    """Vectorize a str->str Python callable as an Arrow-batched UDF.
    ``include_nulls`` mirrors map_opt_string (``src/OutputColumn.scala:36-38``)."""

    @pandas_udf("string")
    def apply_fn(batch: pd.Series) -> pd.Series:
        if include_nulls:
            return batch.map(lambda v: py_fn(None if v is None else v))
        return batch.map(lambda v: v if v is None else py_fn(v))

    return lambda c: apply_fn(c)


def compile_column(col: OutputColumn, df: DataFrame | None = None) -> Column:
    """One OutputColumn → one Catalyst Column."""
    if isinstance(col, SourceColumn):
        return F.col(col.name)
    if isinstance(col, FixedColumn):
        lit = F.lit(col.value)
        if col.value is None and df is not None and col.name in df.columns:
            # Typed NULL so the sink schema matches the source column type
            # (the reference passes nulls through the original wire type).
            lit = lit.cast(df.schema[col.name].dataType)
        return lit.alias(col.name)
    if isinstance(col, TransformedColumn):
        resolved = _resolve(col.transform)
        is_direct = isinstance(col.lens, lens_mod.Direct)
        if is_direct and resolved.expr is not None and not col.opt:
            return resolved.expr(F.col(col.name)).alias(col.name)
        if is_direct:
            fn = _pandas_str_udf(resolved.py, include_nulls=col.opt)
            return fn(F.col(col.name)).alias(col.name)
        # JSON lens: pandas interpreter path preserves arbitrary shape/keys.
        if col.opt:
            # JsonLens.modifyOpt: nulls pass through; non-nulls see Some
            # semantics (src/Lens.scala:71-74).
            py_fn = lambda s: (resolved.py(s) or s)  # noqa: E731
        else:
            py_fn = resolved.py
        fn = lens_mod.compile_pandas(col.lens, py_fn)
        return fn(F.col(col.name)).alias(col.name)
    raise TypeError(f"unsupported output column {col!r}")


def apply_spec(df: DataFrame, spec: TableSpec) -> DataFrame:
    """Compile and apply a TableSpec to a DataFrame.

    Mirrors the source SELECT construction (``src/CopyAction.scala:72-84``):
    WHERE fragments AND'd, then projection, then — only when the spec
    contains an ``id`` column — ``ORDER BY id DESC`` before LIMIT (bare
    LIMIT otherwise; arbitrary-rows semantics are part of the contract).
    """
    out = df
    if spec.where_clause is not None:
        for fragment in spec.where_clause.fragments:
            out = out.where(F.expr(fragment))
    out = out.select([compile_column(c, df) for c in spec.columns])
    if spec.limit is not None:
        if "id" in spec.column_names:
            # Planned as TakeOrderedAndProject — a native distributed top-k,
            # no global sort materialization.
            out = out.orderBy(F.col("id").desc())
        out = out.limit(spec.limit)
    return out
