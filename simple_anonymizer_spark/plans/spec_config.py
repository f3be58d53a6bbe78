"""Config-driven spec front door: plain JSON-compatible dicts -> TableSpec.

The reference exposes only a code DSL (``src/TableSpec.scala:78-81``);
platform users of a Spark deployment usually hold their anonymization
policy in reviewable config (a JSON/YAML file in a repo, a row in a
policy service), not in code. This module maps that config onto the
EXISTING DSL objects — it builds the same ``TableSpec``/``OutputColumn``
values ``TableSpec.select`` would, so the compiler, coverage validator,
propagation, and oracle behavior are untouched.

Config shape (everything JSON-serializable)::

    {
      "users": {
        "where": "id <= 1000",              # str or list of fragments
        "limit": 500,                        # optional
        "batch_size": 1000,                  # optional
        "on_conflict": "update",             # or "nothing"
        "columns": {
          "id":         "passthrough",
          "first_name": "first_name",        # any built-in anonymizer name
          "ssn":        "null",              # write NULL
          "plan":       {"set": "basic"},    # write a constant
          "payload":    {"anonymizer": "redact",
                          "lens": {"field": "secret"}},
          "phones":     {"anonymizer": "phone_number",
                          "lens": {"array_field": "number"}},
        }
      }
    }

Unknown anonymizer names, lens shapes, or option keys raise ValueError
up front with the valid choices — config errors must fail the job at
plan time, not midway through a 100 TB copy.
"""

from __future__ import annotations

import json
from typing import Any, Mapping

from ..functions import lens as lens_mod
from ..functions.anonymizers import ANONYMIZERS
from .on_conflict import OnConflict
from .output_column import (
    FixedColumn,
    OutputColumn,
    SourceColumn,
    TransformedColumn,
)
from .table_spec import TableSpec

_TABLE_KEYS = {"where", "limit", "batch_size", "on_conflict", "columns"}


def _column_from_config(name: str, cfg: Any) -> OutputColumn:
    if isinstance(cfg, str):
        if cfg == "passthrough":
            return SourceColumn(name)
        if cfg == "null":
            return FixedColumn(name, None)
        if cfg in ANONYMIZERS:
            return TransformedColumn(name, cfg)
        raise ValueError(
            f"column {name!r}: unknown spec {cfg!r} — expected "
            f"'passthrough', 'null', or an anonymizer in "
            f"{sorted(ANONYMIZERS)}"
        )
    if not isinstance(cfg, Mapping):
        raise ValueError(f"column {name!r}: spec must be str or mapping")
    if "set" in cfg:
        extra = set(cfg) - {"set"}
        if extra:
            raise ValueError(f"column {name!r}: 'set' takes no other keys "
                             f"(got {sorted(extra)})")
        return FixedColumn(name, cfg["set"])
    if "anonymizer" not in cfg:
        raise ValueError(f"column {name!r}: mapping spec needs 'anonymizer' "
                         f"or 'set'")
    fn = cfg["anonymizer"]
    if fn not in ANONYMIZERS:
        raise ValueError(f"column {name!r}: unknown anonymizer {fn!r} — "
                         f"valid: {sorted(ANONYMIZERS)}")
    extra = set(cfg) - {"anonymizer", "lens"}
    if extra:
        raise ValueError(f"column {name!r}: unknown keys {sorted(extra)}")
    lens = _lens_from_config(name, cfg.get("lens"))
    return TransformedColumn(name, fn, lens)


def _lens_from_config(name: str, cfg: Any) -> lens_mod.Lens:
    if cfg is None:
        return lens_mod.Direct()
    if not isinstance(cfg, Mapping) or len(cfg) != 1:
        raise ValueError(f"column {name!r}: lens must be one of "
                         f"{{'field': ...}} / {{'array_field': ...}}")
    (kind, field_name), = cfg.items()
    if kind == "field":
        return lens_mod.Field(field_name)
    if kind == "array_field":
        return lens_mod.ArrayElements(lens_mod.Field(field_name))
    raise ValueError(f"column {name!r}: unknown lens kind {kind!r}")


def spec_from_config(cfg: Mapping[str, Any]) -> TableSpec:
    """One table's config mapping -> TableSpec."""
    extra = set(cfg) - _TABLE_KEYS
    if extra:
        raise ValueError(f"unknown table-spec keys {sorted(extra)} — "
                         f"valid: {sorted(_TABLE_KEYS)}")
    columns = cfg.get("columns")
    if not isinstance(columns, Mapping) or not columns:
        raise ValueError("table spec needs a non-empty 'columns' mapping")
    spec = TableSpec(columns=tuple(
        _column_from_config(name, c) for name, c in columns.items()
    ))
    where = cfg.get("where")
    if where is not None:
        for fragment in [where] if isinstance(where, str) else list(where):
            spec = spec.where(fragment)
    if cfg.get("limit") is not None:
        spec = spec.with_limit(int(cfg["limit"]))
    if cfg.get("batch_size") is not None:
        spec = spec.with_batch_size(int(cfg["batch_size"]))
    oc = cfg.get("on_conflict")
    if oc is not None:
        if oc not in ("update", "nothing"):
            raise ValueError(f"on_conflict must be 'update' or 'nothing', "
                             f"got {oc!r}")
        spec = spec.with_on_conflict(OnConflict(action=oc))
    return spec


def specs_from_config(
    cfg: Mapping[str, Mapping[str, Any]],
) -> dict[str, TableSpec]:
    """Whole-copy config -> ``{table: TableSpec}`` (DbCopier.run input)."""
    return {table: spec_from_config(tc) for table, tc in cfg.items()}


def specs_from_json(text: str) -> dict[str, TableSpec]:
    """JSON document (the reviewable policy-file form) -> specs."""
    return specs_from_config(json.loads(text))
