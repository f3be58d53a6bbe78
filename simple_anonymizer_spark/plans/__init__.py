from .compiler import NativeTransform, apply_spec, compile_column  # noqa: F401
from .on_conflict import OnConflict  # noqa: F401
from .output_column import (FixedColumn, Row, SourceColumn,  # noqa: F401
                            TransformedColumn)
from .table_spec import TableSpec, WhereClause  # noqa: F401
