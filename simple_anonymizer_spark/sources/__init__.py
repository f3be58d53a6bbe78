from .catalog import (Catalog, LogicalFK, SequenceInfo, group_fks,  # noqa: F401
                      quote_identifier, quote_qualified)
from .parquet import parquet_reader, parquet_writer, read_sf_table  # noqa: F401
