from .ingest import ingest_wide_matrix, run_trends_ingest, wide_matrix_schema
from .parquet import TABLES, read_table, load_tables
from .sinks import append_to_table, write_external, write_partitioned

__all__ = [
    "TABLES",
    "read_table",
    "load_tables",
    "append_to_table",
    "write_external",
    "write_partitioned",
    "ingest_wide_matrix",
    "run_trends_ingest",
    "wide_matrix_schema",
]
