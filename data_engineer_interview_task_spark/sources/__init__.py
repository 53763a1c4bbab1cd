from .parquet import TABLES, read_table, load_tables
from .sinks import append_to_table, write_partitioned

__all__ = ["TABLES", "read_table", "load_tables", "append_to_table", "write_partitioned"]
