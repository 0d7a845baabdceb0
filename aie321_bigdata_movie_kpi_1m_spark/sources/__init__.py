from .readers import load_star_table, read_csv, read_jdbc, read_parquet
from .sinks import bounded_export, write_parquet

__all__ = [
    "load_star_table",
    "read_csv",
    "read_jdbc",
    "read_parquet",
    "bounded_export",
    "write_parquet",
]
