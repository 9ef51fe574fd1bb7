from .readers import read_table, load_tables, register_views, read_csv
from .writers import write_parquet, write_csv

__all__ = [
    "read_table",
    "load_tables",
    "register_views",
    "read_csv",
    "write_parquet",
    "write_csv",
]
