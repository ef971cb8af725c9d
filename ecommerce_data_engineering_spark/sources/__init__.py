from .readers import load, load_many, read_csv_declared, validate_columns
from .writers import write_partitioned, write_view

__all__ = [
    "load",
    "load_many",
    "read_csv_declared",
    "validate_columns",
    "write_partitioned",
    "write_view",
]
