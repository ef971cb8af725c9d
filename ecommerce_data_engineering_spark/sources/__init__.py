from .readers import (load, load_many, read_csv_declared,
                      read_csv_quarantine, read_evolved,
                      read_json_quarantine, validate_columns)
from .writers import write_clustered, write_partitioned, write_view

__all__ = [
    "load",
    "load_many",
    "read_csv_declared",
    "read_csv_quarantine",
    "read_evolved",
    "read_json_quarantine",
    "validate_columns",
    "write_clustered",
    "write_partitioned",
    "write_view",
]
