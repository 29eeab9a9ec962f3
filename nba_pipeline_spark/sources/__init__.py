from .registry import (
    SCHEMAS,
    TABLES,
    load_table,
    read_csv,
    read_jsonl,
    read_parquet,
    split_corrupt,
    write_partitioned,
)

__all__ = [
    "SCHEMAS",
    "TABLES",
    "load_table",
    "read_csv",
    "read_jsonl",
    "read_parquet",
    "split_corrupt",
    "write_partitioned",
]
