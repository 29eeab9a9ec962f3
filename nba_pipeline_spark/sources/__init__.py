from .registry import SCHEMAS, TABLES, load_table, read_csv, read_parquet, write_partitioned

__all__ = ["SCHEMAS", "TABLES", "load_table", "read_csv", "read_parquet", "write_partitioned"]
