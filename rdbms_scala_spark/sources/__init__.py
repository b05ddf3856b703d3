from rdbms_scala_spark.sources.files import (
    load_csv,
    load_json,
    load_parquet,
    write_parquet,
    write_csv,
    write_sorted_table,
)

__all__ = [
    "load_csv",
    "load_json",
    "load_parquet",
    "write_parquet",
    "write_csv",
    "write_sorted_table",
]
