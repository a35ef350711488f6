"""Sources & sinks: schema-checked readers, partitioned writers, result cache."""

from big_data_chicago_crimes_spark.sources.readers import (
    Tables,
    load_table,
    load_tables,
    read_csv,
    read_json,
    read_parquet,
)
from big_data_chicago_crimes_spark.sources.sinks import cached, write_parquet

__all__ = [
    "Tables",
    "load_table",
    "load_tables",
    "read_csv",
    "read_json",
    "read_parquet",
    "cached",
    "write_parquet",
]
