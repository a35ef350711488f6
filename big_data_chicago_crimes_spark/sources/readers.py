"""Readers for the engine's table surface.

Reference source operators covered (SURVEY.md §2.1):

- S1 CSV scan (Dataset.py:77) → ``read_csv`` with an explicit schema
  (never ``inferSchema`` — that is a second full pass over the data).
- S2 Parquet scan (Dataset.py:71-74 et al.) → ``read_parquet``.
- S5 literal table (Dataset.py:656,740,856) → ``literal_table``.

Plus the testdata loader used by every registered query: ``load_tables``
returns a dict of lazily-planned DataFrames for the star schema +
events/documents/embeddings, with the declared schema applied so column
types are stable regardless of writer quirks.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from big_data_chicago_crimes_spark.schemas import (
    TABLE_NAMES,
    TESTDATA_SCHEMAS,
    events_schema_with_ts,
)


def read_parquet(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Parquet scan. Parquet is self-describing; a supplied schema acts as
    projection + type check (and keeps plans stable across writer versions)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV scan with a mandatory explicit schema (no inference pass)."""
    return spark.read.schema(schema).options(header=header, **options).csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def literal_table(spark: SparkSession, rows: list[tuple], schema) -> DataFrame:
    """1-row/few-row DataFrame from driver scalars (metric persistence)."""
    return spark.createDataFrame(rows, schema)


# (path, mtime) → resolved read schema. The footer of a given file never
# changes without the file itself changing, so one metadata read per path
# per process is enough; mtime in the key invalidates on rewrite (tests
# overwrite fixture paths in place).
_EVENTS_SCHEMA_CACHE: dict[tuple[str, float], T.StructType] = {}


def _events_ts_parquet_types(path: str) -> tuple:
    """(arrow_type, physical_type) of ``ts`` for a single parquet file OR
    a directory of part files (Spark writes datasets as directories).
    Driver-side, metadata-only. The parquet PHYSICAL type matters because
    legacy INT96 timestamps surface in Arrow as timestamp[ns] —
    indistinguishable from TIMESTAMP(NANOS), yet Spark reads INT96
    natively while true ns must be read as raw INT64. Local-filesystem
    paths only: the peek uses pyarrow directly, not Spark's Hadoop
    filesystem — fine for the testdata layout this engine targets; an
    object-store deployment would swap in ``pyarrow.fs`` here."""
    import pyarrow.dataset as ds
    import pyarrow.parquet as pq

    dataset = ds.dataset(path, format="parquet")
    first = dataset.files[0] if dataset.files else path
    schema = pq.ParquetFile(first).schema
    idx = schema.to_arrow_schema().get_field_index("ts")
    return schema.to_arrow_schema().field(idx).type, schema.column(idx).physical_type


def events_read_schema(path: str) -> T.StructType:
    """Pick the read schema for an events parquet by peeking its footer
    (driver-side, one metadata read per (path, mtime) per process).

    The testdata generator has shipped ``ts`` both as TIMESTAMP(NANOS)
    (a parquet type Spark's reader rejects, [PARQUET_TYPE_ILLEGAL] — it
    must be read as raw INT64) and as TIMESTAMP(MICROS)/ntz (which Spark
    reads natively). Assuming either encoding corrupts the other: ns
    read as µs puts 2024 events in 1970. So: look, don't assume.
    """
    import os

    import pyarrow as pa

    key = (path, os.stat(path).st_mtime)
    if key in _EVENTS_SCHEMA_CACHE:
        return _EVENTS_SCHEMA_CACHE[key]

    ts_type, physical = _events_ts_parquet_types(path)
    if physical == "INT96":
        # legacy Spark/Hive encoding; Spark's reader handles it natively
        schema = events_schema_with_ts(T.TimestampType())
    elif pa.types.is_timestamp(ts_type):
        if ts_type.unit == "ns":
            schema = events_schema_with_ts(T.LongType())  # raw int64 ns
        elif ts_type.tz is not None:
            schema = events_schema_with_ts(T.TimestampType())
        else:
            schema = events_schema_with_ts(T.TimestampNTZType())
    elif pa.types.is_integer(ts_type):
        schema = events_schema_with_ts(T.LongType())
    else:
        raise TypeError(f"events.ts has unsupported parquet type {ts_type}")
    _EVENTS_SCHEMA_CACHE[key] = schema
    return schema


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Branch on the LOADED dtype of ``ts`` and produce TimestampType:

    - LongType → epoch nanoseconds; convert with exact integer division
      (``DIV`` stays in bigint — double division loses precision above
      2^53 ns).
    - TimestampNTZType → reinterpret as session-tz timestamp (session tz
      is pinned to UTC in session.py, so this is a wall-clock no-op and
      matches DuckDB's naive reading of the same file).
    - TimestampType → already right; pass through.
    """
    dtype = df.schema["ts"].dataType
    if isinstance(dtype, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    if isinstance(dtype, T.TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    if isinstance(dtype, T.TimestampType):
        return df
    raise TypeError(f"events.ts loaded as unsupported Spark type {dtype}")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        # ts encoding varies by testdata generation — adapt, don't assume
        raw = read_parquet(spark, path, events_read_schema(path))
        return normalize_event_ts(raw)
    return read_parquet(spark, path, TESTDATA_SCHEMAS[name])


class Tables(Mapping):
    """Lazy mapping table-name → DataFrame for one scale-factor directory.

    Plans are built on first access and memoized; nothing is executed
    until an action runs. Attribute access (``t.lineitem``) is sugar.
    """

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def __getitem__(self, name: str) -> DataFrame:
        if name not in self._cache:
            self._cache[name] = load_table(self._spark, self._sf_dir, name)
        return self._cache[name]

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_"):
            raise AttributeError(name)
        return self[name]

    def __iter__(self):
        return iter(TABLE_NAMES)

    def __len__(self):
        return len(TABLE_NAMES)


def load_tables(spark: SparkSession, sf_dir: str) -> Tables:
    return Tables(spark, sf_dir)
