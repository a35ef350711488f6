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

from big_data_chicago_crimes_spark.schemas import TABLE_NAMES, TESTDATA_SCHEMAS


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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's reader
        # rejects; read the raw INT64 nanos and convert with exact
        # integer division (ns→µs). `DIV` keeps the math in bigint —
        # a double division would lose precision above 2^53 ns.
        from big_data_chicago_crimes_spark.schemas import EVENTS_RAW_SCHEMA

        raw = read_parquet(spark, f"{sf_dir}/{name}.parquet", EVENTS_RAW_SCHEMA)
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return read_parquet(spark, f"{sf_dir}/{name}.parquet", TESTDATA_SCHEMAS[name])


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
