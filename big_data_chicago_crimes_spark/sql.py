"""SQL surface: register the engine's tables as temp views so users can
query with ``spark.sql`` — a capability the reference explicitly lacks
(its one temp view is commented out, Dataset.py:117-118). Catalyst
produces the same plans either way; the registry's oracle strings are
(by construction) close to runnable Spark SQL."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from big_data_chicago_crimes_spark.schemas import TABLE_NAMES
from big_data_chicago_crimes_spark.sources.readers import load_tables


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> list[str]:
    """Create/replace one temp view per testdata table. Returns the view
    names. Views are lazy — no data is read until a query runs."""
    tables = load_tables(spark, sf_dir)
    names = []
    for name in TABLE_NAMES:
        view = f"{prefix}{name}"
        tables[name].createOrReplaceTempView(view)
        names.append(view)
    return names


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run a SQL query against the registered views (registering them
    first if needed)."""
    register_views(spark, sf_dir)
    return spark.sql(query)
