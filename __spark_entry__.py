"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship 5-table star join at sf0.001.
``queries()`` / ``oracle_sql()`` expose the engine's named-query registry
(big_data_chicago_crimes_spark.plans.registry): one entry per implemented
operator from SURVEY.md §2 plus the training-data-pipeline extensions.
Queries whose semantics aren't SQL-expressible (seeded MLlib, xxhash64-
based LSH/MinHash/SimHash) have no oracle entry → rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from big_data_chicago_crimes_spark.plans.registry import all_queries

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return all_queries()["revenue_by_nation"].build(spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.build for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
