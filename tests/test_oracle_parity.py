"""Mirror of the driver's t2 correctness gate: every registered query
with an oracle must match DuckDB on row count, columns, and values
(order-insensitive) at the test scale factor. Oracle-less queries must
at least execute and return a stable schema."""

from __future__ import annotations

import pytest

from big_data_chicago_crimes_spark.plans.registry import all_queries
from tests.conftest import assert_frames_match

QUERIES = all_queries()
WITH_ORACLE = sorted(n for n, q in QUERIES.items() if q.oracle)
ROWS_ONLY = sorted(n for n, q in QUERIES.items() if not q.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(name, spark, duck, sf_dir):
    q = QUERIES[name]
    spark_pdf = q.build(spark, sf_dir).toPandas()
    oracle_pdf = duck.execute(q.oracle).fetchdf()
    assert_frames_match(spark_pdf, oracle_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_executes(name, spark, sf_dir):
    q = QUERIES[name]
    df = q.build(spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert len(df.columns) > 0
