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


def test_results_stable_under_partitioning(spark, sf_dir):
    """The value-hash gate assumes results don't depend on partitioning.
    Re-run a representative slice (agg, top-k, window, dedup, sampling)
    with the session's shuffle partitioning left alone vs a forced odd
    repartitioning of the inputs — byte-identical results required."""
    from pyspark.sql import functions as F

    from big_data_chicago_crimes_spark.plans.registry import all_queries

    names = [
        "revenue_by_nation",
        "events_filter_topk_surface",
        "orders_running_total",
        "docs_exact_dedup",
        "docs_sampling_census",
        "docs_sketch_md5_surface",
    ]
    qs = all_queries()
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for name in names:
            spark.conf.set("spark.sql.shuffle.partitions", "8")
            a = sorted(map(str, qs[name].build(spark, sf_dir).collect()))
            spark.conf.set("spark.sql.shuffle.partitions", "3")
            b = sorted(map(str, qs[name].build(spark, sf_dir).collect()))
            assert a == b, f"{name}: result depends on partitioning"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
