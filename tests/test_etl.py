"""ETL-entry-point query fixtures: CSV materialization idempotency and
the planted-null arithmetic behind events_etl_clean_seeded (the oracle
parity harness covers the value hashes; these pin the fixture mechanics
themselves)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from big_data_chicago_crimes_spark.queries.etl_queries import (
    _csv_lake_path,
    events_csv_roundtrip,
)
from big_data_chicago_crimes_spark.sources.readers import load_tables


def test_csv_roundtrip_materializes_once(spark, sf_dir):
    """The CSV lake file is probe-or-write: a second invocation must
    reuse the existing directory, not rewrite it (the reference's
    cached() contract, Dataset.py:50-56)."""
    events_csv_roundtrip(spark, sf_dir).collect()
    path = _csv_lake_path(spark, sf_dir)
    files = sorted(glob.glob(f"{path}/*.csv"))
    assert files, "CSV materialization produced no part files"
    mtimes = [os.stat(f).st_mtime_ns for f in files]
    events_csv_roundtrip(spark, sf_dir).collect()
    assert [os.stat(f).st_mtime_ns for f in sorted(glob.glob(f"{path}/*.csv"))] == mtimes


def test_csv_roundtrip_row_identical(spark, sf_dir):
    """Row-level certification (stronger than the aggregate the driver
    hashes): the CSV cycle must reproduce the parquet events EXACTLY —
    every column, every row, microsecond timestamps included."""
    from big_data_chicago_crimes_spark.queries.etl_queries import (
        _CSV_NULL,
        _CSV_TS_FMT,
    )
    from big_data_chicago_crimes_spark.schemas import EVENTS_SCHEMA
    from big_data_chicago_crimes_spark.sources.readers import read_csv

    events_csv_roundtrip(spark, sf_dir).collect()  # ensure materialized
    t = load_tables(spark, sf_dir)
    back = read_csv(
        spark,
        _csv_lake_path(spark, sf_dir),
        EVENTS_SCHEMA,
        timestampFormat=_CSV_TS_FMT,
        nullValue=_CSV_NULL,
    )
    assert back.schema == t.events.schema
    assert back.count() == t.events.count()
    sym_diff = back.exceptAll(t.events).union(t.events.exceptAll(back))
    assert sym_diff.limit(1).count() == 0, "CSV cycle lost or mutated rows"


def test_etl_clean_seeded_drops_exactly_planted_rows(spark, sf_dir):
    """The planted-null rule (event_id % 13) must remove exactly the
    planted rows and nothing else — the dropna leg's row arithmetic,
    independent of the hashed aggregate."""
    from big_data_chicago_crimes_spark.plans.registry import get_query

    t = load_tables(spark, sf_dir)
    total = t.events.count()
    planted = t.events.filter(F.col("event_id") % 13 == 0).count()
    kept = get_query("events_etl_clean_seeded").build(spark, sf_dir)
    assert kept.agg(F.sum("n_events")).collect()[0][0] == total - planted
