"""ETL-entry-point queries: the reference's OWN ingestion path, driven
through the driver's oracle gate (VERDICT r6 #1).

The reference's primary source is a CSV scan (Dataset.py:77), followed by
dropna (Dataset.py:83) and 12-hour-format timestamp parsing
(Dataset.py:90-93). The engine implements all three
(sources/readers.py:read_csv, operators/cleaning.py:drop_null_rows /
decompose_timestamp) with local tests, but until this module none had a
registered query form, so the most-used entry points of the reference's
workload were never value-checked at the driver gate. The synthetic
testdata gives no natural fixture (parquet-only, no nulls, no raw date
strings), so each query MANUFACTURES its fixture deterministically:

- ``events_csv_roundtrip`` materializes events as a real CSV file once
  per SF (probe-or-write, the reference's cached() pattern), re-reads it
  with the explicit schema (never inferSchema — that is a second full
  pass at 100 TB), and aggregates; the oracle runs the same aggregate on
  the parquet, so any loss in the CSV write/read cycle (types, quoting,
  timestamp precision) breaks the hash.
- ``events_etl_clean_seeded`` runs the reference's dropna →
  to_timestamp pipeline on a planted fixture: NULLs by a deterministic
  event_id rule, dropped with the production ``drop_null_rows``; ts
  formatted into the reference's exact 12-hour string
  ('MM/dd/yyyy hh:mm:ss a') and parsed back through
  ``decompose_timestamp``. The oracle plants the same NULLs with CASE
  and round-trips through strftime/strptime('%m/%d/%Y %I:%M:%S %p') —
  certifying P10 + F2 + the derived date parts (F3) end to end, AM/PM
  hour reconstruction included.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_chicago_crimes_spark.operators.cleaning import drop_null_rows
from big_data_chicago_crimes_spark.plans.registry import register
from big_data_chicago_crimes_spark.schemas import EVENTS_SCHEMA
from big_data_chicago_crimes_spark.sources.readers import load_tables, read_csv

# Microsecond-precision format: Spark timestamps are µs, so this
# round-trips losslessly; DuckDB's '%f' prints the same six digits.
_CSV_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_CSV_NULL = "\\N"  # unambiguous null token (default '' aliases empty strings)


def _csv_lake_path(spark: SparkSession, sf_dir: str) -> str:
    """Per-SF CSV materialization path (shared lake keying: sf0.01
    driver runs and sf0.1 bench runs never share a file)."""
    from big_data_chicago_crimes_spark.sources.sinks import lake_root

    return f"{lake_root(spark, sf_dir)}/events_csv"


@register(
    "events_csv_roundtrip",
    # Two roundtrip legs over the same parquet truth: the oracle
    # aggregate is computed once per fmt literal, so each leg's hash
    # passes only if that format's write/read cycle was lossless.
    oracle="""
        WITH agg AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
                   ROUND(SUM(value), 6) AS sum_value,
                   strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS min_ts,
                   strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS max_ts
            FROM events GROUP BY event_type
        ), fmts(fmt) AS (VALUES ('csv'), ('jsonl'))
        SELECT f.fmt, a.* FROM agg a CROSS JOIN fmts f
        ORDER BY f.fmt, a.event_type
    """,
    tags=("etl", "csv", "jsonl", "reference:S1", "reference:S3"),
)
def events_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-format roundtrip surface, one leg per interchange format
    (fmt column), each leg: events → file (once per SF, probe-or-write)
    → explicit-schema read → aggregate. The oracle aggregates the
    PARQUET table per fmt literal, so a leg's hash passes only if every
    column — bigints, doubles, the JSON ``props`` string (embedded
    quotes/commas), and the µs-precision timestamp — survives that
    format's write/read cycle byte-exactly. Unlike the reference, both
    reads declare their schema (inferSchema=True is a second full scan
    at 100 TB).

    - ``csv``: S1 CSV scan (Dataset.py:77) driven end-to-end.
    - ``jsonl`` (r11, VERDICT r10 #7): the sinks.write_jsonl →
      readers.read_json cycle — gzip JSONL, the interchange format
      external training-data tooling consumes — now certified under
      the driver gate instead of test-only.
    """
    from big_data_chicago_crimes_spark.sources.readers import read_json
    from big_data_chicago_crimes_spark.sources.sinks import (
        lake_root,
        path_exists,
        write_jsonl,
    )

    path = _csv_lake_path(spark, sf_dir)
    if not path_exists(spark, path):
        (
            load_tables(spark, sf_dir)
            .events.write.mode("overwrite")
            .options(header=True, timestampFormat=_CSV_TS_FMT, nullValue=_CSV_NULL)
            .csv(path)
        )
    jsonl_path = f"{lake_root(spark, sf_dir)}/events_jsonl"
    if not path_exists(spark, jsonl_path):
        write_jsonl(load_tables(spark, sf_dir).events, jsonl_path)

    def leg(events: DataFrame, fmt: str) -> DataFrame:
        return (
            events.groupBy("event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.countDistinct("user_id").alias("n_users"),
                F.round(F.sum("value"), 6).alias("sum_value"),
                F.date_format(F.min("ts"), _CSV_TS_FMT).alias("min_ts"),
                F.date_format(F.max("ts"), _CSV_TS_FMT).alias("max_ts"),
            )
            .select(F.lit(fmt).alias("fmt"), "*")
        )

    csv_events = read_csv(
        spark,
        path,
        EVENTS_SCHEMA,
        timestampFormat=_CSV_TS_FMT,
        nullValue=_CSV_NULL,
    )
    jsonl_events = read_json(spark, jsonl_path, EVENTS_SCHEMA)
    return (
        leg(csv_events, "csv")
        .unionByName(leg(jsonl_events, "jsonl"))
        .orderBy("fmt", "event_type")
    )


@register(
    "events_etl_clean_seeded",
    oracle="""
        WITH seeded AS (
            SELECT event_id,
                   CASE WHEN event_id % 13 = 0 THEN NULL ELSE value END AS value,
                   strftime(ts, '%m/%d/%Y %I:%M:%S %p') AS raw_ts
            FROM events
        ), cleaned AS (
            SELECT * FROM seeded WHERE value IS NOT NULL
        ), parsed AS (
            SELECT event_id, value,
                   strptime(raw_ts, '%m/%d/%Y %I:%M:%S %p') AS pts
            FROM cleaned
        )
        SELECT CAST(hour(pts) AS INT) AS hour,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_ids,
               ROUND(SUM(value), 6) AS sum_value,
               strftime(MIN(pts), '%Y-%m-%d %H:%M:%S') AS min_parsed,
               strftime(MAX(pts), '%Y-%m-%d %H:%M:%S') AS max_parsed
        FROM parsed GROUP BY hour ORDER BY hour
    """,
    tags=("etl", "dropna", "to_timestamp", "seeded", "reference:P10", "reference:F2"),
)
def events_etl_clean_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's dropna → to_timestamp cleaning pipeline
    (Dataset.py:83, :90-93) on a MANUFACTURED fixture — the synthetic
    events table has no nulls and no raw date strings, so the production
    operators' answers on raw events are vacuous. The fixture plants
    both deterministically: ``value`` is nulled when event_id % 13 == 0,
    and ``ts`` is formatted into the reference's exact 12-hour input
    format ('MM/dd/yyyy hh:mm:ss a' — the crimes CSV's encoding). The
    production pipeline then runs: ``drop_null_rows`` with a SUBSET (the
    scale-sane form — an all-column dropna would eat optional fields)
    must drop exactly the planted rows, and ``decompose_timestamp``
    (parse + derive date parts + drop the raw column,
    operators/cleaning.py:66) must reconstruct the 24-hour clock from
    AM/PM across all 24 ``hour`` buckets; min/max of the parsed
    timestamp pin second-precision fidelity (the 12-hour format carries
    no sub-second digits — both engines truncate identically)."""
    from big_data_chicago_crimes_spark.operators.cleaning import decompose_timestamp

    t = load_tables(spark, sf_dir)
    seeded = t.events.select(
        "event_id",
        F.when(F.col("event_id") % 13 == 0, None)
        .otherwise(F.col("value"))
        .alias("value"),
        F.date_format("ts", "MM/dd/yyyy hh:mm:ss a").alias("raw_ts"),
    )
    cleaned = drop_null_rows(seeded, subset=["value"])
    # decompose_timestamp drops the raw column; keep the parsed value
    # too so min/max pin the parse itself, not just its date parts
    parsed = cleaned.withColumn(
        "pts", F.to_timestamp("raw_ts", "MM/dd/yyyy hh:mm:ss a")
    )
    decomposed = decompose_timestamp(parsed, "raw_ts").select(
        "event_id", "value", "hour", "pts"
    )
    return (
        decomposed.groupBy(F.col("hour").cast("int").alias("hour"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("event_id").alias("n_ids"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.date_format(F.min("pts"), "yyyy-MM-dd HH:mm:ss").alias("min_parsed"),
            F.date_format(F.max("pts"), "yyyy-MM-dd HH:mm:ss").alias("max_parsed"),
        )
        .orderBy("hour")
    )
