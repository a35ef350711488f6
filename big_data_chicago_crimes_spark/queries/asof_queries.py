"""As-of join queries (DuckDB 1.0 speaks ASOF JOIN natively — a rare
chance to oracle-check an operator Spark doesn't ship)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_chicago_crimes_spark.operators.asof import asof_join
from big_data_chicago_crimes_spark.plans.registry import register
from big_data_chicago_crimes_spark.sources.readers import load_tables


@register(
    "purchase_after_view_asof",
    oracle="""
        WITH p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
             v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
             m AS (
                SELECT p.user_id,
                       CAST(floor(epoch(p.ts)) AS BIGINT)
                       - CAST(floor(epoch(v.ts)) AS BIGINT) AS gap_sec
                FROM p ASOF JOIN v
                  ON p.user_id = v.user_id AND v.ts <= p.ts
             )
        SELECT user_id,
               COUNT(*) AS n_purchases_after_view,
               CAST(SUM(gap_sec) AS BIGINT) AS total_gap_sec
        FROM m GROUP BY user_id ORDER BY user_id
    """,
    tags=("asof", "join", "extension"),
)
def purchase_after_view_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase matched to the user's most
    recent prior (≤) view; per-user match count + total gap. Gap floors
    both timestamps to whole epoch seconds (exact integer math on both
    engines — Spark µs vs DuckDB ns precision never meets the hash)."""
    t = load_tables(spark, sf_dir)
    purchases = t.events.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    views = t.events.filter(F.col("event_type") == "view").select("user_id", "ts")
    matched = asof_join(purchases, views, "user_id", "ts", "ts", [])
    gap = F.unix_timestamp("ts") - F.unix_timestamp("ts_asof")
    return (
        matched.select("user_id", gap.alias("gap_sec"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_purchases_after_view"),
            F.sum("gap_sec").alias("total_gap_sec"),
        )
        .orderBy("user_id")
    )


@register(
    "order_price_at_ship_asof",
    oracle="""
        WITH li AS (SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem),
             o AS (SELECT o_orderkey, o_orderdate, o_totalprice FROM orders),
             m AS (
                SELECT li.l_orderkey, o.o_totalprice
                FROM li ASOF JOIN o
                  ON li.l_orderkey = o.o_orderkey AND o.o_orderdate <= li.l_shipdate
             )
        SELECT l_orderkey, COUNT(*) AS n_lines,
               ROUND(MAX(o_totalprice), 4) AS price_at_ship
        FROM m GROUP BY l_orderkey
        ORDER BY l_orderkey LIMIT 100
    """,
    tags=("asof", "join", "extension"),
)
def order_price_at_ship_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of over the star schema: each lineitem matched to the latest
    order record dated ≤ its ship date (the slowly-changing-dimension
    lookup shape). Deterministic top-100 keys for a bounded output."""
    t = load_tables(spark, sf_dir)
    li = t.lineitem.select("l_orderkey", "l_linenumber", "l_shipdate")
    o = t.orders.select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate", "o_totalprice"
    )
    matched = asof_join(
        li, o, "l_orderkey", "l_shipdate", "o_orderdate", ["o_totalprice"]
    )
    return (
        matched.groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.max("o_totalprice_asof"), 4).alias("price_at_ship"),
        )
        .orderBy("l_orderkey")
        .limit(100)
    )


@register(
    "orders_by_price_band",
    oracle="""
        WITH bands AS (
            SELECT band_id, lo, hi FROM (VALUES
                (0, 0.0, 50000.0), (1, 50000.0, 100000.0),
                (2, 100000.0, 200000.0), (3, 200000.0, 400000.0),
                (4, 400000.0, 1000000.0)) AS t(band_id, lo, hi)
        )
        SELECT b.band_id, COUNT(*) AS n_orders,
               ROUND(SUM(o.o_totalprice), 2) AS total_price
        FROM orders o JOIN bands b
          ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
        GROUP BY b.band_id ORDER BY b.band_id
    """,
    tags=("range-join", "extension"),
)
def orders_by_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: orders bucketed into price bands via the
    bucketized equi-join (operators.asof.range_join) instead of a
    nested-loop inequality join."""
    from big_data_chicago_crimes_spark.operators.asof import range_join

    t = load_tables(spark, sf_dir)
    bands = spark.createDataFrame(
        [
            (0, 0.0, 50_000.0),
            (1, 50_000.0, 100_000.0),
            (2, 100_000.0, 200_000.0),
            (3, 200_000.0, 400_000.0),
            (4, 400_000.0, 1_000_000.0),
        ],
        "band_id int, lo double, hi double",
    )
    joined = range_join(
        t.orders.select("o_orderkey", "o_totalprice"),
        bands,
        "o_totalprice",
        "lo",
        "hi",
        bucket_width=50_000.0,
    )
    return (
        joined.groupBy("band_id")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("band_id")
    )
