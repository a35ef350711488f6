"""As-of join queries (DuckDB 1.0 speaks ASOF JOIN natively — a rare
chance to oracle-check an operator Spark doesn't ship)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_chicago_crimes_spark.operators.asof import asof_join
from big_data_chicago_crimes_spark.plans.registry import register
from big_data_chicago_crimes_spark.sources.readers import load_tables


@register(
    "asof_join_surface",
    # r7 merge of purchase_after_view_asof + order_price_at_ship_asof
    # (the purchaser_error_overlap precedent): BOTH as-of shapes — the
    # backward event-to-event match and the slowly-changing-dimension
    # lookup over the star schema — certify against DuckDB's native
    # ASOF JOIN in ONE registry slot (union with a leg marker), funding
    # a new query's place in the 50-entry driver window. Gap arithmetic
    # floors timestamps to whole epoch seconds (exact integer math on
    # both engines — Spark µs vs DuckDB ns precision never meets the
    # hash); the star leg keeps its deterministic top-100 keys.
    oracle="""
        WITH p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
             v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
             ev AS (
                SELECT p.user_id,
                       CAST(floor(epoch(p.ts)) AS BIGINT)
                       - CAST(floor(epoch(v.ts)) AS BIGINT) AS gap_sec
                FROM p ASOF JOIN v
                  ON p.user_id = v.user_id AND v.ts <= p.ts
             ),
             li AS (SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem),
             o AS (SELECT o_orderkey, o_orderdate, o_totalprice FROM orders),
             sc AS (
                SELECT li.l_orderkey, o.o_totalprice
                FROM li ASOF JOIN o
                  ON li.l_orderkey = o.o_orderkey AND o.o_orderdate <= li.l_shipdate
             )
        SELECT 'events' AS leg, user_id AS k,
               COUNT(*) AS n,
               CAST(CAST(SUM(gap_sec) AS BIGINT) AS DOUBLE) AS metric
        FROM ev GROUP BY user_id
        UNION ALL
        SELECT * FROM (
            SELECT 'star' AS leg, l_orderkey AS k, COUNT(*) AS n,
                   ROUND(MAX(o_totalprice), 4) AS metric
            FROM sc GROUP BY l_orderkey
            ORDER BY k LIMIT 100
        )
        ORDER BY leg, k
    """,
    tags=("asof", "join", "extension"),
)
def asof_join_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both as-of join shapes in one certified result: (events leg) each
    purchase matched to the user's most recent prior (≤) view — per-user
    match count + total gap in whole seconds; (star leg) each lineitem
    matched to the latest order record dated ≤ its ship date — the
    slowly-changing-dimension lookup, top-100 keys for bounded output."""
    t = load_tables(spark, sf_dir)

    purchases = t.events.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    views = t.events.filter(F.col("event_type") == "view").select("user_id", "ts")
    ev_matched = asof_join(purchases, views, "user_id", "ts", "ts", [])
    gap = F.unix_timestamp("ts") - F.unix_timestamp("ts_asof")
    events_leg = (
        ev_matched.select("user_id", gap.alias("gap_sec"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("gap_sec").alias("total_gap"))
        .select(
            F.lit("events").alias("leg"),
            F.col("user_id").alias("k"),
            "n",
            F.col("total_gap").cast("double").alias("metric"),
        )
    )

    li = t.lineitem.select("l_orderkey", "l_linenumber", "l_shipdate")
    o = t.orders.select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate", "o_totalprice"
    )
    sc_matched = asof_join(
        li, o, "l_orderkey", "l_shipdate", "o_orderdate", ["o_totalprice"]
    )
    star_leg = (
        sc_matched.groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n"),
            F.round(F.max("o_totalprice_asof"), 4).alias("metric"),
        )
        .orderBy("l_orderkey")
        .limit(100)
        .select(
            F.lit("star").alias("leg"), F.col("l_orderkey").alias("k"), "n", "metric"
        )
    )
    return events_leg.unionByName(star_leg).orderBy("leg", "k")


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
