"""Lake-layout queries: the Z-order clustered read path, driven through
the driver's oracle gate (VERDICT r6 #7).

``sources/layout.py:write_zordered`` was previously proven only from
parquet metadata (row-group stat tightening, tests/test_layout.py); this
module registers a query that actually READS a Z-ordered lake table with
a two-column predicate and aggregates, oracled against the flat table —
so the clustered write → pushed-down scan → answer path is
value-certified end to end, not just its storage property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_chicago_crimes_spark.plans.registry import register
from big_data_chicago_crimes_spark.sources.readers import load_tables

# Two-dimensional predicate box over the clustered columns. Mid-range on
# both axes: a Z-ordered layout skips row groups on BOTH bounds at once,
# which a single-column sort cannot (tests/test_layout.py measures the
# stat tightening; this query certifies the answer).
ZORDER_COLS = ["l_quantity", "l_extendedprice"]
_QTY_LO, _QTY_HI = 10, 20
_PRICE_LO, _PRICE_HI = 20000.0, 40000.0


def zordered_lineitem_path(spark: SparkSession, sf_dir: str) -> str:
    """Per-SF Z-ordered lineitem lake path (shared lake keying)."""
    from big_data_chicago_crimes_spark.sources.sinks import lake_root

    return f"{lake_root(spark, sf_dir)}/lineitem_zorder"


def zordered_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the Z-ordered lineitem, materializing it once per SF
    (probe-or-write, the reference's cached() pattern)."""
    from big_data_chicago_crimes_spark.sources.layout import write_zordered
    from big_data_chicago_crimes_spark.sources.sinks import path_exists

    path = zordered_lineitem_path(spark, sf_dir)
    if not path_exists(spark, path):
        t = load_tables(spark, sf_dir)
        write_zordered(t.lineitem, path, ZORDER_COLS)
    return spark.read.parquet(path)


@register(
    "lineitem_zorder_box_scan",
    oracle=f"""
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               ROUND(SUM(l_quantity), 6) AS sum_qty,
               ROUND(SUM(l_extendedprice), 6) AS sum_price,
               ROUND(AVG(l_extendedprice), 6) AS avg_price
        FROM lineitem
        WHERE l_quantity BETWEEN {_QTY_LO} AND {_QTY_HI}
          AND l_extendedprice BETWEEN {_PRICE_LO} AND {_PRICE_HI}
        GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("layout", "zorder", "lake", "extension"),
)
def lineitem_zorder_box_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-column box predicate over the Z-ORDERED lineitem lake table
    (sources/layout.py:118): the Morton-clustered layout turns the
    (l_quantity, l_extendedprice) box into row-group skipping on both
    columns simultaneously — the scan reads only files/row groups whose
    min/max boxes intersect the predicate box, the standard OPTIMIZE
    ZORDER read path. The oracle runs the identical aggregate on the
    FLAT table, so a hash match proves the clustered rewrite preserved
    every row and value. tests/test_layout.py asserts this exact
    predicate box skips row groups on the same layout."""
    zli = zordered_lineitem(spark, sf_dir)
    return (
        zli.filter(
            F.col("l_quantity").between(_QTY_LO, _QTY_HI)
            & F.col("l_extendedprice").between(_PRICE_LO, _PRICE_HI)
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 6).alias("sum_price"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        )
        .orderBy("l_returnflag")
    )


# Partition value for the pruned read below. Mid-cardinality TPC-H
# priority (~1/5 of orders) so the pruned scan provably reads a strict
# subset of the partition directories (tests/test_plans.py pins the
# PartitionFilters plan line).
_PRIORITY = "1-URGENT"


def partitioned_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders re-materialized as a hive-partitioned lake table
    (partitionBy o_orderpriority), built once per SF through
    ``cached()`` (probe-or-write) — the S3 parquet-sink path
    (sources/sinks.py:write_parquet) driven for real, not mocked."""
    from big_data_chicago_crimes_spark.sources.sinks import cached, lake_root

    return cached(
        spark,
        f"{lake_root(spark, sf_dir)}/orders_by_priority",
        lambda: load_tables(spark, sf_dir).orders,
        partition_by=["o_orderpriority"],
    )


@register(
    "orders_lake_partitioned_scan",
    oracle=f"""
        SELECT CAST(year(o_orderdate) AS INT) AS order_year,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(SUM(o_totalprice), 6) AS sum_price
        FROM orders
        WHERE o_orderpriority = '{_PRIORITY}'
        GROUP BY order_year ORDER BY order_year
    """,
    tags=("layout", "sink", "partitionBy", "lake", "reference:S3"),
)
def orders_lake_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 parquet sink + partitionBy, driven end-to-end through the
    oracle gate: orders → hive-partitioned lake write (once per SF) →
    partition-PRUNED read (the o_orderpriority equality resolves against
    directory names — PartitionFilters, zero data read outside the
    selected partition) → aggregate. The oracle runs the identical
    aggregate on the FLAT table, so a hash match proves the partitioned
    rewrite preserved every row and value and the pruned scan still sees
    all of them. At 100 TB this is the standard fact-table layout: the
    predicate prunes directories before any footer is opened."""
    po = partitioned_orders(spark, sf_dir)
    return (
        po.filter(F.col("o_orderpriority") == _PRIORITY)
        .groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 6).alias("sum_price"),
        )
        .orderBy("order_year")
    )
