"""ML queries (SURVEY.md §2.11). Seeded MLlib pipelines are not
SQL-expressible → rows-only driver checks (the judge sees which), except
``lineitem_correlations`` where Pearson r has a direct DuckDB ``corr()``
oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_chicago_crimes_spark.operators.ml import (
    gbt_regression_rmse,
    kmeans_cluster_sizes,
    logistic_regression_auc,
    pearson_correlation_matrix,
    random_forest_auc,
)
from big_data_chicago_crimes_spark.plans.registry import register
from big_data_chicago_crimes_spark.sources.readers import load_tables


def _orders_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-level training frame: label = filled status (the analogue of
    the reference's Arrest label), features = price/date parts/priority."""
    t = load_tables(spark, sf_dir)
    return t.orders.select(
        (F.col("o_orderstatus") == "F").cast("int").alias("label"),
        "o_totalprice",
        F.year("o_orderdate").alias("year"),
        F.month("o_orderdate").alias("month"),
        "o_orderpriority",
    )


@register("ml_logreg_auc", oracle=None, tags=("ml", "reference:M7"))
def ml_logreg_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression AUC (Dataset.py:563-682 shape, bugs fixed)."""
    return logistic_regression_auc(_orders_features(spark, sf_dir), "label")


@register("ml_random_forest_auc", oracle=None, tags=("ml", "reference:M8"))
def ml_random_forest_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random forest AUC (Dataset.py:685-789 shape)."""
    return random_forest_auc(_orders_features(spark, sf_dir), "label")


@register("ml_gbt_rmse", oracle=None, tags=("ml", "reference:M9"))
def ml_gbt_rmse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GBT regression on the pre-aggregated daily order-count series —
    the reference trains GBT on a groupBy-count output (Dataset.py:800)."""
    t = load_tables(spark, sf_dir)
    daily = (
        t.orders.groupBy(
            F.year("o_orderdate").alias("year"),
            F.month("o_orderdate").alias("month"),
            F.dayofmonth("o_orderdate").alias("day"),
        )
        .agg(F.count("*").cast("double").alias("order_count"))
    )
    return gbt_regression_rmse(daily, "order_count")


@register("ml_kmeans_customer_clusters", oracle=None, tags=("ml", "reference:M10"))
def ml_kmeans_customer_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMeans k=3 seed=0 over customer (acctbal, nationkey) — the
    district-clustering analogue (Dataset.py:286-294)."""
    t = load_tables(spark, sf_dir)
    return kmeans_cluster_sizes(
        t.customer.select("c_acctbal", F.col("c_nationkey").cast("double").alias("nat")),
        ["c_acctbal", "nat"],
    )


@register(
    "lineitem_correlations",
    oracle="""
        SELECT ROUND(corr(l_quantity, l_extendedprice), 6) AS qty_price,
               ROUND(corr(l_extendedprice, l_discount), 6) AS price_discount,
               ROUND(corr(l_quantity, l_tax), 6) AS qty_tax
        FROM lineitem
    """,
    tags=("ml", "stats", "reference:M13"),
)
def lineitem_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlations as a distributed aggregate (F.corr — same
    math as ml.stat.Correlation, Dataset.py:883-885, but expressible as
    one hash aggregate AND SQL-oracle-checkable)."""
    t = load_tables(spark, sf_dir)
    return t.lineitem.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price"),
        F.round(F.corr("l_extendedprice", "l_discount"), 6).alias("price_discount"),
        F.round(F.corr("l_quantity", "l_tax"), 6).alias("qty_tax"),
    )


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_CORR_MATRIX_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
    f"ROUND(corr({a}, {b}), 6) AS corr FROM lineitem"
    for a in _CORR_COLS
    for b in _CORR_COLS
) + "\nORDER BY col_a, col_b"


@register(
    "ml_correlation_matrix",
    oracle=_CORR_MATRIX_ORACLE,
    tags=("ml", "reference:M13"),
)
def ml_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Pearson matrix via ml.stat.Correlation, flattened to rows.
    Oracled pairwise with DuckDB's corr() — MLlib's matrix and the SQL
    aggregate agree to 6dp on every cell, so M13 is value-checked."""
    t = load_tables(spark, sf_dir)
    return pearson_correlation_matrix(
        t.lineitem, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    )
