"""Window-function operators (SURVEY.md §2.5).

The reference's single window use is the moving average at
Dataset.py:521-523 — with a semantic bug: it partitions by the grouping
keys (year, month), so every partition has one row and the "3-month
moving average" degenerates to identity. ``moving_average`` implements
the INTENDED semantics (trailing frame over an ordered monthly series);
tests record the divergence.

Ranking/lag ride along on the same Window machinery (absent from the
reference but part of the engine surface per SURVEY.md §2.5).

Scale note: an unpartitioned ``Window.orderBy`` pulls everything into
one partition — fine for an already-aggregated monthly series (hundreds
of rows), catastrophic on raw rows. Helpers that may face raw-scale
input require partition keys.
"""

from __future__ import annotations

import warnings

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _warn_if_unbounded_global_window(
    series: DataFrame, partition_by: list[str] | None, op: str
) -> None:
    """An unpartitioned Window.orderBy funnels EVERY input row into one
    WindowExec partition. That's the intended shape for an aggregated
    series (a few hundred rows), silent death on raw rows. We can't count
    rows without triggering a job, so this checks the analyzed plan for
    evidence of pre-aggregation (Aggregate/Distinct/limit/local data) and
    warns when a global window is about to run over what looks like a raw
    scan. Pre-aggregated data loaded straight from parquet has no
    Aggregate node either — hence a warning, not an error."""
    if partition_by:
        return
    plan = series._jdf.queryExecution().analyzed().toString()
    if not any(
        tok in plan
        for tok in ("Aggregate", "Distinct", "GlobalLimit", "LocalRelation")
    ):
        warnings.warn(
            f"{op}: global (unpartitioned) window over input with no "
            "aggregation in its plan — Spark will pull every row into ONE "
            "WindowExec partition. Pass partition_by keys for raw-scale "
            "input, or pre-aggregate the series first.",
            stacklevel=3,
        )


def moving_average(
    series: DataFrame,
    order_by: list[str],
    value_col: str,
    window_rows: int = 3,
    partition_by: list[str] | None = None,
    name: str = "moving_avg",
) -> DataFrame:
    """Trailing ``window_rows``-row mean over an ordered series.
    Input must already be aggregated (one row per period)."""
    _warn_if_unbounded_global_window(series, partition_by, "moving_average")
    w = (
        Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    ).orderBy(*order_by).rowsBetween(-(window_rows - 1), 0)
    return series.withColumn(name, F.round(F.avg(value_col).over(w), 6))


def rank_within(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    method: str = "row_number",
    name: str = "rn",
) -> DataFrame:
    fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[method]
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(name, fn().over(w))


def top_k_per_group(
    df: DataFrame, partition_by: list[str], order_by: list[Column], k: int
) -> DataFrame:
    """Top-k rows per group via row_number ≤ k (the canonical Spark
    top-k-per-group: one shuffle on the partition keys, no global sort)."""
    if "__rn" in df.columns:
        raise ValueError(
            "top_k_per_group: input column '__rn' collides with the "
            "reserved rank column — it would be silently dropped"
        )
    ranked = rank_within(df, partition_by, order_by, "row_number", "__rn")
    return ranked.filter(F.col("__rn") <= k).drop("__rn")


def lag_delta(
    series: DataFrame,
    order_by: list[str],
    value_col: str,
    partition_by: list[str] | None = None,
    name: str = "delta",
) -> DataFrame:
    """Period-over-period difference (lag-1) over an aggregated series."""
    _warn_if_unbounded_global_window(series, partition_by, "lag_delta")
    w = (
        Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    ).orderBy(*order_by)
    return series.withColumn(
        name, F.col(value_col) - F.lag(value_col, 1).over(w)
    )


def running_total(
    series: DataFrame,
    order_by: list[str],
    value_col: str,
    partition_by: list[str] | None = None,
    name: str = "running_total",
) -> DataFrame:
    _warn_if_unbounded_global_window(series, partition_by, "running_total")
    w = (
        Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    ).orderBy(*order_by).rowsBetween(Window.unboundedPreceding, 0)
    return series.withColumn(name, F.sum(value_col).over(w))
