"""Aggregation operators (SURVEY.md §2.4, §2.6).

Generic forms of the reference's query shapes: grouped counts (A2/A3),
two-level count-then-max (A4, Dataset.py:180-181), multi-expression
centroids (A5), global ratios (A6), pivot cross-tabs (A7,
Dataset.py:382-390), distinct (A8), and ordered top-k (O1-O4).

Scale notes: every groupBy here is a single hash-aggregate with
map-side partial aggregation (Catalyst plans partial+final
automatically); top-k compiles to TakeOrderedAndProject — no global
sort materializes. Pivot values are ALWAYS seeded explicitly: an
unseeded pivot runs a distinct-scan first AND produces
non-deterministic column order, which breaks schema-stable hashing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def count_by(df: DataFrame, *keys: str, name: str = "cnt") -> DataFrame:
    """A2/A3 grouped count, aliased deterministically."""
    return df.groupBy(*keys).agg(F.count("*").alias(name))


def count_then_max(
    df: DataFrame, inner_keys: list[str], outer_keys: list[str], name: str = "max_cnt"
) -> DataFrame:
    """A4 two-level aggregate: count per ``inner_keys`` then max of those
    counts per ``outer_keys`` (reference: busiest crime type per hour)."""
    counts = count_by(df, *inner_keys)
    return counts.groupBy(*outer_keys).agg(F.max("cnt").alias(name))


def ratio_of(df: DataFrame, predicate: Column, name: str = "pct") -> DataFrame:
    """A6 global percentage: 100 * rows-matching / rows (one aggregate,
    no self-join; Dataset.py:463-465)."""
    return df.agg(
        F.round(F.sum(predicate.cast("int")) * 100.0 / F.count("*"), 6).alias(name)
    )


def pivot_counts(
    df: DataFrame, row_key: str, pivot_key: str, pivot_values: list[str]
) -> DataFrame:
    """A7 cross-tab with seeded pivot values + fillna(0)
    (Dataset.py:382-390). Seeding keeps the output schema static and
    skips the extra distinct job."""
    return (
        df.groupBy(row_key)
        .pivot(pivot_key, pivot_values)
        .agg(F.count(F.lit(1)))  # count("*") is illegal inside Pivot
        .na.fill(0)
    )


def top_k(
    df: DataFrame,
    keys: list[str],
    k: int,
    order_col: str = "cnt",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """O4 grouped-count top-k with deterministic tie-break columns.
    orderBy(...).limit(k) → TakeOrderedAndProject (per-partition heap +
    driver merge of k rows — no global sort, safe at any scale)."""
    counts = count_by(df, *keys, name=order_col)
    order = [F.col(order_col).desc()] + [F.col(c).asc() for c in (tiebreak or keys)]
    return counts.orderBy(*order).limit(k)


def distinct_values(df: DataFrame, *cols: str) -> DataFrame:
    """A8 distinct (hash aggregate under the hood)."""
    return df.select(*cols).distinct()


def grouped_stats(df: DataFrame, keys: list[str], exprs: dict[str, Column]) -> DataFrame:
    """A5 multi-expression aggregate: ``exprs`` maps output-alias → agg column."""
    return df.groupBy(*keys).agg(*[e.alias(n) for n, e in exprs.items()])
