"""Temporal column expressions.

Covers the reference's timestamp decomposition (F3, Dataset.py:95-99),
12-hour timestamp parsing (F2, Dataset.py:90-93), and the season
``when``-chain (P14, Dataset.py:123-129) as reusable expressions instead
of inline ``withColumn`` blocks.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

CRIMES_TS_FORMAT = "MM/dd/yyyy hh:mm:ss a"  # Dataset.py:90-93 (12-hour + AM/PM)


def parse_timestamp(col: Column | str, fmt: str = CRIMES_TS_FORMAT) -> Column:
    return F.to_timestamp(F.col(col) if isinstance(col, str) else col, fmt)


def date_parts(ts: Column | str) -> dict[str, Column]:
    """The five derived integer time columns the reference adds
    (Dataset.py:95-99): month, year, day, hour, dayofweek."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return {
        "month": F.month(c),
        "year": F.year(c),
        "day": F.dayofmonth(c),
        "hour": F.hour(c),
        "dayofweek": F.dayofweek(c),
    }


def season(month: Column | str) -> Column:
    """Meteorological season from month number — the reference's bucketing
    (Dataset.py:123-129): Dec-Feb Winter, Mar-May Spring, Jun-Aug Summer,
    Sep-Nov Autumn."""
    m = F.col(month) if isinstance(month, str) else month
    return (
        F.when((m == 12) | (m <= 2), F.lit("Winter"))
        .when((m >= 3) & (m <= 5), F.lit("Spring"))
        .when((m >= 6) & (m <= 8), F.lit("Summer"))
        .otherwise(F.lit("Autumn"))
    )


def quarter_name(ts: Column | str) -> Column:
    """'Q1'..'Q4' label — the season pivot (A7) transposed to the
    testdata's order dates."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.concat(F.lit("Q"), F.quarter(c).cast("string"))
