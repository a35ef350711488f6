"""End-to-end tests of the CrimesAnalytics facade on a deterministic
crimes-shaped fixture (FIXTURES.md fixture 1): every reference query
method runs and key invariants hold against hand-computed values."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from big_data_chicago_crimes_spark.app import CrimesAnalytics

TYPES = ["THEFT", "BATTERY", "ASSAULT", "HOMICIDE", "ROBBERY", "NARCOTICS", "OBSCENITY"]
LOCATIONS = [f"LOC_{i}" for i in range(12)]
SCHEMA = (
    "ID long, `Case Number` string, Date string, `Primary Type` string, "
    "Description string, `Location Description` string, Arrest boolean, "
    "Domestic boolean, District int, `Community Area` int, "
    "Latitude double, Longitude double, Location string"
)


def _fixture_rows(n=2000):
    rng = random.Random(42)
    rows = []
    for i in range(n):
        year = rng.choice([2004, 2008, 2012, 2016, 2020])
        month, day = rng.randint(1, 12), rng.randint(1, 28)
        hour12 = rng.randint(1, 12)
        ampm = rng.choice(["AM", "PM"])
        rows.append(
            (
                i,
                f"HY{i:06d}",
                f"{month:02d}/{day:02d}/{year} {hour12:02d}:{rng.randint(0,59):02d}:00 {ampm}",
                rng.choice(TYPES),
                f"DESC-{rng.randint(0,5)}/X:{rng.randint(0,5)}",
                rng.choice(LOCATIONS),
                rng.random() < 0.25,
                rng.random() < 0.15,
                rng.randint(1, 25),
                rng.randint(1, 77),
                41.6 + rng.random() * 0.5,
                -87.9 + rng.random() * 0.4,
                "(lat, lon)",
            )
        )
    return rows


@pytest.fixture(scope="module")
def analytics(spark):
    raw = spark.createDataFrame(_fixture_rows(), SCHEMA)
    return CrimesAnalytics.from_raw(raw)


def test_cleaning_excludes_categories(analytics):
    types = {r["Primary Type"] for r in analytics.distinct_primary_types().collect()}
    assert "OBSCENITY" not in types and "THEFT" in types


def test_counts_by_primary_type_desc(analytics):
    rows = analytics.counts_by_primary_type().collect()
    counts = [r.Count for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert sum(counts) == analytics.df.count()


def test_critical_hours_bounded(analytics):
    rows = analytics.critical_hours().collect()
    hours = [r.hour for r in rows]
    assert all(0 <= h <= 23 for h in hours)
    assert len(hours) == len(set(hours))


def test_season_pivot_conserves_total(analytics):
    pdf = analytics.season_pivot().toPandas()
    assert set(pdf.columns) == {"year", "Winter", "Spring", "Summer", "Autumn"}
    assert pdf[["Winter", "Spring", "Summer", "Autumn"]].to_numpy().sum() == analytics.df.count()


def test_arrest_percentage_formula(analytics):
    pct = analytics.arrest_percentage().collect()[0].pct
    arrested = analytics.df.filter(F.col("Arrest") == 1).count()
    assert pct == pytest.approx(100.0 * arrested / analytics.df.count(), abs=1e-4)


def test_top_locations_k(analytics):
    rows = analytics.common_crime_locations(5).collect()
    assert len(rows) == 5
    assert rows[0].cnt >= rows[-1].cnt


def test_violent_areas_only_violent(analytics):
    total_violent = analytics.df.filter(
        F.col("Primary Type").isin(["HOMICIDE", "ASSAULT", "ROBBERY"])
    ).count()
    rows = analytics.violent_area_counts(10).collect()
    assert sum(r.cnt for r in rows) <= total_violent


def test_moving_average_intended_semantics(analytics):
    pdf = analytics.moving_average(3).toPandas()
    # trailing mean must differ from the raw count somewhere — the
    # reference's degenerate window made them identical everywhere
    assert (pdf.moving_avg != pdf.Crimes_count).any()
    # spot-check row 2 (0-indexed): mean of first three counts
    expect = pdf.Crimes_count[:3].mean()
    assert pdf.moving_avg[2] == pytest.approx(expect, abs=1e-4)


def test_district_centroids_in_bbox(analytics):
    rows = analytics.district_centroids().collect()
    assert all(41.5 < r.avg_lat < 42.2 and -88.0 < r.avg_lon < -87.4 for r in rows)


def test_kmeans_clusters_cover_districts(analytics):
    rows = analytics.kmeans_district_clusters().collect()
    assert sum(r.n for r in rows) == analytics.df.select("District").distinct().count()


def test_logreg_auc_range(analytics):
    auc = analytics.logistic_regression_auc().collect()[0].roc_auc
    assert 0.0 <= auc <= 1.0


def test_correlation_matrix_square(analytics):
    pdf = analytics.correlation_matrix().toPandas()
    n = pdf.col_a.nunique()
    assert len(pdf) == n * n
    diag = pdf[pdf.col_a == pdf.col_b].corr_value if "corr_value" in pdf else pdf[pdf.col_a == pdf.col_b]["corr"]
    assert all(abs(v - 1.0) < 1e-6 for v in diag)


def test_dtype_census(analytics):
    pdf = analytics.dtype_census().toPandas()
    assert pdf.n_columns.sum() == len(analytics.df.columns)


def test_menu_router_dispatch_and_repl(analytics):
    """The interactive shell (Dataset.py:893-938 equivalent): every MENU
    option resolves to a real method returning a DataFrame; the REPL loop
    renders a numbered menu, runs a choice, rejects junk, and quits."""
    from big_data_chicago_crimes_spark.app import MENU, main_menu, run_option

    for option in MENU:
        df = run_option(analytics, option)
        assert hasattr(df, "schema"), option

    inputs = iter(["2", "banana", "q"])
    printed: list[str] = []
    main_menu(analytics, input_fn=lambda _: next(inputs), print_fn=printed.append)
    joined = "\n".join(printed)
    assert "Crimes per category" in joined          # menu rendered
    assert "Primary Type" in joined                 # option 2 output shown
    assert "unknown option 'banana'" in joined      # junk rejected
