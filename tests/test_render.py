"""Presentation-layer smoke test: the nine golden reference charts
(render.py module docstring maps them to /root/reference/finale/*.png)
render as standalone SVG from a CrimesAnalytics instance."""

from __future__ import annotations

import random

import pytest

from big_data_chicago_crimes_spark.app import CrimesAnalytics
from big_data_chicago_crimes_spark.render import (
    render_bar,
    render_heatmap,
    render_line,
    render_reference_charts,
)

TYPES = ["THEFT", "BATTERY", "ASSAULT", "HOMICIDE", "ROBBERY", "NARCOTICS"]
SCHEMA = (
    "ID long, `Case Number` string, Date string, `Primary Type` string, "
    "Description string, `Location Description` string, Arrest boolean, "
    "Domestic boolean, District int, `Community Area` int, "
    "Latitude double, Longitude double, Location string"
)


def _rows(n=400):
    rng = random.Random(7)
    out = []
    for i in range(n):
        year = rng.choice([2004, 2008, 2012, 2016, 2020])
        month, day = rng.randint(1, 12), rng.randint(1, 28)
        out.append(
            (
                i,
                f"HY{i:06d}",
                f"{month:02d}/{day:02d}/{year} {rng.randint(1,12):02d}:00:00 "
                + rng.choice(["AM", "PM"]),
                rng.choice(TYPES),
                f"DESC-{rng.randint(0,3)}",
                f"LOC_{rng.randint(0,8)}",
                rng.random() < 0.3,
                rng.random() < 0.1,
                rng.randint(1, 10),
                rng.randint(1, 30),
                41.6 + rng.random() * 0.5,
                -87.9 + rng.random() * 0.4,
                "(lat, lon)",
            )
        )
    return out


def test_nine_reference_charts_render(spark, tmp_path):
    raw = spark.createDataFrame(_rows(), SCHEMA)
    analytics = CrimesAnalytics.from_raw(raw)
    charts = render_reference_charts(analytics, str(tmp_path))
    assert set(charts) == {
        "hourly_trend",
        "counts_by_type",
        "dtype_census",
        "district_counts",
        "season",
        "common_locations",
        "moving_avg",
        "hist_logistic_reg",
        "hist_random_forest",
        "correlation_matrix",
    }
    for key, path in charts.items():
        svg = open(path).read()
        assert svg.startswith("<svg"), key
        assert svg.rstrip().endswith("</svg>"), key
        assert ("<rect" in svg) or ("<polyline" in svg), key


def test_bar_line_heatmap_primitives(tmp_path):
    import pandas as pd

    bar = pd.DataFrame({"cat": ["a", "b"], "n": [3, 5]})
    path = render_bar(bar, "cat", "n", str(tmp_path / "b.svg"), "t")
    svg = open(path).read()
    assert svg.count('fill="#4C78A8"') == 2

    line = pd.DataFrame({"x": [1, 2, 3], "y1": [1.0, 2.0, 3.0], "y2": [3.0, 2.0, 1.0]})
    path = render_line(line, "x", ["y1", "y2"], str(tmp_path / "l.svg"), "t")
    assert open(path).read().count("<polyline") == 2

    hm = pd.DataFrame({"col": ["u", "v"], "u": [1.0, 0.5], "v": [0.5, 1.0]})
    path = render_heatmap(hm, "col", str(tmp_path / "h.svg"), "t")
    svg = open(path).read()
    assert svg.count("<rect") == 5  # 4 cells + background
    assert "1.00" in svg and "0.50" in svg


def test_heatmap_diverging_scale_endpoints(tmp_path):
    import pandas as pd

    hm = pd.DataFrame({"col": ["r"], "a": [1.0], "b": [-1.0], "c": [0.0]})
    path = render_heatmap(hm, "col", str(tmp_path / "d.svg"), "t")
    svg = open(path).read()
    assert "rgb(255,0,0)" in svg  # +1 → pure red
    assert "rgb(0,0,255)" in svg  # -1 → pure blue
    assert "rgb(255,255,255)" in svg  # 0 → white
