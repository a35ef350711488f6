"""Presentation layer: the reference's nine golden charts from engine
DataFrames (``/root/reference/finale/*.png``, drawn inline with
seaborn/matplotlib at Dataset.py:173-541).

The engine keeps compute and presentation separate — every
CrimesAnalytics method returns a DataFrame — so this module is the thin
renderer on top. Charts are emitted as standalone SVG via a
dependency-free writer (matplotlib/seaborn are not container-baked;
SVG is deterministic, diffable, and needs nothing but a browser). Each
``render_*`` primitive takes an already-small pandas frame — chart
inputs are aggregates, dim-sized by construction, so the single
``toPandas()`` per chart is the sanctioned dim-sized driver transfer.

Chart ↔ reference mapping (finale/ file → render_reference_charts key):

| reference PNG                     | key                  | data source                  |
| --------------------------------- | -------------------- | ---------------------------- |
| trend of crimes over the day.png  | hourly_trend         | critical_hours()             |
| distr_by_PT.png                   | counts_by_type       | counts_by_primary_type()     |
| tipi_dataframe.png                | dtype_census         | dtype_census()               |
| crimes_for_district.png           | district_counts      | district_counts()            |
| season.png                        | season               | season_pivot()               |
| first_10_loc.png                  | common_locations     | common_crime_locations(10)   |
| moving_avg.png                    | moving_avg           | moving_average(3)            |
| hist_logistic_reg.png             | hist_logistic_reg    | prediction_histogram(LR)     |
| hist_random_forest.png            | hist_random_forest   | prediction_histogram(RF)     |
| matrice di correlazione.png       | correlation_matrix   | correlation_matrix()         |
"""

from __future__ import annotations

import html
import os
from typing import Sequence

import pandas as pd

W, H = 720, 440
ML, MR, MT, MB = 90, 30, 50, 90  # margins: left/right/top/bottom
PLOT_W, PLOT_H = W - ML - MR, H - MT - MB
BAR_FILL = "#4C78A8"
LINE_COLORS = ["#4C78A8", "#F58518", "#54A24B", "#E45756", "#72B7B2"]


def _svg_open(title: str) -> list[str]:
    return [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{W}" height="{H}" '
        f'viewBox="0 0 {W} {H}" font-family="sans-serif">',
        f'<rect width="{W}" height="{H}" fill="white"/>',
        f'<text x="{W / 2}" y="{MT / 2 + 5}" text-anchor="middle" '
        f'font-size="16">{html.escape(title)}</text>',
    ]


def _axes() -> list[str]:
    return [
        f'<line x1="{ML}" y1="{MT}" x2="{ML}" y2="{MT + PLOT_H}" stroke="black"/>',
        f'<line x1="{ML}" y1="{MT + PLOT_H}" x2="{ML + PLOT_W}" '
        f'y2="{MT + PLOT_H}" stroke="black"/>',
    ]


def _y_ticks(lo: float, hi: float, n: int = 5) -> list[str]:
    out = []
    span = (hi - lo) or 1.0
    for i in range(n + 1):
        v = lo + span * i / n
        y = MT + PLOT_H - PLOT_H * i / n
        out.append(
            f'<text x="{ML - 8}" y="{y + 4}" text-anchor="end" font-size="10">'
            f"{v:.4g}</text>"
        )
        out.append(
            f'<line x1="{ML - 4}" y1="{y}" x2="{ML}" y2="{y}" stroke="black"/>'
        )
    return out


def _write(path: str, parts: list[str]) -> str:
    parts.append("</svg>")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(parts))
    return path


def render_bar(
    pdf: pd.DataFrame, x: str, y: str, path: str, title: str
) -> str:
    """Categorical bar chart (the reference's seaborn barplot shape)."""
    vals = pdf[y].astype(float).tolist()
    cats = [str(v) for v in pdf[x].tolist()]
    hi = max(vals + [0.0]) or 1.0
    parts = _svg_open(title) + _axes() + _y_ticks(0.0, hi)
    n = max(len(vals), 1)
    bw = PLOT_W / n
    for i, (c, v) in enumerate(zip(cats, vals)):
        bh = PLOT_H * (v / hi)
        bx = ML + i * bw + bw * 0.1
        by = MT + PLOT_H - bh
        parts.append(
            f'<rect x="{bx:.1f}" y="{by:.1f}" width="{bw * 0.8:.1f}" '
            f'height="{bh:.1f}" fill="{BAR_FILL}"/>'
        )
        parts.append(
            f'<text x="{ML + (i + 0.5) * bw:.1f}" y="{MT + PLOT_H + 12}" '
            f'text-anchor="end" font-size="9" '
            f'transform="rotate(-45 {ML + (i + 0.5) * bw:.1f} {MT + PLOT_H + 12})">'
            f"{html.escape(c[:18])}</text>"
        )
    return _write(path, parts)


def render_line(
    pdf: pd.DataFrame,
    x: str,
    ys: Sequence[str],
    path: str,
    title: str,
) -> str:
    """Line chart with one polyline per ``ys`` column (seaborn lineplot)."""
    n = len(pdf)
    all_vals = [float(v) for c in ys for v in pdf[c].astype(float)]
    lo, hi = (min(all_vals), max(all_vals)) if all_vals else (0.0, 1.0)
    if lo == hi:
        lo, hi = lo - 1.0, hi + 1.0
    parts = _svg_open(title) + _axes() + _y_ticks(lo, hi)
    for si, col in enumerate(ys):
        pts = []
        for i, v in enumerate(pdf[col].astype(float)):
            px = ML + (PLOT_W * i / max(n - 1, 1))
            py = MT + PLOT_H - PLOT_H * (float(v) - lo) / (hi - lo)
            pts.append(f"{px:.1f},{py:.1f}")
        color = LINE_COLORS[si % len(LINE_COLORS)]
        parts.append(
            f'<polyline points="{" ".join(pts)}" fill="none" '
            f'stroke="{color}" stroke-width="2"/>'
        )
        parts.append(
            f'<text x="{ML + PLOT_W - 4}" y="{MT + 14 + 14 * si}" '
            f'text-anchor="end" font-size="11" fill="{color}">'
            f"{html.escape(col)}</text>"
        )
    # x labels: first, middle, last
    cats = [str(v) for v in pdf[x].tolist()]
    for i in {0, n // 2, n - 1} if n else set():
        px = ML + (PLOT_W * i / max(n - 1, 1))
        parts.append(
            f'<text x="{px:.1f}" y="{MT + PLOT_H + 16}" text-anchor="middle" '
            f'font-size="10">{html.escape(cats[i])}</text>'
        )
    return _write(path, parts)


def render_heatmap(
    pdf: pd.DataFrame, row_label: str, path: str, title: str
) -> str:
    """Matrix heatmap (seaborn heatmap shape): first column = row label,
    remaining numeric columns = cells, diverging blue-white-red scale
    over [-1, 1] (the correlation-matrix convention)."""
    cols = [c for c in pdf.columns if c != row_label]
    rows = [str(v) for v in pdf[row_label].tolist()]
    nr, nc = max(len(rows), 1), max(len(cols), 1)
    cw, ch = PLOT_W / nc, PLOT_H / nr
    parts = _svg_open(title)
    for ri in range(len(rows)):
        for ci, c in enumerate(cols):
            v = float(pdf.iloc[ri][c])
            t = max(-1.0, min(1.0, v))
            if t >= 0:  # white → red
                r, g, b = 255, int(255 * (1 - t)), int(255 * (1 - t))
            else:  # white → blue
                r, g, b = int(255 * (1 + t)), int(255 * (1 + t)), 255
            x0, y0 = ML + ci * cw, MT + ri * ch
            parts.append(
                f'<rect x="{x0:.1f}" y="{y0:.1f}" width="{cw:.1f}" '
                f'height="{ch:.1f}" fill="rgb({r},{g},{b})" stroke="#ccc"/>'
            )
            parts.append(
                f'<text x="{x0 + cw / 2:.1f}" y="{y0 + ch / 2 + 4:.1f}" '
                f'text-anchor="middle" font-size="10">{v:.2f}</text>'
            )
    for ri, rname in enumerate(rows):
        parts.append(
            f'<text x="{ML - 6}" y="{MT + (ri + 0.5) * ch + 4:.1f}" '
            f'text-anchor="end" font-size="10">{html.escape(rname[:14])}</text>'
        )
    for ci, cname in enumerate(cols):
        parts.append(
            f'<text x="{ML + (ci + 0.5) * cw:.1f}" y="{MT + PLOT_H + 14}" '
            f'text-anchor="middle" font-size="10">{html.escape(str(cname)[:14])}</text>'
        )
    return _write(path, parts)


def render_reference_charts(analytics, out_dir: str) -> dict[str, str]:
    """Render the reference's nine golden charts (see module docstring
    mapping) from a CrimesAnalytics instance. Returns {key: svg_path}."""
    from big_data_chicago_crimes_spark.operators import ml as ml_ops

    out: dict[str, str] = {}

    def p(name: str) -> str:
        return os.path.join(out_dir, f"{name}.svg")

    hourly = analytics.critical_hours().toPandas()
    out["hourly_trend"] = render_line(
        hourly, "hour", ["max_cnt"], p("hourly_trend"), "Trend of crimes over the day"
    )

    by_type = analytics.counts_by_primary_type().toPandas()
    out["counts_by_type"] = render_bar(
        by_type, "Primary Type", "Count", p("counts_by_type"), "Crimes by primary type"
    )

    dtypes = analytics.dtype_census().toPandas()
    out["dtype_census"] = render_bar(
        dtypes, "dtype", "n_columns", p("dtype_census"), "Column dtype census"
    )

    districts = analytics.district_counts().toPandas()
    out["district_counts"] = render_bar(
        districts, "District", "cnt", p("district_counts"), "Crimes per district"
    )

    season = analytics.season_pivot().toPandas()
    season_cols = [c for c in season.columns if c != "year"]
    out["season"] = render_line(
        season, "year", season_cols, p("season"), "Crimes per season by year"
    )

    locs = analytics.common_crime_locations(10).toPandas()
    out["common_locations"] = render_bar(
        locs,
        "Location Description",
        "cnt",
        p("common_locations"),
        "Top 10 crime locations",
    )

    mavg = analytics.moving_average(3).toPandas()
    mavg_y = [c for c in mavg.columns if c not in ("year", "month")]
    out["moving_avg"] = render_line(
        mavg.assign(ym=mavg["year"].astype(str) + "-" + mavg["month"].astype(str)),
        "ym",
        mavg_y,
        p("moving_avg"),
        "3-month moving average",
    )

    lr_preds = ml_ops.logistic_regression_predictions(
        analytics._ml_frame(), "Arrest"
    )
    lr_hist = analytics.prediction_histogram(lr_preds).toPandas()
    out["hist_logistic_reg"] = render_bar(
        lr_hist, "Correct", "count", p("hist_logistic_reg"), "LR predictions"
    )

    rf_preds = ml_ops.random_forest_predictions(analytics._ml_frame(), "Arrest")
    rf_hist = analytics.prediction_histogram(rf_preds).toPandas()
    out["hist_random_forest"] = render_bar(
        rf_hist, "Correct", "count", p("hist_random_forest"), "RF predictions"
    )

    # (col_a, col_b, corr) long form → wide matrix for the heatmap
    corr = (
        analytics.correlation_matrix()
        .toPandas()
        .pivot(index="col_a", columns="col_b", values="corr")
        .reset_index()
    )
    out["correlation_matrix"] = render_heatmap(
        corr, "col_a", p("correlation_matrix"), "Correlation matrix"
    )

    return out
