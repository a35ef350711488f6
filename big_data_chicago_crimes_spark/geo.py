"""Driver-side geospatial layer (reference: WKT→GeoJSON conversion and
the cluster-colored district map, Dataset.py:40-47 and 291-334).

Kept OUT of Spark by design (SURVEY.md §7.4): the district table is 25
rows — a broadcast-sized dimension whose parsing/rendering is
presentation work, not a distributed operator. The reference leans on
shapely/geopandas/folium; this is a dependency-free equivalent: a
minimal WKT POLYGON/MULTIPOLYGON parser producing GeoJSON dicts, plus
the cluster→color style lookup that replaces the reference's
``style_function`` closure.

The join-shaped piece (district → cluster label) is exposed both ways:
driver-side dict (reference behavior) and as a real broadcast join in
``app.CrimesAnalytics`` / ``operators.relational.dim_join``.
"""

from __future__ import annotations

import json
import re

CLUSTER_COLORS = ["red", "green", "blue", "orange", "purple", "gray"]


def _parse_ring(text: str) -> list[list[float]]:
    """'x1 y1, x2 y2, ...' → [[x1, y1], ...]"""
    pts = []
    for pair in text.split(","):
        xy = pair.split()
        pts.append([float(xy[0]), float(xy[1])])
    return pts


def _split_rings(body: str) -> list[str]:
    """Split '(..ring..), (..ring..)' into ring bodies."""
    return [m.group(1) for m in re.finditer(r"\(([^()]+)\)", body)]


def wkt_to_geojson_geometry(wkt: str) -> dict:
    """Parse WKT POLYGON or MULTIPOLYGON into a GeoJSON geometry dict.
    (The district file's the_geom column; Dataset.py:43 used shapely.)"""
    s = wkt.strip()
    upper = s.upper()
    if upper.startswith("POLYGON"):
        body = s[s.index("(") + 1 : s.rindex(")")]
        return {"type": "Polygon", "coordinates": [_parse_ring(r) for r in _split_rings(body)]}
    if upper.startswith("MULTIPOLYGON"):
        body = s[s.index("(") + 1 : s.rindex(")")]
        polys = []
        # polygons are '((ring),(ring))' groups at depth 1
        depth, start = 0, None
        for i, ch in enumerate(body):
            if ch == "(":
                if depth == 0:
                    start = i + 1
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    polys.append(
                        [_parse_ring(r) for r in _split_rings(body[start - 1 : i + 1])]
                    )
        return {"type": "MultiPolygon", "coordinates": polys}
    raise ValueError(f"unsupported WKT geometry: {s[:40]}...")


def districts_to_geojson(
    districts: list[tuple[int, str]], cluster_by_district: dict[int, int] | None = None
) -> dict:
    """(DIST_NUM, the_geom WKT) rows → GeoJSON FeatureCollection, each
    feature carrying its district number, cluster label, and fill color
    (the reference's convert_to_geojson + style_function combined)."""
    features = []
    for dist_num, wkt in districts:
        cluster = (cluster_by_district or {}).get(dist_num)
        features.append(
            {
                "type": "Feature",
                "geometry": wkt_to_geojson_geometry(wkt),
                "properties": {
                    "DIST_NUM": dist_num,
                    "cluster": cluster,
                    "fill": cluster_color(cluster),
                },
            }
        )
    return {"type": "FeatureCollection", "features": features}


def cluster_color(cluster: int | None) -> str:
    """Deterministic color per cluster label (Dataset.py:297-312)."""
    if cluster is None:
        return "black"
    return CLUSTER_COLORS[cluster % len(CLUSTER_COLORS)]


def write_geojson(fc: dict, path: str) -> None:
    """GeoJSON file sink (Dataset.py:47 used geopandas.to_file)."""
    with open(path, "w") as f:
        json.dump(fc, f)


def load_districts_csv(path: str) -> list[tuple[int, str]]:
    """S6 — the driver-side district dim CSV read (the reference loads
    its 25-row district boundary file with pandas, Dataset.py:40-43;
    this is the dependency-free equivalent). Columns: ``DIST_NUM``,
    ``the_geom`` (WKT). Driver-side BY DESIGN (SURVEY §7.4): a 25-row
    presentation dimension never justifies a distributed scan."""
    import csv

    rows: list[tuple[int, str]] = []
    with open(path, newline="") as f:
        for rec in csv.DictReader(f):
            rows.append((int(rec["DIST_NUM"]), rec["the_geom"]))
    return rows


def write_districts_csv(districts: list[tuple[int, str]], path: str) -> None:
    """Inverse of :func:`load_districts_csv` (fixture/export helper)."""
    import csv

    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["DIST_NUM", "the_geom"])
        w.writerows(districts)


def _feature_rings(geom: dict) -> list[list[list[float]]]:
    """All outer+inner rings of a Polygon/MultiPolygon geometry."""
    if geom["type"] == "Polygon":
        return list(geom["coordinates"])
    return [ring for poly in geom["coordinates"] for ring in poly]


def write_html_map(
    fc: dict, path: str, width: int = 800, height: int = 800, title: str = "District map"
) -> str:
    """HTML map sink (S8): the reference renders its cluster-colored
    district map with folium and saves ``map.html`` (Dataset.py:314-334).
    This is the dependency-free equivalent: one self-contained HTML page
    with an inline SVG — district polygons filled by cluster color, a
    tooltip per district (SVG <title>), and a cluster legend. Input is
    the FeatureCollection from ``districts_to_geojson`` (dim-sized by
    construction: 25 districts)."""
    all_pts = [
        pt
        for f in fc["features"]
        for ring in _feature_rings(f["geometry"])
        for pt in ring
    ]
    if not all_pts:
        raise ValueError("empty FeatureCollection")
    xs, ys = [p[0] for p in all_pts], [p[1] for p in all_pts]
    x0, x1, y0, y1 = min(xs), max(xs), min(ys), max(ys)
    sx = (width - 20) / ((x1 - x0) or 1.0)
    sy = (height - 20) / ((y1 - y0) or 1.0)
    s = min(sx, sy)

    def proj(pt: list[float]) -> str:
        # lat increases north → SVG y grows down, so flip y
        return f"{10 + (pt[0] - x0) * s:.2f},{10 + (y1 - pt[1]) * s:.2f}"

    import html as _html

    def esc(v) -> str:
        # caller-supplied titles / feature properties must not be able to
        # break the markup (render.py escapes the same way)
        return _html.escape(str(v), quote=True)

    shapes = []
    clusters_seen: dict[int | None, str] = {}
    for f in fc["features"]:
        props = f["properties"]
        clusters_seen[props.get("cluster")] = props.get("fill", "black")
        d = " ".join(
            "M " + " L ".join(proj(p) for p in ring) + " Z"
            for ring in _feature_rings(f["geometry"])
        )
        shapes.append(
            f'<path d="{d}" fill="{esc(props.get("fill", "black"))}" fill-opacity="0.5" '
            f'stroke="black" stroke-width="0.5">'
            f'<title>District {esc(props.get("DIST_NUM"))} — cluster '
            f'{esc(props.get("cluster"))}</title></path>'
        )
    legend = "".join(
        f'<li><span style="background:{esc(color)};display:inline-block;'
        f'width:12px;height:12px"></span> cluster {esc(c)}</li>'
        for c, color in sorted(clusters_seen.items(), key=lambda kv: str(kv[0]))
    )
    html_doc = (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        f"<title>{esc(title)}</title></head><body><h3>{esc(title)}</h3>"
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}">'
        + "".join(shapes)
        + f"</svg><ul style='list-style:none'>{legend}</ul></body></html>"
    )
    with open(path, "w") as f:
        f.write(html_doc)
    return path
