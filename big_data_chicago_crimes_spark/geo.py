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
