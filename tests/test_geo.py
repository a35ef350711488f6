"""Driver-side geo layer: WKT parsing, feature styling, file sink."""

from __future__ import annotations

import json

from big_data_chicago_crimes_spark.geo import (
    cluster_color,
    districts_to_geojson,
    wkt_to_geojson_geometry,
    write_geojson,
)

POLY = "POLYGON ((-87.9 41.6, -87.5 41.6, -87.5 42.1, -87.9 41.6))"
MULTI = (
    "MULTIPOLYGON (((-87.9 41.6, -87.5 41.6, -87.5 42.1, -87.9 41.6)), "
    "((-87.8 41.7, -87.6 41.7, -87.6 41.9, -87.8 41.7)))"
)


def test_polygon_parse():
    g = wkt_to_geojson_geometry(POLY)
    assert g["type"] == "Polygon"
    assert g["coordinates"][0][0] == [-87.9, 41.6]
    assert len(g["coordinates"][0]) == 4


def test_multipolygon_parse():
    g = wkt_to_geojson_geometry(MULTI)
    assert g["type"] == "MultiPolygon"
    assert len(g["coordinates"]) == 2
    assert g["coordinates"][1][0][1] == [-87.6, 41.7]


def test_feature_collection_with_clusters(tmp_path):
    fc = districts_to_geojson([(1, POLY), (2, MULTI)], {1: 0, 2: 2})
    assert len(fc["features"]) == 2
    props = {f["properties"]["DIST_NUM"]: f["properties"] for f in fc["features"]}
    assert props[1]["fill"] == cluster_color(0)
    assert props[2]["cluster"] == 2
    out = tmp_path / "districts.geojson"
    write_geojson(fc, str(out))
    assert json.loads(out.read_text())["type"] == "FeatureCollection"
