"""Driver-side geo layer: WKT parsing, feature styling, file sink."""

from __future__ import annotations

import json

from big_data_chicago_crimes_spark.geo import (
    cluster_color,
    districts_to_geojson,
    wkt_to_geojson_geometry,
    write_geojson,
    write_html_map,
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


def test_html_map_sink(tmp_path):
    """S8: the folium map.html equivalent — self-contained HTML with one
    SVG path per district, cluster-colored, tooltip and legend present."""
    fc = districts_to_geojson([(1, POLY), (2, MULTI)], {1: 0, 2: 2})
    out = write_html_map(fc, str(tmp_path / "map.html"))
    html_doc = open(out).read()
    assert html_doc.startswith("<!DOCTYPE html>")
    # one path per feature; MULTI has two rings inside one path
    assert html_doc.count("<path") == 2
    assert html_doc.count("M ") == 3  # 1 polygon ring + 2 multipolygon rings
    assert cluster_color(0) in html_doc and cluster_color(2) in html_doc
    assert "District 1" in html_doc and "cluster 2" in html_doc
    assert "<li>" in html_doc  # legend


def test_crime_map_flow_end_to_end(spark, tmp_path):
    """The reference's crime_map pipeline (Dataset.py:261-334) end to
    end on this engine: crimes → per-district KMeans clusters →
    GeoJSON features colored by cluster → map.html. Dim-sized driver
    hop happens exactly once (the 25-row district/cluster collect)."""
    from big_data_chicago_crimes_spark.app import CrimesAnalytics

    rows = [
        (i, f"C{i}", "07/04/2016 01:30:00 PM", "THEFT", "d", f"L{i%3}",
         True, False, (i % 4) + 1, 1, 41.8, -87.6, "loc")
        for i in range(200)
    ]
    schema = (
        "ID long, `Case Number` string, Date string, `Primary Type` string, "
        "Description string, `Location Description` string, Arrest boolean, "
        "Domestic boolean, District int, `Community Area` int, "
        "Latitude double, Longitude double, Location string"
    )
    analytics = CrimesAnalytics.from_raw(spark.createDataFrame(rows, schema))
    assignments = {
        r.District: r.cluster
        for r in analytics.district_cluster_assignments(k=2).collect()
    }
    assert set(assignments) == {1, 2, 3, 4}
    assert set(assignments.values()) <= {0, 1}

    district_wkts = [
        (d, f"POLYGON ((-87.9 41.{5+d}, -87.5 41.{5+d}, -87.5 42.0, -87.9 41.{5+d}))")
        for d in assignments
    ]
    fc = districts_to_geojson(district_wkts, assignments)
    out = write_html_map(fc, str(tmp_path / "map.html"))
    html_doc = open(out).read()
    assert html_doc.count("<path") == 4
    for d, c in assignments.items():
        assert f"District {d} — cluster {c}" in html_doc


def test_districts_csv_roundtrip(tmp_path):
    """S6: the driver-side dim-CSV read — write/read roundtrip preserves
    district numbers and WKT verbatim (the reference's pandas read of
    the 25-row district file)."""
    from big_data_chicago_crimes_spark.geo import (
        load_districts_csv,
        write_districts_csv,
    )

    districts = [(1, POLY), (2, MULTI), (15, POLY)]
    path = str(tmp_path / "districts.csv")
    write_districts_csv(districts, path)
    assert load_districts_csv(path) == districts
