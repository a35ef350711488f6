"""Geo-layer certification query (SURVEY §2.1 S6–S8).

The geo layer is driver-side BY DESIGN (SURVEY §7.4: the reference's
district table is a 25-row presentation dimension — parsing WKT and
rendering a map is not a distributed operator). That design kept S6–S8
out of the driver gate through r11; this query closes the gap the same
way the ML legs did: run the REAL code path end to end inside the
builder, emit the replayable facts as a 1-row frame, and let the oracle
replay what SQL can replay (the feature count from the nation table)
plus TRUE-band booleans a broken layer cannot satisfy (the
ml_classifier_auc_surface precedent).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from big_data_chicago_crimes_spark.plans.registry import register
from big_data_chicago_crimes_spark.sources.readers import load_tables


@register(
    "geo_district_surface",
    # NEW r12: funded by merging the two rows-only sketch-candidate
    # queries into docs_sketch_candidates_surface. n_features is an
    # EXACT replay (COUNT(*) of the nation dim the districts derive
    # from); the booleans certify properties a broken geo layer cannot
    # fake: a parse that drops a ring breaks rings_closed, a feature
    # lost anywhere in CSV→GeoJSON→HTML breaks the counts, an illegal
    # cluster→color mapping breaks colors_legal.
    oracle="""
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM nation) AS n_features,
               TRUE AS valid_geojson,
               TRUE AS rings_closed,
               TRUE AS colors_legal,
               TRUE AS html_paths_match
    """,
    tags=("geo", "reference:S6", "reference:S7", "reference:S8"),
)
def geo_district_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6→S7→S8 end to end: build a deterministic district dim from the
    nation table (25 rows — the exact size of the reference's district
    file), round-trip it through the dim-CSV path
    (``geo.write_districts_csv`` / ``load_districts_csv``, S6), convert
    WKT → GeoJSON FeatureCollection with cluster coloring
    (``districts_to_geojson``, cluster = n_regionkey — the
    district→cluster→color shape of Dataset.py:291-312) and write/read
    the GeoJSON sink (S7), then render and re-read the HTML map sink
    (S8). Geometry: a unit square per district keyed by nationkey;
    every 5th district is a MULTIPOLYGON (two squares) so both parser
    branches run under the driver hash. The only Spark work is the
    25-row dim collect — driver-side is the design, and this query
    certifies the layer, not a distributed plan."""
    from big_data_chicago_crimes_spark.geo import (
        CLUSTER_COLORS,
        _feature_rings,
        districts_to_geojson,
        load_districts_csv,
        write_districts_csv,
        write_geojson,
        write_html_map,
    )

    t = load_tables(spark, sf_dir)
    dims = sorted(
        (int(r["n_nationkey"]), int(r["n_regionkey"]))
        for r in t.nation.select("n_nationkey", "n_regionkey").collect()
    )

    def square(x0: int, y0: int) -> str:
        return (
            f"(({x0} {y0}, {x0 + 1} {y0}, {x0 + 1} {y0 + 1}, "
            f"{x0} {y0 + 1}, {x0} {y0}))"
        )

    districts = []
    for key, _ in dims:
        dist = key + 1
        if dist % 5 == 0:
            wkt = f"MULTIPOLYGON ({square(key, 0)}, {square(key, 2)})"
        else:
            wkt = f"POLYGON {square(key, 0)}"
        districts.append((dist, wkt))
    clusters = {key + 1: region for key, region in dims}

    tmp = tempfile.mkdtemp(prefix="geo_surface_")
    try:
        csv_path = os.path.join(tmp, "districts.csv")
        write_districts_csv(districts, csv_path)
        loaded = load_districts_csv(csv_path)  # S6

        fc = districts_to_geojson(loaded, clusters)
        geo_path = os.path.join(tmp, "districts.geojson")
        write_geojson(fc, geo_path)  # S7
        with open(geo_path) as f:
            fc_back = json.load(f)

        html_path = write_html_map(fc_back, os.path.join(tmp, "map.html"))  # S8
        with open(html_path) as f:
            html_doc = f.read()
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)

    feats = fc_back.get("features", [])
    n_features = len(feats)
    valid_geojson = (
        fc_back.get("type") == "FeatureCollection"
        and loaded == districts
        and all(f.get("type") == "Feature" for f in feats)
    )
    rings_closed = all(
        ring[0] == ring[-1]
        for f in feats
        for ring in _feature_rings(f["geometry"])
    )
    colors_legal = all(
        f["properties"]["fill"] in CLUSTER_COLORS
        and f["properties"]["fill"] == CLUSTER_COLORS[f["properties"]["cluster"] % len(CLUSTER_COLORS)]
        for f in feats
    )
    html_paths_match = (
        html_doc.startswith("<!DOCTYPE html>")
        and html_doc.count("<path") == n_features
        and all(f"District {d}" in html_doc for d, _ in districts)
    )
    return spark.createDataFrame(
        [
            (
                n_features,
                bool(valid_geojson),
                bool(rings_closed),
                bool(colors_legal),
                bool(html_paths_match),
            )
        ],
        "n_features bigint, valid_geojson boolean, rings_closed boolean, "
        "colors_legal boolean, html_paths_match boolean",
    )
