from __future__ import annotations

import json

from pyspark.sql import functions as F

from ad_data_pipelines_spark.operators.geo import label_by_polygons
from ad_data_pipelines_spark.sources.sideinputs import read_geojson_polygons

FC = {
    "type": "FeatureCollection",
    "features": [
        {
            "type": "Feature",
            "properties": {"NAME_2": "Abu Dhabi"},
            "geometry": {
                "type": "Polygon",
                "coordinates": [[[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]],
            },
        },
        {
            "type": "Feature",
            "properties": {"NAME_2": "Al Ain"},
            "geometry": {
                "type": "MultiPolygon",
                "coordinates": [
                    [[[20, 0], [30, 0], [30, 10], [20, 10], [20, 0]]],
                    [[[40, 0], [41, 0], [41, 1], [40, 1], [40, 0]]],
                ],
            },
        },
    ],
}


def test_geojson_to_polygon_labels(spark, tmp_path):
    p = tmp_path / "regions.geojson"
    p.write_text(json.dumps(FC))
    df, polys = read_geojson_polygons(spark, str(p))
    assert {r.name for r in df.collect()} == {"Abu Dhabi", "Al Ain"}
    assert len(polys["Abu Dhabi"]) == 5
    # end-to-end J12: label points against the parsed polygons
    pts = spark.createDataFrame(
        [(5.0, 5.0), (25.0, 5.0), (50.0, 5.0)], "px double, py double"
    )
    out = label_by_polygons(pts, "px", "py", polys)
    got = {(r.px): r.region_id for r in out.collect()}
    assert got == {5.0: "Abu Dhabi", 25.0: "Al Ain", 50.0: "Unknown"}
