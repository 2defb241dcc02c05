"""Small side-input readers: Excel lookups (S8) and GeoJSON polygon
dimensions (S9).

Reference parity: the reference read a service-type lookup from .xlsx
(scripts/ads_ridership_…py:19) and region polygons from GeoJSON
(dwd_bus_route_info_mf & other 2.R:338). Both inputs are KB-sized
dimensions → parsed driver-side, returned as broadcastable DataFrames
(same rationale as the VDV reader, sources/vdv.py).

Excel needs openpyxl/xlrd which may not be present — the reader is
gated behind an import-try and raises a clear error naming the
conversion fallback (export the sheet to CSV and use
sources.manifest.read_csv_typed).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession


def read_excel(
    spark: SparkSession, path: str, sheet: str | int = 0, header: int = 0
) -> DataFrame:
    """Excel lookup → DataFrame (S8). Requires pandas with an Excel
    engine installed; dimension-sized sheets only."""
    import pandas as pd

    try:
        pdf = pd.read_excel(path, sheet_name=sheet, header=header)
    except ImportError as e:  # openpyxl/xlrd missing in runtime
        raise ImportError(
            f"no Excel engine available ({e}); convert the sheet to CSV and "
            "load it with sources.manifest.read_csv_typed instead"
        ) from e
    pdf.columns = [str(c) for c in pdf.columns]
    return spark.createDataFrame(pdf)


def read_geojson_polygons(
    spark: SparkSession, path: str, name_property: str = "NAME_2"
) -> tuple[DataFrame, dict[str, list[tuple[float, float]]]]:
    """GeoJSON FeatureCollection → (DataFrame of features, polygon dict
    for operators.geo.label_by_polygons) (S9).

    Returns the outer ring of each (Multi)Polygon feature keyed by its
    `name_property`. A FeatureCollection of regions is tiny — stdlib
    json on the driver, no GIS dependency.
    """
    with open(path, encoding="utf-8") as f:
        fc = json.load(f)
    polygons: dict[str, list[tuple[float, float]]] = {}
    rows = []
    for feat in fc.get("features", []):
        name = str(feat.get("properties", {}).get(name_property))
        geom = feat.get("geometry", {})
        gtype = geom.get("type")
        coords = geom.get("coordinates", [])
        if gtype == "Polygon" and coords:
            ring = coords[0]
        elif gtype == "MultiPolygon" and coords:
            # largest outer ring wins (reference regions are single-part)
            ring = max((p[0] for p in coords if p), key=len)
        else:
            continue
        polygons[name] = [(float(x), float(y)) for x, y in ring]
        rows.append((name, gtype, len(ring)))
    df = spark.createDataFrame(rows, "name string, geom_type string, ring_points int")
    return df, polygons
