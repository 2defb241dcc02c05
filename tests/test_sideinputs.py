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


def test_read_excel_stdlib_reference_file(spark):
    """The dependency-free SpreadsheetML parser reads the reference's
    real dimension workbook (no openpyxl in this container — this IS
    the active path)."""
    from ad_data_pipelines_spark.sources.sideinputs import (
        excel_serial_to_timestamp,
        read_excel,
    )

    df = read_excel(spark, "/root/reference/scripts/dim_region_manual.xlsx")
    rows = {r.region_name for r in df.collect()}
    assert rows == {"Abu Dhabi", "Al Ain", "Al Dhafra"}
    assert dict(df.dtypes)["id"] == "bigint"
    ts = df.select(
        excel_serial_to_timestamp("create_time").alias("ct")
    ).first().ct
    assert ts.year == 2025  # serial 45875.69… = 2025-08-06


def test_read_excel_stdlib_crafted(spark, tmp_path):
    """Crafted workbook: shared + inline strings, ints, floats, bools,
    gaps (sparse cells), header sanitation."""
    import zipfile

    p = tmp_path / "t.xlsx"
    ssml = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rels = "http://schemas.openxmlformats.org/package/2006/relationships"
    odoc = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("xl/workbook.xml",
            f'<workbook xmlns="{ssml}" xmlns:r="{odoc}"><sheets>'
            '<sheet name="S1" sheetId="1" r:id="rId1"/></sheets></workbook>')
        z.writestr("xl/_rels/workbook.xml.rels",
            f'<Relationships xmlns="{rels}">'
            '<Relationship Id="rId1" Type="x" Target="worksheets/sheet1.xml"/>'
            "</Relationships>")
        z.writestr("xl/sharedStrings.xml",
            f'<sst xmlns="{ssml}"><si><t>name col</t></si>'
            "<si><t>alpha</t></si></sst>")
        z.writestr("xl/worksheets/sheet1.xml",
            f'<worksheet xmlns="{ssml}"><sheetData>'
            '<row r="1"><c r="A1" t="s"><v>0</v></c>'
            '<c r="B1" t="inlineStr"><is><t>n</t></is></c>'
            '<c r="C1" t="inlineStr"><is><t>flag</t></is></c></row>'
            '<row r="2"><c r="A2" t="s"><v>1</v></c>'
            '<c r="B2"><v>7</v></c><c r="C2" t="b"><v>1</v></c></row>'
            '<row r="3"><c r="B3"><v>2.5</v></c></row>'
            "</sheetData></worksheet>")
    from ad_data_pipelines_spark.sources.sideinputs import _read_xlsx_stdlib

    names, rows = _read_xlsx_stdlib(str(p))
    assert names == ["name col", "n", "flag"]
    assert rows == [["alpha", 7, True], [None, 2.5, None]]

    from ad_data_pipelines_spark.sources.sideinputs import read_excel

    df = read_excel(spark, str(p))
    assert df.columns == ["name_col", "n", "flag"]
    got = sorted(
        ((r.name_col, r.n, r.flag) for r in df.collect()),
        key=lambda x: (x[0] is None, str(x[0])),
    )
    # int 7 and float 2.5 in one column → unified to double
    assert got == [("alpha", 7.0, True), (None, 2.5, None)]
