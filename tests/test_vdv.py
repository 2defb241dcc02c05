"""VDV .x10 reader tests — golden fixtures for all three dialects
(FIXTURES.md F8; reference loaders SURVEY.md §2.1 S5-S7)."""

from __future__ import annotations

import pytest

from ad_data_pipelines_spark.schemas import VDV_LINE, VDV_OPERATING_DEPARTMENT
from ad_data_pipelines_spark.sources import vdv

POSITIONAL = """\
mod; DD.MM.YYYY; HH:MM:SS; free
tbl; LINE
rec; 1; 10; A1; 11; Route A1
rec; 1; 20; B2; 22; Route B2
end;
tbl; OPERATING_DEPARTMENT
rec; 11; "AD-City"
rec; -33; "WR-West"
end;
"""

HEADERED = """\
tbl; LINE
atr; BASE_VERSION; LINE_NO; LINE_ABBR; OP_DEP_NO; LINE_DESC
frm; num[9.0]; num[9.0]; char[8]; num[9.0]; char[40]
rec; 1; 10; "A1"; 11; "Route A1"
rec; 1; 30; "C9"; -33; "Route C9"
tbl; DAY_TYPE
atr; DAY_TYPE_NO; DAY_TYPE_ABBR
frm; num[9.0]; char[8]
rec; 1; "MoFr"
end;
"""

FIXED = (
    "header junk line 1\n" * 10  # lines 1-10
    + "; BASE_VERSION; LINE_NO; LINE_ABBR; OP_DEP_NO; LINE_DESC\n"  # line 11
    + "separator line 12\n"
    + "x; 1; 10; A1; 11; Route A1\n"
    + "x; 1; 20; B2; 22; Route B2\n"
    + "trailer 1\n"
    + "trailer 2\n"
)


def test_positional_dialect(spark, tmp_path):
    p = tmp_path / "pos.x10"
    p.write_text(POSITIONAL)
    line = vdv.read_vdv(spark, str(p), "LINE", schema=VDV_LINE)
    rows = {r.LINE_ABBR: r for r in line.collect()}
    assert rows["A1"].OP_DEP_NO == 11 and rows["A1"].BASE_VERSION == 1
    od = vdv.read_vdv(
        spark, str(p), "OPERATING_DEPARTMENT", schema=VDV_OPERATING_DEPARTMENT
    )
    got = {r.OP_DEP_NO: r.OP_DEP_ABBR for r in od.collect()}
    assert got == {11: "AD-City", -33: "WR-West"}  # quotes stripped


def test_headered_dialect_back_to_back_tables(spark, tmp_path):
    p = tmp_path / "hdr.x10"
    p.write_text(HEADERED)
    line = vdv.read_vdv(spark, str(p), "LINE")
    assert line.columns == [
        "BASE_VERSION", "LINE_NO", "LINE_ABBR", "OP_DEP_NO", "LINE_DESC",
    ]
    rows = {r.LINE_ABBR: r for r in line.collect()}
    assert rows["C9"].OP_DEP_NO == "-33"  # untyped read keeps strings
    day = vdv.read_vdv(spark, str(p), "DAY_TYPE")
    assert day.count() == 1  # second table closed by end;


def test_headered_with_schema_casts(spark, tmp_path):
    p = tmp_path / "hdr.x10"
    p.write_text(HEADERED)
    line = vdv.read_vdv(spark, str(p), "LINE", schema=VDV_LINE)
    assert dict(line.dtypes)["OP_DEP_NO"] == "int"
    assert {r.OP_DEP_NO for r in line.collect()} == {11, -33}


def test_fixed_offset_dialect(spark, tmp_path):
    p = tmp_path / "fix.x10"
    p.write_text(FIXED)
    df = vdv.read_vdv_fixed(spark, str(p), schema=VDV_LINE)
    rows = {r.LINE_ABBR: r for r in df.collect()}
    assert set(rows) == {"A1", "B2"}  # trailers dropped, first col dropped
    assert rows["B2"].OP_DEP_NO == 22


def test_latin1_fallback(spark, tmp_path):
    p = tmp_path / "latin.x10"
    p.write_bytes("tbl; LINE\nrec; 1; 10; Caf\xe9; 11; d\n end;\n".encode("latin-1"))
    df = vdv.read_vdv(spark, str(p), "LINE", columns=["v", "n", "abbr", "op", "d"])
    assert df.count() == 1

    assert df.first().abbr == "Café"


def test_missing_table_raises(spark, tmp_path):
    p = tmp_path / "pos.x10"
    p.write_text(POSITIONAL)
    with pytest.raises(KeyError):
        vdv.read_vdv(spark, str(p), "NOPE")
