"""S5 xlsx reader tests. The fixture workbook is written with the same
stdlib zip+XML primitives the reader parses — no Excel library involved."""

from __future__ import annotations

import datetime
import zipfile

from pyspark.sql import types as T

from harvester_database_and_automation_spark.sources.excel import read_xlsx

_SST = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="7" uniqueCount="7">
<si><t>id</t></si><si><t>name</t></si><si><t>score</t></si><si><t>when</t></si>
<si><t>ok</t></si><si><r><t>al</t></r><r><t>ice</t></r></si><si><t>bob</t></si>
</sst>"""

# Row 1: header (shared strings 0-4). Data rows mix shared strings, inline
# strings, numerics, serial dates, booleans, a missing cell (B4) and an
# unparseable int (A5, t="str").
_SHEET = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheetData>
<row r="1">
 <c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c>
 <c r="D1" t="s"><v>3</v></c><c r="E1" t="s"><v>4</v></c>
</row>
<row r="2">
 <c r="A2"><v>1</v></c><c r="B2" t="s"><v>5</v></c><c r="C2"><v>9.5</v></c>
 <c r="D2"><v>44197</v></c><c r="E2" t="b"><v>1</v></c>
</row>
<row r="3">
 <c r="A3"><v>2</v></c><c r="B3" t="s"><v>6</v></c><c r="C3"><v>7</v></c>
 <c r="D3"><v>44198.5</v></c><c r="E3" t="b"><v>0</v></c>
</row>
<row r="4">
 <c r="A4"><v>3</v></c><c r="C4"><v>1.25</v></c>
 <c r="D4"><v>44200</v></c><c r="E4" t="b"><v>1</v></c>
</row>
<row r="5">
 <c r="A5" t="str"><v>abc</v></c><c r="B5" t="inlineStr"><is><t>carol</t></is></c>
 <c r="C5"><v>3</v></c><c r="D5"><v>44300</v></c><c r="E5" t="b"><v>0</v></c>
</row>
</sheetData>
</worksheet>"""

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("when", T.DateType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("absent", T.StringType()),  # not in the workbook
    ]
)


def _write_xlsx(path: str) -> None:
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("xl/sharedStrings.xml", _SST)
        zf.writestr("xl/worksheets/sheet1.xml", _SHEET)


def test_read_xlsx_typed(spark, tmp_path):
    path = str(tmp_path / "wb.xlsx")
    _write_xlsx(path)
    df = read_xlsx(spark, path, SCHEMA, chunk_rows=2)  # 4 rows -> 2 chunks
    rows = {r["id"]: r for r in df.collect()}
    assert df.count() == 4 and set(rows) == {1, 2, 3, None}
    assert rows[1]["name"] == "alice"  # rich-text runs concatenated
    assert rows[1]["when"] == datetime.date(2021, 1, 1)  # serial date
    assert rows[2]["when"] == datetime.date(2021, 1, 2)  # fractional serial
    assert rows[2]["ok"] is False
    assert rows[3]["name"] is None  # missing cell -> null
    assert rows[None]["name"] == "carol"  # inlineStr; bad int -> null
    assert all(r["absent"] is None for r in rows.values())
    assert df.schema == SCHEMA


def test_read_xlsx_headerless_positional(spark, tmp_path):
    path = str(tmp_path / "wb.xlsx")
    _write_xlsx(path)
    schema = T.StructType([T.StructField("a", T.StringType()), T.StructField("b", T.StringType())])
    df = read_xlsx(spark, path, schema, header=False)
    first = df.collect()[0]
    assert (first["a"], first["b"]) == ("id", "name")  # header row read as data


def test_read_xlsx_empty_sheet(spark, tmp_path):
    path = str(tmp_path / "wb.xlsx")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr(
            "xl/worksheets/sheet1.xml",
            '<?xml version="1.0"?><worksheet xmlns='
            '"http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            "<sheetData/></worksheet>",
        )
    df = read_xlsx(spark, path, SCHEMA)
    assert df.count() == 0 and df.schema == SCHEMA


def test_read_xlsx_rejects_unsupported_dtype(spark, tmp_path):
    import pytest as _pytest
    from pyspark.sql import types as T

    from harvester_database_and_automation_spark.sources.excel import read_xlsx

    schema = T.StructType([T.StructField("price", T.DecimalType(10, 2))])
    with _pytest.raises(ValueError, match="unsupported"):
        read_xlsx(spark, "/nonexistent.xlsx", schema)
