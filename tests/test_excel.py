"""S3 Excel source — stdlib zip+XML codec (reference: pd.read_excel at
etl/etl.py:510-511). Covers the bytes decoder (shared strings, inline
strings, sparse cells, booleans, multi-sheet), the driver read path, and
the distributed binaryFile + mapInPandas path."""

from __future__ import annotations

import io
import zipfile

import pytest

from real_big_data_project_spark.sources import excel_source as X
from pyspark.sql import types as T


def _sheet_xml(rows_xml: str) -> bytes:
    return (
        '<?xml version="1.0"?><worksheet xmlns="http://schemas.'
        'openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
        + rows_xml + "</sheetData></worksheet>"
    ).encode()


def test_writer_reader_roundtrip(tmp_path):
    header = ["sym", "price", "active", "note"]
    rows = [
        ("AAPL", 189.5, True, "plain"),
        ("MC.PA", 700.0, False, "é&<>"),  # escaping + unicode
        ("GOOG", 3, True, None),          # int cell + missing trailing cell
    ]
    path = X.write_xlsx(str(tmp_path / "t.xlsx"), header, rows)
    got_header, got_rows = X.decode_xlsx_bytes(open(path, "rb").read())
    assert got_header == header
    assert got_rows[0] == ["AAPL", 189.5, True, "plain"]
    assert got_rows[1][3] == "é&<>"
    assert got_rows[2] == ["GOOG", 3.0, True, None]


def test_decoder_shared_strings_and_sparse_cells():
    """Files from real writers use sharedStrings and omit empty cells;
    the decoder must densify by cell ref (B2 with no A2 → col 1)."""
    shared = (
        '<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.'
        'org/spreadsheetml/2006/main" count="2" uniqueCount="2">'
        "<si><t>colA</t></si><si><r><t>two-</t></r><r><t>runs</t></r></si></sst>"
    ).encode()
    sheet = _sheet_xml(
        '<row r="1"><c r="A1" t="s"><v>0</v></c>'
        '<c r="B1" t="inlineStr"><is><t>colB</t></is></c></row>'
        '<row r="2"><c r="B2" t="s"><v>1</v></c></row>'
        '<row r="3"><c r="A3"><v>7.25</v></c><c r="B3" t="str"><v>fx</v></c></row>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("[Content_Types].xml", X._CONTENT_TYPES)
        zf.writestr("_rels/.rels", X._ROOT_RELS)
        zf.writestr("xl/workbook.xml", X._WORKBOOK)
        zf.writestr("xl/_rels/workbook.xml.rels", X._WORKBOOK_RELS)
        zf.writestr("xl/sharedStrings.xml", shared)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    header, rows = X.decode_xlsx_bytes(buf.getvalue())
    assert header == ["colA", "colB"]
    assert rows == [[None, "two-runs"], [7.25, "fx"]]


def test_decoder_unknown_sheet_raises(tmp_path):
    path = X.write_xlsx(str(tmp_path / "s.xlsx"), ["a"], [(1,)])
    with pytest.raises(ValueError, match="not found"):
        X.decode_xlsx_bytes(open(path, "rb").read(), sheet="Nope")
    # the one real sheet resolves by name too
    header, _ = X.decode_xlsx_bytes(open(path, "rb").read(), sheet="Sheet1")
    assert header == ["a"]


def test_read_excel_listing_driver_path(spark, tmp_path):
    path = X.write_xlsx(
        str(tmp_path / "listing.xlsx"),
        ["symbol", "last", "volume"],
        [("ABC", 10.5, 100), ("DEF", 20.0, 250)],
    )
    schema = T.StructType([
        T.StructField("symbol", T.StringType()),
        T.StructField("last", T.DoubleType()),
        T.StructField("volume", T.LongType()),
    ])
    df = X.read_excel_listing(spark, path, schema)
    got = {r["symbol"]: (r["last"], r["volume"]) for r in df.collect()}
    assert got == {"ABC": (10.5, 100), "DEF": (20.0, 250)}
    # schema-less → all strings, numbers rendered without trailing .0
    df2 = X.read_excel_listing(spark, path)
    assert [f.dataType for f in df2.schema.fields] == [T.StringType()] * 3
    assert {r["volume"] for r in df2.collect()} == {"100", "250"}


def test_read_excel_dir_distributed(spark, sf_dir):
    """The scale path: two xlsx parts of `nation` decoded executor-side
    must equal the parquet source exactly."""
    path = X.ensure_nation_xlsx(spark, sf_dir)
    df = X.read_excel_dir(spark, path, X.NATION_SCHEMA)
    from pyspark.sql import functions as F

    expected = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"),
        "n_name",
        F.col("n_regionkey").cast("long").alias("n_regionkey"),
    )
    assert df.schema == expected.schema
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, expected.collect()))


def test_missing_column_is_loud(spark, tmp_path):
    path = X.write_xlsx(str(tmp_path / "m.xlsx"), ["x"], [(1,)])
    schema = T.StructType([T.StructField("y", T.LongType())])
    with pytest.raises(ValueError, match="missing columns"):
        X.read_excel_listing(spark, path, schema)
