"""S5 — chunked Excel (.xlsx) reader (SURVEY.md §2.1).

The reference reads the BAG meldeformular workbook in 10k-row chunks with
per-column type coercion (database/R/import_bag_meldeformular.R:128-169).
No Excel library ships in this environment, and none is needed: an .xlsx
file is a zip of XML parts. This reader walks the sheet XML with a
streaming parser (``iterparse``) on the driver, resolves shared strings,
converts Excel serial dates, coerces each column to the declared schema
(coercion failure → null, the ``enforce_sql_spec`` contract of
database/R/utility.R:755-814), and hands Spark one ``createDataFrame`` per
chunk.

Scale note: workbooks are a small-dim ingest format (case-report forms,
plate layouts) — parsing on the driver in bounded chunks is the right
shape. Bulk data arrives as CSV/JSON/parquet through the S2/S4 readers.
"""

from __future__ import annotations

import datetime as _dt
import io
import zipfile
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
# Excel day 0 (with the historic 1900 leap-year bug already folded in).
_EPOCH = _dt.datetime(1899, 12, 30)


def _col_index(cell_ref: str) -> int:
    """'A1' -> 0, 'AB7' -> 27."""
    idx = 0
    for ch in cell_ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    strings: list[str] = []
    for _, el in ET.iterparse(io.BytesIO(data)):
        if el.tag == f"{_NS}si":
            strings.append("".join(t.text or "" for t in el.iter(f"{_NS}t")))
            el.clear()
    return strings


def _iter_rows(zf: zipfile.ZipFile, sheet: int, shared: list[str]):
    """Yield rows as {col_index: raw_value} dicts; raw values are str,
    float, or bool."""
    with zf.open(f"xl/worksheets/sheet{sheet}.xml") as fh:
        for _, el in ET.iterparse(fh):
            if el.tag != f"{_NS}row":
                continue
            row: dict[int, object] = {}
            next_idx = 0  # implied position when a cell omits its r= ref
            for cell in el.iter(f"{_NS}c"):
                ref = cell.get("r", "")
                # The OOXML r attribute is optional; position is implied by
                # document order when absent. Without this, every ref-less
                # cell would land on index -1 and overwrite its siblings.
                idx = _col_index(ref) if ref else next_idx
                next_idx = idx + 1
                ctype = cell.get("t", "n")
                if ctype == "inlineStr":
                    value = "".join(t.text or "" for t in cell.iter(f"{_NS}t"))
                else:
                    v = cell.find(f"{_NS}v")
                    if v is None or v.text is None:
                        continue
                    if ctype == "s":
                        value = shared[int(v.text)]
                    elif ctype == "b":
                        value = v.text == "1"
                    elif ctype == "str":
                        value = v.text
                    else:  # numeric
                        value = float(v.text)
                row[idx] = value
            el.clear()
            yield row


def _coerce(value, dtype: T.DataType):
    """Schema-driven coercion; failures become null (reject-to-null, the
    R importer's per-column type enforcement)."""
    if value is None:
        return None
    try:
        if isinstance(dtype, T.StringType):
            if isinstance(value, float):
                return str(int(value)) if value == int(value) else str(value)
            if isinstance(value, bool):
                return str(value).lower()
            return str(value)
        if isinstance(dtype, (T.IntegerType, T.LongType)):
            return int(float(value))
        if isinstance(dtype, (T.DoubleType, T.FloatType)):
            return float(value)
        if isinstance(dtype, T.BooleanType):
            if isinstance(value, bool):
                return value
            if isinstance(value, float):
                return value != 0.0
            return value.strip().lower() in ("true", "1", "yes", "ja")
        if isinstance(dtype, T.DateType):
            if isinstance(value, float):
                return (_EPOCH + _dt.timedelta(days=value)).date()
            return _dt.date.fromisoformat(str(value).strip())
        if isinstance(dtype, T.TimestampNTZType) or isinstance(dtype, T.TimestampType):
            if isinstance(value, float):
                return _EPOCH + _dt.timedelta(days=value)
            return _dt.datetime.fromisoformat(str(value).strip())
    except (ValueError, TypeError):
        return None
    return None


def read_xlsx(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    sheet: int = 1,
    header: bool = True,
    chunk_rows: int = 10_000,
) -> DataFrame:
    """Read one worksheet into a typed DataFrame.

    Unsupported schema dtypes raise immediately (a silent reject-to-null
    of a whole column would be indistinguishable from missing data).

    With ``header=True`` the first row maps workbook columns to schema
    fields by NAME (extra workbook columns are dropped, schema fields
    missing from the workbook are null) — the reference selects its
    expected columns the same way. ``chunk_rows`` bounds each
    ``createDataFrame`` hand-off (the 10k-row chunk contract,
    import_bag_meldeformular.R:144).
    """
    fields = schema.fields
    supported = (
        T.StringType, T.IntegerType, T.LongType, T.DoubleType, T.FloatType,
        T.BooleanType, T.DateType, T.TimestampNTZType, T.TimestampType,
    )
    bad = [f"{f.name}: {f.dataType}" for f in fields if not isinstance(f.dataType, supported)]
    if bad:
        raise ValueError(f"unsupported xlsx schema dtypes (would silently null): {bad}")
    chunks: list[DataFrame] = []
    buf: list[tuple] = []

    def flush():
        nonlocal buf
        if buf:
            chunks.append(spark.createDataFrame(buf, schema))
            buf = []

    with zipfile.ZipFile(path) as zf:
        shared = _shared_strings(zf)
        rows = _iter_rows(zf, sheet, shared)
        if header:
            try:
                head = next(rows)
            except StopIteration:
                return spark.createDataFrame([], schema)
            name_to_col = {str(v).strip(): i for i, v in head.items()}
            field_cols = [name_to_col.get(f.name) for f in fields]
        else:
            field_cols = list(range(len(fields)))
        for raw in rows:
            buf.append(
                tuple(
                    _coerce(raw.get(c) if c is not None else None, f.dataType)
                    for c, f in zip(field_cols, fields)
                )
            )
            if len(buf) >= chunk_rows:
                flush()
    flush()
    if not chunks:
        return spark.createDataFrame([], schema)
    out = chunks[0]
    for c in chunks[1:]:
        out = out.union(c)
    return out
