"""Excel (.xlsx) source (SURVEY §2.1 S6, S7, S8, S10; §2.3 P7).

Reference: pyexcel/openpyxl records iterator with sheet_name + skip_rows
config and Excel-serial date conversion (reference read/excel.py:86-175).

This container has no Excel library, so the reader is a minimal stdlib
xlsx parser (zipfile + xml.etree — xlsx is zipped SpreadsheetML): shared
strings, inline strings, numbers, booleans; sheet selection by name. Values
surface as raw strings (numeric cells keep their XML text form, so Excel
date *serials* stay intact for the ``excel_serial`` cast in the validator —
reference excel.py:44-84).

Scale: Excel files are driver-parsed then parallelized via
``spark.createDataFrame`` — same as the reference (whole-file read) and the
SURVEY §7.3 verdict: no good JVM-free distributed option; Excel files are
small by construction (xlsx hard row limit 1,048,576).
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from etl_file_loader_spark.config import SourceConfig
from etl_file_loader_spark.exceptions import MissingHeaderError, NoDataInFileError
from etl_file_loader_spark.operators.validate import FILE_ROW_COL
from etl_file_loader_spark.sources.base import check_required_columns

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"


def _cell_col_index(ref: str) -> int:
    """'C7' -> 2 (0-based column index)."""
    letters = re.match(r"[A-Z]+", ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


# builtin numFmtIds that render as dates/times (ECMA-376 §18.8.30)
_DATE_FMT_IDS = frozenset(range(14, 23)) | frozenset(range(27, 37)) | frozenset(range(45, 48))


def _date_styles(z: zipfile.ZipFile) -> frozenset[int]:
    """Indices into cellXfs whose number format renders as a date/time.

    Covers the builtin date formats plus custom formats whose code keeps a
    date token (y/m/d/h/s) after stripping quoted literals and [] sections —
    the same heuristic openpyxl's is_date_format uses. Real-world "formatted
    date" cells store a float serial + one of these styles (reference's
    pyexcel/openpyxl path converts them implicitly; read/excel.py:86-175).
    """
    try:
        root = ET.fromstring(z.read("xl/styles.xml"))
    except KeyError:
        return frozenset()
    custom = {
        int(nf.get("numFmtId")): nf.get("formatCode") or ""
        for nf in root.iter(f"{_NS}numFmt")
    }

    def is_date(fid: int) -> bool:
        if fid in _DATE_FMT_IDS:
            return True
        code = custom.get(fid, "")
        code = re.sub(r'"[^"]*"', "", code)
        code = re.sub(r"\[[^\]]*\]", "", code)
        return bool(re.search(r"[ymdhs]", code, re.IGNORECASE))

    cellxfs = root.find(f"{_NS}cellXfs")
    if cellxfs is None:
        return frozenset()
    return frozenset(
        i
        for i, xf in enumerate(cellxfs.findall(f"{_NS}xf"))
        if is_date(int(xf.get("numFmtId", "0")))
    )


def _serial_to_iso(raw: str) -> str:
    """Date-formatted serial -> ISO text ('2024-01-05' / '2024-01-05 12:30:00').

    Same epoch + floored-seconds arithmetic as the validator's
    ``excel_serial_to_timestamp`` (functions/__init__.py), so a date-typed
    field parses to the identical instant whether the cell carried a style
    (converted here) or not (converted in the validator)."""
    import datetime as _dt
    import math

    d = float(raw)
    days = math.floor(d)
    secs = math.floor((d - days) * 86400)
    base = _dt.datetime(1899, 12, 30) + _dt.timedelta(days=days, seconds=secs)
    if secs == 0:
        return base.date().isoformat()
    return base.isoformat(sep=" ")


def _shared_strings(z: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(z.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    out = []
    for si in root.iter(f"{_NS}si"):
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _sheet_path(z: zipfile.ZipFile, sheet_name: str | None) -> str:
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    rel_map = {
        r.get("Id"): r.get("Target")
        for r in rels.iter("{http://schemas.openxmlformats.org/package/2006/relationships}Relationship")
    }
    sheets = list(wb.iter(f"{_NS}sheet"))
    if not sheets:
        raise NoDataInFileError("workbook has no sheets")
    chosen = None
    if sheet_name is None:
        chosen = sheets[0]
    else:
        for s in sheets:
            if s.get("name") == sheet_name:
                chosen = s
                break
        if chosen is None:
            raise NoDataInFileError(f"sheet '{sheet_name}' not found")
    target = rel_map[chosen.get(f"{_REL_NS}id")]
    return target if target.startswith("xl/") else f"xl/{target}"


def read_excel_rows(
    path, sheet_name: str | None
) -> list[tuple[int, dict[int, str]]]:
    """Parse the sheet to [(excel_row_number, {col_index: raw_string_value})].

    ``path`` is a local filename or an already-opened binary file object
    (the Hadoop-FS URI case — xlsx archives need random access, so remote
    objects are fetched to memory first)."""
    with zipfile.ZipFile(path) as z:
        strings = _shared_strings(z)
        date_styles = _date_styles(z)
        sheet = ET.fromstring(z.read(_sheet_path(z, sheet_name)))
        rows: list[tuple[int, dict[int, str]]] = []
        for row in sheet.iter(f"{_NS}row"):
            rnum = int(row.get("r", len(rows) + 1))
            values: dict[int, str] = {}
            for c in row.iter(f"{_NS}c"):
                ref = c.get("r")
                ci = _cell_col_index(ref) if ref else len(values)
                ctype = c.get("t", "n")
                if ctype == "inlineStr":
                    is_el = c.find(f"{_NS}is")
                    v = "".join(t.text or "" for t in is_el.iter(f"{_NS}t")) if is_el is not None else ""
                else:
                    # formula cells (plain, shared, or array <f>) carry their
                    # cached result in <v> — read it like openpyxl's
                    # data_only=True; a formula with no cached value surfaces
                    # as an empty cell (nothing to evaluate it with)
                    v_el = c.find(f"{_NS}v")
                    if v_el is None or v_el.text is None:
                        continue
                    v = v_el.text
                    if ctype == "s":
                        v = strings[int(v)]
                    elif ctype == "b":
                        v = "true" if v == "1" else "false"
                    elif ctype == "n" and int(c.get("s", "-1")) in date_styles:
                        # date-formatted numeric: render the serial as ISO
                        # text (what the reference's openpyxl path yields)
                        try:
                            v = _serial_to_iso(v)
                        except ValueError:
                            pass
                values[ci] = v
            rows.append((rnum, values))
    return rows


def read_excel(spark: SparkSession, path: str, config: SourceConfig) -> DataFrame:
    from etl_file_loader_spark.fs import is_uri, open_bytes

    src = open_bytes(spark, path) if is_uri(path) else path
    rows = read_excel_rows(src, config.sheet_name)
    if not rows:
        raise MissingHeaderError("sheet is empty", path)
    header_row = rows[0][1]
    if not header_row or not any(v.strip() for v in header_row.values()):
        raise MissingHeaderError("missing or blank header row", path)
    ncols = max(header_row) + 1
    headers = [header_row.get(i, "").strip() or f"_c{i}" for i in range(ncols)]
    check_required_columns(headers, config, path)

    data = [
        (rnum, vals)
        for rnum, vals in rows[1:]
        if rnum >= 2 + config.skip_rows
    ]
    if not data:
        raise NoDataInFileError("no data rows after header/skip_rows", path)

    records = [
        tuple(vals.get(i) for i in range(ncols)) + (rnum,)
        for rnum, vals in data
    ]
    schema = T.StructType(
        [T.StructField(h, T.StringType()) for h in headers]
        + [T.StructField(FILE_ROW_COL, T.LongType())]
    )
    return spark.createDataFrame(records, schema)
