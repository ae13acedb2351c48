"""Minimal stdlib xlsx writer for test fixtures (inline strings + numbers,
date-styled serials, and [shared-]formula cells with cached values)."""

from __future__ import annotations

import zipfile


class DateCell:
    """Numeric serial carrying a date (style numFmtId=14) or datetime
    (numFmtId=22) number format — how Excel stores a formatted date."""

    def __init__(self, serial: float, with_time: bool = False):
        self.serial = serial
        self.with_time = with_time


class FormulaCell:
    """Formula with its cached result. ``shared_si`` makes it part of a
    shared-formula group: the master carries the formula text + ``ref``
    range; followers carry only <f t="shared" si="N"/>."""

    def __init__(
        self,
        cached,
        formula: str | None = None,
        shared_si: int | None = None,
        shared_ref: str | None = None,
    ):
        self.cached = cached
        self.formula = formula
        self.shared_si = shared_si
        self.shared_ref = shared_ref


_STYLES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<cellXfs count="3">
<xf numFmtId="0"/>
<xf numFmtId="14" applyNumberFormat="1"/>
<xf numFmtId="22" applyNumberFormat="1"/>
</cellXfs>
</styleSheet>"""

_CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{overrides}
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""


def _col_letter(i: int) -> str:
    out = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return ""
    if isinstance(value, DateCell):
        style = 2 if value.with_time else 1
        return f'<c r="{ref}" s="{style}"><v>{value.serial}</v></c>'
    if isinstance(value, FormulaCell):
        if value.shared_si is not None:
            if value.formula is not None:
                f = (
                    f'<f t="shared" si="{value.shared_si}" '
                    f'ref="{value.shared_ref}">{value.formula}</f>'
                )
            else:
                f = f'<f t="shared" si="{value.shared_si}"/>'
        else:
            f = f"<f>{value.formula}</f>"
        if value.cached is None:
            return f'<c r="{ref}">{f}</c>'
        if isinstance(value.cached, (int, float)) and not isinstance(value.cached, bool):
            return f'<c r="{ref}">{f}<v>{value.cached}</v></c>'
        return f'<c r="{ref}" t="str">{f}<v>{value.cached}</v></c>'
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{1 if value else 0}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value}</v></c>'
    text = (
        str(value)
        .replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
    )
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{text}</t></is></c>'


def write_xlsx(path: str, sheets: dict[str, list[list]]) -> str:
    """sheets: name -> rows; each row a list of values (None = empty cell)."""
    names = list(sheets)
    wb_sheets = "".join(
        f'<sheet name="{n}" sheetId="{i + 1}" r:id="rId{i + 1}"/>' for i, n in enumerate(names)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{wb_sheets}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        + "</Relationships>"
    )
    overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        for i in range(len(names))
    )
    overrides += (
        '<Override PartName="/xl/styles.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", _CT.format(overrides=overrides))
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/styles.xml", _STYLES)
        for i, name in enumerate(names):
            rows_xml = []
            for rnum, row in enumerate(sheets[name], start=1):
                cells = "".join(
                    _cell_xml(f"{_col_letter(ci)}{rnum}", v) for ci, v in enumerate(row)
                )
                rows_xml.append(f'<row r="{rnum}">{cells}</row>')
            sheet_xml = (
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
                f"<sheetData>{''.join(rows_xml)}</sheetData></worksheet>"
            )
            z.writestr(f"xl/worksheets/sheet{i + 1}.xml", sheet_xml)
    return path
