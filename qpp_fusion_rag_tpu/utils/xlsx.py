"""Minimal dependency-free .xlsx writer (stdlib zipfile + XML).

The reference's stage 09 emits an Excel report via pandas/openpyxl
(reference scripts/09_eval_rankers.py:585, generate_excel_report);
neither library ships in this environment, and an .xlsx file is just a
zip of OOXML parts — so this module writes the workbook directly:
one or more sheets of rows, strings as inline strings, numbers as
numeric cells. Readable by Excel/LibreOffice/pandas.
"""

from __future__ import annotations

import zipfile
from numbers import Number
from pathlib import Path
from typing import Dict, Iterable, List, Sequence
import math
import re
from xml.sax.saxutils import escape, quoteattr

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{sheets}</Types>"""

_SHEET_CT = ('<Override PartName="/xl/worksheets/sheet{i}.xml" ContentType='
             '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
             'worksheet+xml"/>')

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
{rels}</Relationships>"""

_WB = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets>{sheets}</sheets></workbook>"""


def _col_name(idx: int) -> str:
    """0-based column index -> A, B, ..., Z, AA, ..."""
    name = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        name = chr(ord("A") + rem) + name
    return name


_XML_INVALID = re.compile(
    "[^\x09\x0a\x0d\x20-\ud7ff\ue000-\ufffd]")


def _sheet_name(name: str) -> str:
    """Excel sheet-name rules: <= 31 chars, no []:*?/\\ (replaced with
    '_'); the XML attribute itself is emitted with quoteattr (escape()
    leaves double quotes intact and would break name="...")."""
    clean = re.sub(r"[\[\]:*?/\\]", "_", name)[:31]
    return clean or "Sheet"


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, Number):
        # float() normalizes numpy scalars (repr would emit
        # 'np.float64(0.5)' under numpy 2); NaN/inf have no numeric-cell
        # representation in OOXML — write them as inline strings
        v = float(value)
        if math.isfinite(v):
            # take the integer-literal branch only within the float53
            # exactly-representable range: 1e300 as a 301-digit literal
            # exceeds Excel's 15-digit numeric precision and breaks
            # stricter OOXML readers
            iv = int(v) if abs(v) < 2.0 ** 53 else None
            return (f'<c r="{ref}"><v>{iv if iv == v else v!r}</v></c>')
        value = str(v)
    # XML 1.0 forbids most control chars outright (escape() keeps them)
    text = escape(_XML_INVALID.sub("", str(value)))
    return f'<c r="{ref}" t="inlineStr"><is><t>{text}</t></is></c>'


def _sheet_xml(rows: Iterable[Sequence]) -> str:
    parts: List[str] = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>',
    ]
    for ri, row in enumerate(rows, start=1):
        cells = "".join(
            _cell_xml(f"{_col_name(ci)}{ri}", v) for ci, v in enumerate(row)
        )
        parts.append(f'<row r="{ri}">{cells}</row>')
    parts.append("</sheetData></worksheet>")
    return "".join(parts)


def write_xlsx(path, sheets: Dict[str, Iterable[Sequence]]) -> Path:
    """Write {sheet name: rows} to an .xlsx file; returns the path.

    Rows are sequences of cells — numbers become numeric cells, anything
    else becomes an inline string, None leaves the cell blank.
    """
    path = Path(path)
    names = list(sheets)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES.format(
            sheets="".join(_SHEET_CT.format(i=i + 1) for i in range(len(names)))
        ))
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS.format(rels="".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxml'
            f'formats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )))
        z.writestr("xl/workbook.xml", _WB.format(sheets="".join(
            f'<sheet name={quoteattr(_sheet_name(n))} sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, n in enumerate(names)
        )))
        for i, n in enumerate(names):
            z.writestr(f"xl/worksheets/sheet{i + 1}.xml", _sheet_xml(sheets[n]))
    return path
