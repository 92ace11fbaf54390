"""Minimal from-scratch XLSX reader/writer (S8: the reference's two-sheet
Excel IO — metadata_generator.py:636-679 writes 'Text_Analyzed_Filtered' /
'Table_Filtered' sheets, add_metadata.py reads them back).

The sandbox has no openpyxl; an .xlsx file is just a ZIP of small XML
parts, so this implements the subset the pipelines need with stdlib
``zipfile`` + ``xml.etree``:

* ``write_xlsx(path, {"Sheet": df, ...})`` — inline strings, numbers and
  booleans; one worksheet per dict entry, first row = column headers.
  Deterministic byte output (fixed timestamps, sorted parts) so written
  artifacts are diffable/hashable across runs.
* ``read_xlsx(path) -> {"Sheet": df, ...}`` — shared-string and
  inline-string cells, numeric/boolean types, header row -> columns.
  Reads its own files and ordinary openpyxl/Excel output.

Not supported (out of scope for the reference's usage): formulas, styles,
dates-as-serials, merged cells.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

import pandas as pd

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_INVALID_XML_RE = re.compile(
    "[^\x09\x0a\x0d\x20-\uD7FF\uE000-\uFFFD\U00010000-\U0010FFFF]")


def _col_name(i: int) -> str:
    """0-based column index -> A1-style letters."""
    out = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        out = chr(65 + r) + out
    return out


def _cell_xml(col: str, row: int, value) -> str:
    ref = f"{col}{row}"
    # box numpy scalars (np.int64 / np.float64 / np.bool_) to Python
    # scalars: they are not Python int/bool, and numpy>=2 repr()s floats
    # as 'np.float64(x)' — either would silently fall through to the
    # inline-string branch or emit invalid numeric cells
    if hasattr(value, "item") and not isinstance(value, (str, bytes)):
        value = value.item()
    if value is None or (isinstance(value, float) and value != value):
        return f'<c r="{ref}"/>'
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    # carriage returns must be character-referenced: XML parsers normalize
    # literal \r (and \r\n) in content to \n on read
    s = escape(_INVALID_XML_RE.sub("�", str(value))).replace("\r", "&#13;")
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{s}</t></is></c>'


def write_xlsx(path: str, sheets: dict[str, pd.DataFrame]) -> None:
    """Write ``sheets`` (name -> DataFrame) as an .xlsx file.  Inline
    strings keep the writer single-pass and the output deterministic."""
    if not sheets:
        raise ValueError("write_xlsx needs at least one sheet")
    names = list(sheets)

    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            for i in range(len(names))
        )
        + "</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>'
        + "".join(
            # escape() alone leaves double quotes intact, which would break
            # the name="..." attribute
            f'<sheet name="{escape(n, {chr(34): "&quot;"})}" '
            f'sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, n in enumerate(names)
        )
        + "</sheets></workbook>"
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

    def sheet_xml(df: pd.DataFrame) -> str:
        rows = ['<row r="1">' + "".join(
            _cell_xml(_col_name(c), 1, str(col))
            for c, col in enumerate(df.columns)) + "</row>"]
        for r, rec in enumerate(df.itertuples(index=False), start=2):
            rows.append(
                f'<row r="{r}">' + "".join(
                    _cell_xml(_col_name(c), r, v) for c, v in enumerate(rec))
                + "</row>")
        return (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            "<sheetData>" + "".join(rows) + "</sheetData></worksheet>"
        )

    # fixed timestamp -> deterministic bytes for identical input
    zinfo = lambda name: zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(zinfo("[Content_Types].xml"), content_types)
        z.writestr(zinfo("_rels/.rels"), root_rels)
        z.writestr(zinfo("xl/workbook.xml"), workbook)
        z.writestr(zinfo("xl/_rels/workbook.xml.rels"), wb_rels)
        for i, n in enumerate(names):
            z.writestr(zinfo(f"xl/worksheets/sheet{i + 1}.xml"),
                       sheet_xml(sheets[n]))


def _cell_value(cell, shared: list[str]):
    t = cell.get("t", "n")
    if t == "inlineStr":
        parts = [el.text or "" for el in cell.iter(f"{_NS}t")]
        return "".join(parts)
    v = cell.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return v.text == "1"
    if t == "str":
        return v.text
    if t == "e":  # Excel error cell (#N/A, #DIV/0!, ...) -> missing
        return None
    try:
        num = float(v.text)
    except ValueError:  # unknown cell type with non-numeric payload
        return v.text
    return int(num) if num.is_integer() and abs(num) < 2**53 else num


def read_xlsx(path: str) -> dict[str, pd.DataFrame]:
    """Read every worksheet into a DataFrame (row 1 = headers)."""
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rel_ns = "{http://schemas.openxmlformats.org/package/2006/relationships}"
        rid_to_target = {r.get("Id"): r.get("Target") for r in rels.iter(f"{rel_ns}Relationship")}
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            ss = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in ss.iter(f"{_NS}si"):
                shared.append("".join(el.text or "" for el in si.iter(f"{_NS}t")))
        out: dict[str, pd.DataFrame] = {}
        rid_attr = ("{http://schemas.openxmlformats.org/officeDocument/2006/"
                    "relationships}id")
        for sheet in wb.iter(f"{_NS}sheet"):
            target = rid_to_target[sheet.get(rid_attr)]
            if not target.startswith("/"):
                target = "xl/" + target
            ws = ET.fromstring(z.read(target.lstrip("/")))
            rows: list[dict[int, object]] = []
            for row in ws.iter(f"{_NS}row"):
                vals: dict[int, object] = {}
                for cell in row.iter(f"{_NS}c"):
                    ref = cell.get("r", "A1")
                    col_letters = "".join(ch for ch in ref if ch.isalpha())
                    ci = 0
                    for ch in col_letters:
                        ci = ci * 26 + (ord(ch.upper()) - 64)
                    vals[ci - 1] = _cell_value(cell, shared)
                rows.append(vals)
            if not rows:
                out[sheet.get("name")] = pd.DataFrame()
                continue
            width = max(max(r.keys(), default=-1) for r in rows) + 1
            header = [str(rows[0].get(i, f"col{i}")) for i in range(width)]
            data = [[r.get(i) for i in range(width)] for r in rows[1:]]
            out[sheet.get("name")] = pd.DataFrame(data, columns=header)
    return out


def write_two_sheet_report(path: str, text_df: pd.DataFrame,
                           table_df: pd.DataFrame) -> None:
    """The reference's exact two-sheet layout
    (metadata_generator.py:676-679)."""
    write_xlsx(path, {"Text_Analyzed_Filtered": text_df,
                      "Table_Filtered": table_df})
