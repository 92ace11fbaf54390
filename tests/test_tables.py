"""HTML table extraction (stages/tables.py): structure, cleaning,
header flags, nested-table frozen rule, byte decode (the `html_tables`
driver query adds the independent SQL-oracle check)."""

import pandas as pd

from pdf_extract_ray.stages.tables import extract_tables_batch


def _page(html, url="http://h.example/p"):
    return pd.DataFrame({"url": [url], "html": [html]})


def test_basic_structure_and_headers():
    out = extract_tables_batch(_page(
        "<table><tr><th>K</th><th>V</th></tr>"
        "<tr><td>a</td><td>1</td></tr></table>"
        "<table><tr><td>solo</td></tr></table>"))
    assert list(out.table_no) == [0, 0, 0, 0, 1]
    assert list(out.row_no) == [0, 0, 1, 1, 0]
    assert list(out.col_no) == [0, 1, 0, 1, 0]
    assert list(out.cell) == ["K", "V", "a", "1", "solo"]
    assert list(out.is_header) == [True, True, False, False, False]


def test_cell_cleaning_and_empty_cells():
    out = extract_tables_batch(_page(
        '<table><tr><td><b>bold</b>\n  text</td>'
        "<td>&amp; ent</td><td></td></tr></table>"))
    assert list(out.cell) == ["bold text", "& ent", ""]


def test_rowless_text_and_no_cells_row():
    out = extract_tables_batch(_page(
        "<table>caption text<tr>no cells here</tr>"
        "<tr><td>x</td></tr></table>"))
    assert list(out.cell) == ["x"]
    assert list(out.row_no) == [0]


def test_nested_table_frozen_rule():
    # inner </table> ends the outer region: only cells before it emit
    out = extract_tables_batch(_page(
        "<table><tr><td>outer</td></tr>"
        "<table><tr><td>inner</td></tr></table>"
        "<tr><td>after</td></tr></table>"))
    assert list(out.cell) == ["outer", "inner"]
    assert list(out.table_no) == [0, 0]


def test_bytes_and_null():
    page = "<table><tr><td>b</td></tr></table>"
    out = extract_tables_batch(_page(page.encode("utf-8")))
    assert list(out.cell) == ["b"]
    assert len(extract_tables_batch(
        pd.DataFrame({"url": ["u"], "html": [None]}))) == 0
