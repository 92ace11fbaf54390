"""HTML table extraction — structured ``(url, table_no, row_no, col_no,
cell, is_header)`` rows from crawled pages (web tables are a first-class
training-data source; the reference's span-table layout path covers PDF
tables, this covers the DOM side).

Frozen rules:
* a table region runs from ``<table ...>`` to the FIRST ``</table>``
  (nested tables are not reconstructed — the inner close ends the outer
  region; real pipelines treat nested layout tables as noise);
* rows split on ``<tr``; cells are ``<td``/``<th`` runs ending at the
  next cell, row close, or region end;
* cell text: inner tags stripped, entities unescaped AFTER the strip,
  whitespace collapsed, trimmed (identical cleaning to anchor text);
* empty rows are dropped; empty cells are kept (they carry position);
* indices are 0-based per page / table / row.

Scale shape: one narrow batch explode (per-document regex scan — the
parse cost class); no shuffle.  Bytes decode via the shared charset
sniffing rules.
"""

from __future__ import annotations

import re

import pandas as pd
from ray.data import Dataset

from pdf_extract_ray.functions.text import clean_markup_text as _clean

_TABLE_RE = re.compile(r"<table\b[^>]*>(.*?)</table\s*>",
                       re.IGNORECASE | re.DOTALL)
_ROW_SPLIT_RE = re.compile(r"<tr\b[^>]*>", re.IGNORECASE)
_CELL_RE = re.compile(
    r"<(t[dh])\b[^>]*>(.*?)(?=<t[dh]\b|</tr\b|</table\b|$)",
    re.IGNORECASE | re.DOTALL,
)

def extract_tables_batch(
    batch: pd.DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> pd.DataFrame:
    from pdf_extract_ray.functions.encoding import decode_html_bytes

    urls: list[str] = []
    t_no: list[int] = []
    r_no: list[int] = []
    c_no: list[int] = []
    cells: list[str] = []
    is_h: list[bool] = []
    for url, html in zip(batch[url_col], batch[html_col]):
        if html is None:
            continue
        if isinstance(html, (bytes, bytearray)):
            html = decode_html_bytes(bytes(html))[0]
        for ti, tm in enumerate(_TABLE_RE.finditer(html)):
            ri = 0
            for chunk in _ROW_SPLIT_RE.split(tm.group(1))[1:]:
                row_cells = _CELL_RE.findall(chunk)
                if not row_cells:
                    continue
                for ci, (tag, raw) in enumerate(row_cells):
                    urls.append(url)
                    t_no.append(ti)
                    r_no.append(ri)
                    c_no.append(ci)
                    cells.append(_clean(raw))
                    is_h.append(tag.lower() == "th")
                ri += 1
    return pd.DataFrame({
        "url": urls,
        "table_no": pd.Series(t_no, dtype="int32"),
        "row_no": pd.Series(r_no, dtype="int32"),
        "col_no": pd.Series(c_no, dtype="int32"),
        "cell": cells,
        "is_header": pd.Series(is_h, dtype=bool),
    })


def extract_tables(ds: Dataset, html_col: str = "html",
                   url_col: str = "url") -> Dataset:
    """Dataset-level table explode: one narrow map, no shuffle."""
    return ds.map_batches(
        lambda b: extract_tables_batch(b, html_col, url_col),
        batch_format="pandas",
    )
