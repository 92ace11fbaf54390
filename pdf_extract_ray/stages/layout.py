"""PDF-style layout analysis over span/line tables (the faithful M1-M5 path).

The sandbox has no PDF renderer, so the input to this stage is a table of
raw text lines with geometry + style, one row per line:
``(url, page_no, x0, y0, x1, y1, text, size, flags, color)`` — exactly the
information the reference pulls out of PyMuPDF spans
(reference: euaa_사례/pdf_to_json/layout_analyzer.py:73-100).

Rules re-implemented (not copied) from layout_analyzer.py:

* header/footer strip: drop lines fully above the top ``header_margin_ratio``
  or below the bottom ``footer_margin_ratio`` of the page height (:34-55);
* two-column reading order: lines left of the page midline, sorted by y0,
  then lines right of it, sorted by y0 (:57-66);
* whitespace collapse per line (:88);
* style tagging (:119-144): body size = modal rounded size (deterministic
  tie-break: on equal counts the size seen FIRST in reading order wins,
  replicating Counter.most_common insertion-order behavior — SURVEY §7.4.1);
  H1 if size >= 1.5x body and bold; H3 if bold and color in H3_COLORS;
  H2 if bold; else P.  Bold = flags & 16, italic = flags & 2.
"""

from __future__ import annotations

from collections import Counter

from pdf_extract_ray.config import DEFAULT_CONFIG, ExtractConfig
from pdf_extract_ray.functions.text import collapse_ws
from pdf_extract_ray.stages.html_parser import Block


def tag_page_lines(
    lines: list[dict],
    page_width: float,
    page_height: float,
    page_no: int,
    cfg: ExtractConfig = DEFAULT_CONFIG,
) -> list[Block]:
    """Tag one page worth of raw lines; returns blocks in reading order.

    ``lines``: dicts with keys x0,y0,x1,y1,text,size,flags,color.
    """
    header_b = page_height * cfg.header_margin_ratio
    footer_b = page_height * (1 - cfg.footer_margin_ratio)
    kept = [
        l for l in lines
        if not (l["y1"] < header_b or l["y0"] > footer_b)
    ]

    mid = page_width / 2
    left = sorted((l for l in kept if l["x0"] < mid), key=lambda l: l["y0"])
    right = sorted((l for l in kept if l["x0"] >= mid), key=lambda l: l["y0"])
    ordered = left + right

    cleaned = []
    for l in ordered:
        text = collapse_ws(str(l["text"]))
        if text:
            cleaned.append((l, text))
    if not cleaned:
        return []

    # modal body size; Counter preserves insertion order so ties resolve to
    # the earliest-seen size — frozen as the deterministic rule
    body_size = Counter(round(l["size"]) for l, _ in cleaned).most_common(1)[0][0]

    h3_colors = set(cfg.h3_colors)
    out: list[Block] = []
    for i, (l, text) in enumerate(cleaned):
        bold = bool(int(l["flags"]) & cfg.bold_flag)
        if l["size"] >= body_size * cfg.h1_size_multiplier and bold:
            tag = "H1"
        elif bold and int(l["color"]) in h3_colors:
            tag = "H3"
        elif bold:
            tag = "H2"
        else:
            tag = "P"
        out.append(Block(page_no, i, tag, text, bold))
    return out
