"""Robots-meta directive handling — the indexability gate a crawl
pipeline applies before extraction/link analysis (CCBot, like the major
crawlers, honors ``<meta name="robots">``).

Frozen parse rules:
* every ``<meta ...>`` tag is scanned; tags whose ``name`` attribute is
  ``robots`` (case-insensitive, trimmed) contribute directives;
* the ``content`` attribute splits on commas; tokens are trimmed and
  lowercased;
* ``noindex`` = token ``noindex`` or ``none`` present; ``nofollow`` =
  token ``nofollow`` or ``none`` present;
* multiple robots metas union restrictively (any tag can forbid);
* double-/single-/un-quoted attribute values are accepted, attribute
  order is free.

Scale shape: a narrow per-batch map (per-document regex scan — the same
inherent cost class as the HTML parse itself); the filter never
shuffles.  Bytes are decoded with the shared charset sniffing rules.
"""

from __future__ import annotations

import re

import pandas as pd
from ray.data import Dataset

_META_TAG_RE = re.compile(r"<meta\s[^>]*>", re.IGNORECASE | re.DOTALL)


def robots_directives(html: str) -> tuple[bool, bool]:
    """One document -> ``(noindex, nofollow)`` under the frozen rules."""
    from pdf_extract_ray.functions.markup import parse_tag_attrs

    noindex = nofollow = False
    for tag in _META_TAG_RE.findall(html):
        attrs = parse_tag_attrs(tag)
        if attrs.get("name", "").strip().lower() != "robots":
            continue
        tokens = {t.strip().lower()
                  for t in attrs.get("content", "").split(",")}
        if "noindex" in tokens or "none" in tokens:
            noindex = True
        if "nofollow" in tokens or "none" in tokens:
            nofollow = True
    return noindex, nofollow


def robots_directives_batch(
    batch: pd.DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> pd.DataFrame:
    """One batch of pages -> ``(url, noindex, nofollow)`` rows."""
    from pdf_extract_ray.functions.encoding import decode_html_bytes

    noindex: list[bool] = []
    nofollow: list[bool] = []
    for html in batch[html_col]:
        if html is None:
            noindex.append(False)
            nofollow.append(False)
            continue
        if isinstance(html, (bytes, bytearray)):
            html = decode_html_bytes(bytes(html))[0]
        ni, nf = robots_directives(html)
        noindex.append(ni)
        nofollow.append(nf)
    return pd.DataFrame({
        "url": batch[url_col].to_numpy(),
        "noindex": pd.Series(noindex, dtype=bool),
        "nofollow": pd.Series(nofollow, dtype=bool),
    })


def filter_indexable(ds: Dataset, html_col: str = "html") -> Dataset:
    """Drop ``noindex`` pages (narrow map, zero shuffles) — apply before
    extraction so forbidden pages never reach the corpus."""
    from pdf_extract_ray.functions.encoding import decode_html_bytes

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        mask = []
        for html in b[html_col]:
            if isinstance(html, (bytes, bytearray)):
                html = decode_html_bytes(bytes(html))[0]
            mask.append(not (html and robots_directives(html)[0]))
        return b[pd.Series(mask, index=b.index)]

    return ds.map_batches(keep, batch_format="pandas")


def host_link_edges_respecting_robots(
    ds: Dataset, html_col: str = "html", url_col: str = "url",
) -> Dataset:
    """Link graph that honors page-level ``nofollow``: pages whose robots
    meta forbids following contribute NO edges (filtered in the same
    narrow pass that extracts — no extra scan of the corpus)."""
    from pdf_extract_ray.functions.encoding import decode_html_bytes
    from pdf_extract_ray.stages.links import host_link_edges

    def follow_only(b: pd.DataFrame) -> pd.DataFrame:
        mask = []
        for html in b[html_col]:
            if isinstance(html, (bytes, bytearray)):
                html = decode_html_bytes(bytes(html))[0]
            mask.append(not (html and robots_directives(html)[1]))
        return b[pd.Series(mask, index=b.index)]

    return host_link_edges(
        ds.map_batches(follow_only, batch_format="pandas"),
        html_col, url_col)
