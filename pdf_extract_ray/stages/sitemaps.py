"""Sitemap parsing (sitemaps.org XML protocol, public spec) — the crawl
DISCOVERY primitive: robots.txt's ``Sitemap:`` lines point at XML files
listing a site's urls; a crawler diffs those against its frontier
(``stages/crawldiff`` + the Bloom frontier sketch) to find new pages
without re-crawling.

Frozen subset (documented so the SQL oracle can mirror it):

* a document is either a ``<urlset>`` (kind ``url``) or a
  ``<sitemapindex>`` (kind ``sitemap``) — detected by which container
  tag appears first; anything else parses as zero entries;
* entries are ``<url>``/``<sitemap>`` blocks' ``<loc>`` (required —
  blocks without one are skipped) and optional ``<lastmod>``;
* matching is namespace- and whitespace-tolerant (the spec's xmlns is
  ignored; tags match case-insensitively), total on garbage — a
  malformed tail yields the entries parsed so far, never an exception;
* ``<loc>`` values get the three XML entities the spec requires
  (&amp; &lt; &gt;) unescaped.

Scale shape: one narrow ``map_batches`` explode per sitemap blob —
embarrassingly parallel, zero shuffles; a sitemap index's children are
emitted as rows (kind ``sitemap``) for the caller's fetch loop, not
fetched here (no network in this engine)."""

from __future__ import annotations

import re

import pandas as pd
from ray.data import Dataset

_CONTAINER_RE = re.compile(r"<\s*(urlset|sitemapindex)\b", re.IGNORECASE)
_BLOCK_RE = re.compile(
    r"<\s*(url|sitemap)\s*>(.*?)</\s*\1\s*>",
    re.IGNORECASE | re.DOTALL)
_LOC_RE = re.compile(r"<\s*loc\s*>\s*(.*?)\s*</\s*loc\s*>",
                     re.IGNORECASE | re.DOTALL)
_LASTMOD_RE = re.compile(r"<\s*lastmod\s*>\s*(.*?)\s*</\s*lastmod\s*>",
                         re.IGNORECASE | re.DOTALL)


def _unescape(loc: str) -> str:
    return (loc.replace("&lt;", "<").replace("&gt;", ">")
            .replace("&amp;", "&"))  # &amp; LAST (spec order)


def parse_sitemap(xml: str | None) -> list[dict]:
    """``[{kind, loc, lastmod}]`` per the frozen subset; total."""
    if not xml:
        return []
    text = str(xml)
    m = _CONTAINER_RE.search(text)
    if m is None:
        return []
    kind = "url" if m.group(1).lower() == "urlset" else "sitemap"
    out = []
    for bm in _BLOCK_RE.finditer(text):
        if bm.group(1).lower() != ("url" if kind == "url" else "sitemap"):
            continue
        body = bm.group(2)
        loc = _LOC_RE.search(body)
        if not loc or not loc.group(1):
            continue
        lm = _LASTMOD_RE.search(body)
        out.append({"kind": kind, "loc": _unescape(loc.group(1)),
                    "lastmod": lm.group(1) if lm else None})
    return out


def extract_sitemap_entries(
    ds: Dataset,
    *,
    xml_col: str = "sitemap_xml",
    source_col: str | None = "sitemap_url",
) -> Dataset:
    """Narrow explode: one row per sitemap entry, carrying the source
    sitemap's identifier when ``source_col`` is present."""

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        rows = {"source": [], "kind": [], "loc": [], "lastmod": []}
        sources = (b[source_col] if source_col and source_col in b.columns
                   else pd.Series([""] * len(b), index=b.index))
        for src, xml in zip(sources, b[xml_col]):
            for e in parse_sitemap(xml):
                rows["source"].append("" if src is None else str(src))
                rows["kind"].append(e["kind"])
                rows["loc"].append(e["loc"])
                rows["lastmod"].append(e["lastmod"])
        # object dtype (None for missing), not pandas "string": the
        # StringDtype round-trips out of Ray as pd.NA, which string-casts
        # to '<NA>' instead of 'None' and breaks oracle value parity
        return pd.DataFrame({
            "source": pd.Series(rows["source"], dtype="object"),
            "kind": pd.Series(rows["kind"], dtype="object"),
            "loc": pd.Series(rows["loc"], dtype="object"),
            "lastmod": pd.Series(rows["lastmod"], dtype="object"),
        })

    return ds.map_batches(explode, batch_format="pandas")
