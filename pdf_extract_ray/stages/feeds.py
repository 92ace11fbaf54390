"""RSS 2.0 / Atom feed parsing (public specs: RSS 2.0, RFC 4287) — the
other crawl-DISCOVERY channel next to sitemaps (``stages/sitemaps``):
feeds surface NEW urls hours before sitemaps regenerate, so a freshness
crawler tails them to seed its frontier.

Frozen subset (documented so the SQL oracle can mirror it):

* a document is an RSS feed if ``<rss`` or ``<channel`` appears before
  ``<feed`` (kind ``rss``), an Atom feed if ``<feed`` appears first
  (kind ``atom``); anything else parses as zero entries;
* RSS entries are ``<item>`` blocks: ``<link>`` text (required — items
  without one are skipped), optional ``<title>`` text and ``<pubDate>``
  text (emitted as ``published``);
* Atom entries are ``<entry>`` blocks: ``<link ... href="...">``'s
  href attribute (required), optional ``<title>`` text and
  ``<updated>`` text (emitted as ``published``);
* matching is namespace-/case-/whitespace-tolerant and total on
  garbage — a malformed tail yields the entries parsed so far, never
  an exception;
* link/title values get the three required XML entities (&amp; &lt;
  &gt;) unescaped, &amp; last (spec order).

Scale shape: one narrow ``map_batches`` explode per feed blob —
embarrassingly parallel, zero shuffles; compose with
``sitemaps.stale_pages`` / ``crawldiff`` / the Bloom frontier probe for
the fetch decision.
"""

from __future__ import annotations

import re

import pandas as pd
from ray.data import Dataset

_KIND_RE = re.compile(r"<\s*(rss|channel|feed)\b", re.IGNORECASE)
_ITEM_RE = re.compile(r"<\s*item\s*>(.*?)</\s*item\s*>",
                      re.IGNORECASE | re.DOTALL)
_ENTRY_RE = re.compile(r"<\s*entry\s*>(.*?)</\s*entry\s*>",
                       re.IGNORECASE | re.DOTALL)
_LINK_TEXT_RE = re.compile(r"<\s*link\s*>\s*(.*?)\s*</\s*link\s*>",
                           re.IGNORECASE | re.DOTALL)
_LINK_HREF_RE = re.compile(
    r"<\s*link\b[^>]*\bhref\s*=\s*\"([^\"]*)\"", re.IGNORECASE)
_TITLE_RE = re.compile(r"<\s*title\s*>\s*(.*?)\s*</\s*title\s*>",
                       re.IGNORECASE | re.DOTALL)
_PUBDATE_RE = re.compile(r"<\s*pubDate\s*>\s*(.*?)\s*</\s*pubDate\s*>",
                         re.IGNORECASE | re.DOTALL)
_UPDATED_RE = re.compile(r"<\s*updated\s*>\s*(.*?)\s*</\s*updated\s*>",
                         re.IGNORECASE | re.DOTALL)


def _unescape(s: str) -> str:
    return (s.replace("&lt;", "<").replace("&gt;", ">")
            .replace("&amp;", "&"))  # &amp; LAST (spec order)


def parse_feed(xml: str | None) -> list[dict]:
    """``[{kind, link, title, published}]`` per the frozen subset;
    total on any input."""
    if not xml:
        return []
    text = str(xml)
    m = _KIND_RE.search(text)
    if m is None:
        return []
    kind = "atom" if m.group(1).lower() == "feed" else "rss"
    out = []
    if kind == "rss":
        for bm in _ITEM_RE.finditer(text):
            body = bm.group(1)
            link = _LINK_TEXT_RE.search(body)
            if not link or not link.group(1):
                continue
            title = _TITLE_RE.search(body)
            pub = _PUBDATE_RE.search(body)
            out.append({
                "kind": kind,
                "link": _unescape(link.group(1)),
                "title": _unescape(title.group(1)) if title else None,
                "published": pub.group(1) if pub else None,
            })
    else:
        for bm in _ENTRY_RE.finditer(text):
            body = bm.group(1)
            link = _LINK_HREF_RE.search(body)
            if not link or not link.group(1):
                continue
            title = _TITLE_RE.search(body)
            upd = _UPDATED_RE.search(body)
            out.append({
                "kind": kind,
                "link": _unescape(link.group(1)),
                "title": _unescape(title.group(1)) if title else None,
                "published": upd.group(1) if upd else None,
            })
    return out


def extract_feed_entries(
    ds: Dataset,
    *,
    xml_col: str = "feed_xml",
    source_col: str | None = "feed_url",
) -> Dataset:
    """Narrow explode: one row per feed entry
    ``(source, kind, link, title, published)``, carrying the source
    feed's identifier when ``source_col`` is present."""

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        rows = {"source": [], "kind": [], "link": [], "title": [],
                "published": []}
        sources = (b[source_col] if source_col and source_col in b.columns
                   else pd.Series([""] * len(b), index=b.index))
        for src, xml in zip(sources, b[xml_col]):
            for e in parse_feed(xml):
                rows["source"].append("" if src is None else str(src))
                rows["kind"].append(e["kind"])
                rows["link"].append(e["link"])
                rows["title"].append(e["title"])
                rows["published"].append(e["published"])
        # object dtype, not pandas "string": StringDtype round-trips out
        # of Ray as pd.NA which string-casts to '<NA>' and breaks oracle
        # value parity (same rule as sitemaps.extract_sitemap_entries)
        return pd.DataFrame({k: pd.Series(v, dtype="object")
                             for k, v in rows.items()})

    return ds.map_batches(explode, batch_format="pandas")
