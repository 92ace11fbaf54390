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

import numpy as np
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


LASTMOD_RE = r"^\d{4}-\d{2}-\d{2}([T ]\d{2}:\d{2}:\d{2})?$"


def stale_pages(
    pages: Dataset,
    entries: Dataset,
    *,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    loc_col: str = "loc",
    lastmod_col: str = "lastmod",
    num_buckets: int | None = None,
) -> Dataset:
    """Recrawl-scheduling staleness check: join crawled pages against
    sitemap ``lastmod`` claims and flag every page whose freshest claim
    postdates the stored crawl timestamp —
    ``(url, warc_ts, lastmod_ts, is_stale)``, inner join on url.

    Frozen rules (SQL-mirrorable):
    * ``lastmod`` parses only as ``YYYY-MM-DD`` optionally followed by
      ``[T ]HH:MM:SS`` (:data:`LASTMOD_RE`); anything else is NULL
      (timezone-suffixed forms are out of the frozen subset);
    * multiple claims per url resolve to the MAX parsed timestamp
      (NULLs ignored — associative, so map-side pre-combining is safe);
    * ``is_stale = lastmod_ts > warc_ts``, NULL-claim rows -> False.

    Scale shape: claims reduce to one (url, max lastmod) row per url
    via map-side partials + one grouped merge; then ONE tag-union-
    bucket cogroup by url joins them to the (url, ts) page rows — page
    bodies never enter the plan."""
    from pdf_extract_ray.stages.agg import (
        bucketed_group_apply,
        grouped_aggregate,
    )

    def claims_prep(b: pd.DataFrame) -> pd.DataFrame:
        s = b[loc_col].astype("object").fillna("").astype(str)
        lm = b[lastmod_col].astype("object").fillna("").astype(str)
        ok = lm.str.match(LASTMOD_RE, na=False)
        # format="mixed": date-only and datetime forms coexist in real
        # sitemaps; single-format inference would coerce the minority
        # form to NaT
        ts = pd.to_datetime(lm.where(ok), errors="coerce", format="mixed")
        return pd.DataFrame({url_col: s,
                             "lastmod_ts": ts.astype("datetime64[us]")})

    claims = grouped_aggregate(
        entries.map_batches(claims_prep, batch_format="pandas"),
        [url_col], {"lastmod_ts": ("lastmod_ts", "max")},
        num_buckets=num_buckets)

    def tag_pages(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            url_col: b[url_col],
            "__ts": b[ts_col].astype("datetime64[us]"),
            "__lm": pd.Series(pd.NaT, index=b.index,
                              dtype="datetime64[us]"),
            "__side": np.int8(0),
        })

    def tag_claims(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            url_col: b[url_col],
            "__ts": pd.Series(pd.NaT, index=b.index,
                              dtype="datetime64[us]"),
            "__lm": b["lastmod_ts"].astype("datetime64[us]"),
            "__side": np.int8(1),
        })

    u = (pages.map_batches(tag_pages, batch_format="pandas")
         .union(claims.map_batches(tag_claims, batch_format="pandas")))

    def body(g: pd.DataFrame) -> pd.DataFrame:
        cl = g[g["__side"] == 1][[url_col, "__lm"]]
        pg = g[g["__side"] == 0][[url_col, "__ts"]]
        m = pg.merge(cl, on=url_col, how="inner")
        lm = m["__lm"]
        return pd.DataFrame({
            url_col: m[url_col],
            "warc_ts": m["__ts"],
            "lastmod_ts": lm,
            "is_stale": (lm > m["__ts"]).fillna(False).astype(bool),
        })

    return bucketed_group_apply(u, [url_col], body,
                                num_buckets=num_buckets,
                                pre_batch_size=65536)


def stale_pages_oracle_sql(
    pages_sql: str,
    entries_sql: str,
    *,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    loc_col: str = "loc",
    lastmod_col: str = "lastmod",
) -> str:
    """DuckDB mirror of :func:`stale_pages` (same regex gate, same
    max-claim and NULL->False rules)."""
    return f"""
WITH claims AS (
  SELECT {loc_col} AS {url_col},
         max(CASE WHEN regexp_matches(coalesce({lastmod_col}, ''),
                       '{LASTMOD_RE}')
                  THEN try_cast({lastmod_col} AS TIMESTAMP) END)
           AS lastmod_ts
  FROM ({entries_sql}) GROUP BY {loc_col}
)
SELECT p.{url_col}, p.{ts_col} AS warc_ts, c.lastmod_ts,
       coalesce(c.lastmod_ts > p.{ts_col}, FALSE) AS is_stale
FROM ({pages_sql}) p JOIN claims c USING ({url_col})
"""
