"""Page-metadata extraction — ``(url, title, description, canonical,
og_title)`` per crawled page: the fields a corpus index / dedup-by-
canonical / snippet pipeline reads before touching the body.

Frozen rules:
* ``title`` = inner text of the FIRST ``<title>`` element, cleaned like
  anchor text (tag strip -> entity unescape -> whitespace collapse);
* ``description`` = ``content`` of the first ``<meta name="description">``
  (name match case-insensitive/trimmed), entity-unescaped + collapsed;
* ``og_title`` = same for ``<meta property="og:title">``;
* ``canonical`` = ``href`` of the first ``<link rel="canonical">``
  (rel is a whitespace-separated token list), entity-unescaped, trimmed,
  resolved against the page url (stdlib ``urljoin``);
* missing fields are NULL; double-/single-/un-quoted attributes accepted.

Scale shape: one narrow batch map (per-document regex scan — the parse
cost class); no shuffle.
"""

from __future__ import annotations

import re
from html import unescape

import pandas as pd
from ray.data import Dataset

from pdf_extract_ray.functions.text import clean_markup_text as _clean

_TITLE_RE = re.compile(r"<title\b[^>]*>(.*?)</title\s*>",
                       re.IGNORECASE | re.DOTALL)
_META_TAG_RE = re.compile(r"<meta\s[^>]*>", re.IGNORECASE | re.DOTALL)
_LINK_TAG_RE = re.compile(r"<link\s[^>]*>", re.IGNORECASE | re.DOTALL)
_WS_RE = re.compile(r"\s+")


from pdf_extract_ray.functions.markup import parse_tag_attrs as _attrs


def page_metadata(html: str, url: str) -> dict:
    """One document -> the frozen metadata fields (None when absent)."""
    from urllib.parse import urljoin

    title = description = og_title = canonical = None
    m = _TITLE_RE.search(html)
    if m:
        title = _clean(m.group(1))
    for tag in _META_TAG_RE.findall(html):
        a = _attrs(tag)
        if description is None and a.get("name", "").strip().lower() == "description":
            description = _WS_RE.sub(" ", unescape(a.get("content", ""))).strip()
        if og_title is None and a.get("property", "").strip().lower() == "og:title":
            og_title = _WS_RE.sub(" ", unescape(a.get("content", ""))).strip()
        if description is not None and og_title is not None:
            break
    for tag in _LINK_TAG_RE.findall(html):
        a = _attrs(tag)
        rel = a.get("rel", "").lower().split()
        if "canonical" in rel:
            href = unescape(a.get("href", "")).strip()
            if href:
                try:
                    canonical = urljoin(url, href)
                except ValueError:
                    canonical = None
            break
    return {"title": title, "description": description,
            "canonical": canonical, "og_title": og_title}


def page_metadata_batch(
    batch: pd.DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> pd.DataFrame:
    from pdf_extract_ray.functions.encoding import decode_html_bytes

    rows = []
    for url, html in zip(batch[url_col], batch[html_col]):
        if html is None:
            rows.append({"title": None, "description": None,
                         "canonical": None, "og_title": None})
            continue
        if isinstance(html, (bytes, bytearray)):
            html = decode_html_bytes(bytes(html))[0]
        rows.append(page_metadata(html, url))
    out = pd.DataFrame(rows, columns=["title", "description", "canonical",
                                      "og_title"])
    out.insert(0, "url", batch[url_col].to_numpy())
    return out


def extract_page_metadata(ds: Dataset, html_col: str = "html",
                          url_col: str = "url") -> Dataset:
    """Dataset-level metadata map: one narrow map, no shuffle."""
    return ds.map_batches(
        lambda b: page_metadata_batch(b, html_col, url_col),
        batch_format="pandas",
    )


_LDJSON_RE = re.compile(
    r"""<script\b[^>]*type\s*=\s*(?:"application/ld\+json"|"""
    r"""'application/ld\+json'|application/ld\+json)[^>]*>(.*?)</script\s*>""",
    re.IGNORECASE | re.DOTALL,
)


def ldjson_batch(
    batch: pd.DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> pd.DataFrame:
    """``(url, blob_no, raw_json, ld_type)`` rows from JSON-LD scripts —
    the schema.org structured-data channel (recipes, articles, products)
    a training corpus mines alongside the body text.

    Frozen rules: one row per ``<script type="application/ld+json">``
    block in document order (0-based ``blob_no``); ``raw_json`` is the
    verbatim inner text stripped of surrounding whitespace; ``ld_type``
    is the top-level ``@type`` when the blob parses as a JSON object
    whose ``@type`` is a string (the first element when it is a list),
    else NULL — malformed JSON keeps its raw row, never raises.
    """
    import json

    from pdf_extract_ray.functions.encoding import decode_html_bytes

    urls: list[str] = []
    nos: list[int] = []
    raws: list[str] = []
    types: list[str | None] = []
    for url, html in zip(batch[url_col], batch[html_col]):
        if html is None:
            continue
        if isinstance(html, (bytes, bytearray)):
            html = decode_html_bytes(bytes(html))[0]
        for i, m in enumerate(_LDJSON_RE.finditer(html)):
            raw = m.group(1).strip()
            t = None
            try:
                obj = json.loads(raw)
                if isinstance(obj, dict):
                    tv = obj.get("@type")
                    if isinstance(tv, list) and tv:
                        tv = tv[0]
                    if isinstance(tv, str):
                        t = tv
            except (ValueError, RecursionError):
                pass
            urls.append(url)
            nos.append(i)
            raws.append(raw)
            types.append(t)
    return pd.DataFrame({
        "url": urls,
        "blob_no": pd.Series(nos, dtype="int32"),
        "raw_json": raws,
        "ld_type": pd.Series(types, dtype="object"),
    })


def extract_ldjson(ds: Dataset, html_col: str = "html",
                   url_col: str = "url") -> Dataset:
    """Dataset-level JSON-LD explode: one narrow map, no shuffle."""
    return ds.map_batches(
        lambda b: ldjson_batch(b, html_col, url_col),
        batch_format="pandas",
    )


_REFRESH_CONTENT_RE = re.compile(
    r"""^\s*([0-9]+)\s*(?:;\s*url\s*=\s*("?)([^"']*)\2\s*)?$""",
    re.IGNORECASE,
)


def refresh_redirects_batch(
    batch: pd.DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> pd.DataFrame:
    """``(url, delay_s, target_url)`` rows for pages carrying a
    ``<meta http-equiv="refresh">`` — the soft-redirect signal: such
    pages are boilerplate for training purposes and their target feeds
    the crawl frontier.

    Frozen rules: the FIRST refresh meta wins (http-equiv match
    case-insensitive/trimmed); content parses as ``N`` or ``N; url=...``
    (integer delay; optional double quotes around the target, entities
    unescaped, urljoin-resolved); a bare ``N`` emits a NULL target
    (self-refresh); unparseable content emits nothing.
    """
    from urllib.parse import urljoin

    from pdf_extract_ray.functions.encoding import decode_html_bytes
    from pdf_extract_ray.functions.markup import parse_tag_attrs

    urls: list[str] = []
    delays: list[int] = []
    targets: list[str | None] = []
    for url, html in zip(batch[url_col], batch[html_col]):
        if html is None:
            continue
        if isinstance(html, (bytes, bytearray)):
            html = decode_html_bytes(bytes(html))[0]
        for tag in _META_TAG_RE.findall(html):
            a = parse_tag_attrs(tag)
            if a.get("http-equiv", "").strip().lower() != "refresh":
                continue
            m = _REFRESH_CONTENT_RE.match(unescape(a.get("content", "")))
            if not m:
                break  # first refresh meta wins, even if unparseable
            target = None
            if m.group(3):
                try:
                    target = urljoin(url, m.group(3).strip())
                except ValueError:
                    target = None
            urls.append(url)
            delays.append(int(m.group(1)))
            targets.append(target)
            break
    return pd.DataFrame({
        "url": urls,
        "delay_s": pd.Series(delays, dtype="int64"),
        "target_url": pd.Series(targets, dtype="object"),
    })


def extract_refresh_redirects(ds: Dataset, html_col: str = "html",
                              url_col: str = "url") -> Dataset:
    """Dataset-level soft-redirect scan: one narrow map, no shuffle."""
    return ds.map_batches(
        lambda b: refresh_redirects_batch(b, html_col, url_col),
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# text-density signals (boilerpipe/jusText-family, public method): the
# cheap structural quality cues a crawl filters on before any content
# model — how much of the page is text vs markup, and how much of that
# text is anchor text (navigation-heavy pages score high link density).
# ---------------------------------------------------------------------------

_TAG_RE = re.compile(r"(?s)<[^>]*>")
_ANCHOR_RE = re.compile(r"(?s)<a[^>]*>(.*?)</a>", re.IGNORECASE)
_WS_RE = re.compile(r"\s+")

DENSITY_COLS = ["html_len", "tag_count", "text_len", "link_text_len",
                "text_density", "link_density"]


def _plain_len(fragment: str) -> int:
    return len(_WS_RE.sub(" ", _TAG_RE.sub(" ", fragment)).strip())


def text_density_batch(batch: pd.DataFrame,
                       html_col: str = "html") -> pd.DataFrame:
    """Append the frozen density signals (SQL-mirrored bit-for-bit):
    ``html_len`` (chars), ``tag_count`` (``<[^>]*>`` matches),
    ``text_len`` (tags -> space, whitespace collapsed, trimmed),
    ``link_text_len`` (same rule over ``<a>`` inner fragments, summed),
    ``text_density = round(text_len / max(html_len, 1), 4)``,
    ``link_density = round(link_text_len / max(text_len, 1), 4)``.
    Case-insensitive anchors, ``(?s)`` dot-matches-newline in both
    engines.  Narrow map, zero shuffles.

    SQL-parity caveat (round-4 ADVICE): the mirror is bit-for-bit on
    ASCII-whitespace inputs only — Python's ``\\s`` / ``str.strip()``
    are Unicode-aware while DuckDB/RE2 ``\\s`` and ``trim()`` are
    ASCII-only, so ``text_len`` (and the densities derived from it)
    diverge on non-ASCII whitespace such as a literal NBSP.  The engine
    keeps the Unicode rule (correct for real HTML); oracle inputs must
    be ASCII-whitespace (the driver query's synthetic template is)."""
    import numpy as np

    from pdf_extract_ray.util import round_half_away

    s = batch[html_col].fillna("").astype(str)
    html_len = s.str.len().to_numpy(np.int64)
    tag_count = s.str.count(_TAG_RE).to_numpy(np.int64)
    text_len = np.fromiter((_plain_len(v) for v in s), dtype=np.int64,
                           count=len(s))
    link_text_len = np.fromiter(
        (sum(_plain_len(f) for f in _ANCHOR_RE.findall(v)) for v in s),
        dtype=np.int64, count=len(s))
    out = batch.copy()
    out["html_len"] = html_len
    out["tag_count"] = tag_count
    out["text_len"] = text_len
    out["link_text_len"] = link_text_len
    out["text_density"] = round_half_away(
        text_len / np.maximum(html_len, 1), 4)
    out["link_density"] = round_half_away(
        link_text_len / np.maximum(text_len, 1), 4)
    return out


def extract_text_density(ds: Dataset, html_col: str = "html") -> Dataset:
    """Dataset wrapper: one narrow map."""
    return ds.map_batches(
        lambda b: text_density_batch(b, html_col), batch_format="pandas")


def text_density_oracle_sql(source_sql: str,
                            html_expr: str = "html") -> str:
    """DuckDB mirror of ``text_density_batch`` (both engines are RE2 on
    the anchor scan; Python re and RE2 agree on these patterns).  Parity
    holds on ASCII-whitespace inputs — see ``text_density_batch``'s
    caveat on Unicode whitespace (NBSP etc.)."""
    plain = ("length(trim(regexp_replace(regexp_replace({x}, "
             "'(?s)<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g')))")
    txt = plain.format(x=html_expr)
    anchors = (f"list_sum(list_transform(regexp_extract_all({html_expr}, "
               "'(?si)<a[^>]*>(.*?)</a>', 1), x -> "
               + plain.format(x="x") + "))")
    return f"""
SELECT *,
  CAST(length({html_expr}) AS BIGINT) AS html_len,
  CAST(length(regexp_extract_all({html_expr}, '(?s)<[^>]*>')) AS BIGINT)
    AS tag_count,
  CAST({txt} AS BIGINT) AS text_len,
  CAST(coalesce({anchors}, 0) AS BIGINT) AS link_text_len,
  round({txt} / greatest(length({html_expr}), 1), 4) AS text_density,
  round(coalesce({anchors}, 0) / greatest({txt}, 1), 4) AS link_density
FROM ({source_sql})
"""


# ---------------------------------------------------------------------------
# date-mention mining: the temporal signal cutoff-aware corpus curation
# filters on ("drop/flag documents discussing events after the training
# cutoff", content-age priors for recrawl scheduling).  Frozen ASCII
# rules, RE2-mirrorable in DuckDB bit-for-bit.
# ---------------------------------------------------------------------------

_ISO_DATE_RE = re.compile(
    r"[0-9]{4}-(?:0[1-9]|1[0-2])-(?:0[1-9]|[12][0-9]|3[01])")
_TEXTUAL_DATE_RE = re.compile(
    r"(?:january|february|march|april|may|june|july|august|september|"
    r"october|november|december) [0-9]{1,2}, [0-9]{4}")
_YEAR_RE = re.compile(r"\b(?:19[0-9]{2}|20[0-9]{2})\b")

DATE_COLS = ["n_dates_iso", "n_dates_textual", "n_years",
             "min_year", "max_year"]


def date_mentions_batch(batch: pd.DataFrame, *, id_col: str = "doc_id",
                        text_col: str = "text") -> pd.DataFrame:
    """Per-doc date-mention signals over ``lower(text)``:
    ``n_dates_iso`` (valid ``YYYY-MM-DD``), ``n_dates_textual``
    (``month D, YYYY`` with full English month names), ``n_years``
    (standalone ``19xx``/``20xx`` words — ISO and textual years are
    standalone words too, so they count here as well), and
    ``min_year`` / ``max_year`` over those year words (``-1`` when the
    document mentions none — the int sentinel keeps the column
    non-nullable int64).  One narrow vectorized map, zero shuffles;
    the per-row min/max loop runs over the MATCH LISTS, not the text."""
    import numpy as np

    t = batch[text_col].fillna("").astype(str).str.lower()
    n_iso = t.str.count(_ISO_DATE_RE).to_numpy(np.int64)
    n_txt = t.str.count(_TEXTUAL_DATE_RE).to_numpy(np.int64)
    years = t.str.findall(_YEAR_RE)
    n_years = years.str.len().to_numpy(np.int64)
    mins = np.fromiter(
        (min(map(int, ys)) if ys else -1 for ys in years),
        dtype=np.int64, count=len(years))
    maxs = np.fromiter(
        (max(map(int, ys)) if ys else -1 for ys in years),
        dtype=np.int64, count=len(years))
    return pd.DataFrame({
        id_col: batch[id_col].to_numpy(),
        "n_dates_iso": n_iso,
        "n_dates_textual": n_txt,
        "n_years": n_years,
        "min_year": mins,
        "max_year": maxs,
    })


def extract_date_mentions(ds: Dataset, *, id_col: str = "doc_id",
                          text_col: str = "text") -> Dataset:
    """Dataset wrapper: one narrow map."""
    return ds.map_batches(
        lambda b: date_mentions_batch(b, id_col=id_col, text_col=text_col),
        batch_format="pandas")


def date_mentions_oracle_sql(source_sql: str, *, id_col: str = "doc_id",
                             text_expr: str = "text") -> str:
    """DuckDB mirror of :func:`date_mentions_batch` — the same three
    frozen patterns (RE2 and Python ``re`` agree on them, including
    ``\\b`` word boundaries), min/max via list_transform + coalesce(-1)."""
    t = f"lower(coalesce({text_expr}, ''))"
    iso = ("regexp_extract_all({t}, "
           "'[0-9]{{4}}-(?:0[1-9]|1[0-2])-(?:0[1-9]|[12][0-9]|3[01])')")
    txt = ("regexp_extract_all({t}, "
           "'(?:january|february|march|april|may|june|july|august|"
           "september|october|november|december) [0-9]{{1,2}}, "
           "[0-9]{{4}}')")
    yrs = "regexp_extract_all({t}, '\\b(?:19[0-9]{{2}}|20[0-9]{{2}})\\b')"
    ylist = f"list_transform({yrs.format(t=t)}, x -> CAST(x AS BIGINT))"
    return f"""
SELECT {id_col},
  CAST(len({iso.format(t=t)}) AS BIGINT) AS n_dates_iso,
  CAST(len({txt.format(t=t)}) AS BIGINT) AS n_dates_textual,
  CAST(len({yrs.format(t=t)}) AS BIGINT) AS n_years,
  CAST(coalesce(list_min({ylist}), -1) AS BIGINT) AS min_year,
  CAST(coalesce(list_max({ylist}), -1) AS BIGINT) AS max_year
FROM ({source_sql})
"""
