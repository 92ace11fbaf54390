"""Outlink extraction + host link graph — the crawl-processing step that
feeds link-based ranking and graph dedup (host-level PageRank, spam
neighborhoods): every page explodes into ``(src_url, dst_url)`` edges,
then a grouped rollup builds the ``(src_host, dst_host, n_links)``
host graph.

Extraction rules (frozen):
* ``<a ... href=...>`` values, double-/single-/un-quoted;
* HTML entities in the href are unescaped (``&amp;`` -> ``&``);
* fragment-only (``#...``) and ``javascript:/mailto:/data:/tel:`` links
  are skipped;
* relative hrefs resolve against the page url (stdlib ``urljoin`` —
  frozen semantics);
* only resulting ``http(s)://`` urls are emitted.

Scale shape: extraction is one narrow ``flat_map``-style batch explode
(per-doc regex scan, the same inherent per-document cost class as the
extractor); the host rollup is map-side partial aggregation + one small
bucketed merge (``stages/agg.grouped_aggregate``) — edge TEXT never
shuffles, only (src_host, dst_host, partial_count) rows do.
"""

from __future__ import annotations

import re
from html import unescape

import pandas as pd
from ray.data import Dataset

from pdf_extract_ray.functions.markup import parse_tag_attrs
from pdf_extract_ray.functions.text import clean_markup_text

_HREF_RE = re.compile(
    r"""<a\s[^>]*?href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""",
    re.IGNORECASE | re.DOTALL,
)
_SKIP_SCHEME_RE = re.compile(r"^(?:javascript|mailto|data|tel):", re.I)

# full <a ...>inner</a> element: href groups 1-3 as above, inner = group 4.
# Non-greedy inner stops at the first </a> (nested <a> is invalid HTML;
# frozen rule: the outer anchor ends at the first close tag).
_ANCHOR_RE = re.compile(
    r"""<a\s[^>]*?href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))[^>]*>(.*?)</a\s*>""",
    re.IGNORECASE | re.DOTALL,
)



def extract_links_batch(
    batch: pd.DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> pd.DataFrame:
    """One batch of pages -> exploded ``(src_url, dst_url)`` edge rows."""
    from urllib.parse import urljoin

    from pdf_extract_ray.functions.encoding import decode_html_bytes

    srcs: list[str] = []
    dsts: list[str] = []
    for src, html in zip(batch[url_col], batch[html_col]):
        if html is None:
            continue
        if isinstance(html, (bytes, bytearray)):
            html = decode_html_bytes(bytes(html))[0]
        for m in _HREF_RE.finditer(html):
            href = unescape(m.group(1) or m.group(2) or m.group(3) or "").strip()
            if not href or href.startswith("#") or _SKIP_SCHEME_RE.match(href):
                continue
            try:
                dst = urljoin(src, href)
            except ValueError:
                continue  # degenerate href: skip, never crash
            if dst[:8].lower().startswith(("http://", "https://")):
                srcs.append(src)
                dsts.append(dst)
    return pd.DataFrame({"src_url": srcs, "dst_url": dsts})


def extract_links(ds: Dataset, html_col: str = "html",
                  url_col: str = "url") -> Dataset:
    """Dataset-level edge explode: one narrow map, no shuffle."""
    return ds.map_batches(
        lambda b: extract_links_batch(b, html_col, url_col),
        batch_format="pandas",
    )


def extract_anchors_batch(
    batch: pd.DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> pd.DataFrame:
    """One batch of pages -> ``(src_url, dst_url, anchor)`` rows — the
    classic anchor-text relevance signal (what other pages call a url).

    Anchor-text rules (frozen): inner markup stripped (``<b>x</b>`` ->
    ``x``), entities unescaped AFTER the strip (so ``&lt;b&gt;`` stays
    literal text), whitespace collapsed to single spaces and trimmed;
    image-only / empty anchors are dropped.  Href filtering/resolution is
    identical to :func:`extract_links_batch`.
    """
    from urllib.parse import urljoin

    from pdf_extract_ray.functions.encoding import decode_html_bytes

    srcs: list[str] = []
    dsts: list[str] = []
    texts: list[str] = []
    for src, html in zip(batch[url_col], batch[html_col]):
        if html is None:
            continue
        if isinstance(html, (bytes, bytearray)):
            html = decode_html_bytes(bytes(html))[0]
        for m in _ANCHOR_RE.finditer(html):
            href = unescape(m.group(1) or m.group(2) or m.group(3) or "").strip()
            if not href or href.startswith("#") or _SKIP_SCHEME_RE.match(href):
                continue
            anchor = clean_markup_text(m.group(4))
            if not anchor:
                continue
            try:
                dst = urljoin(src, href)
            except ValueError:
                continue
            if dst[:8].lower().startswith(("http://", "https://")):
                srcs.append(src)
                dsts.append(dst)
                texts.append(anchor)
    return pd.DataFrame({"src_url": srcs, "dst_url": dsts, "anchor": texts})


def extract_anchors(ds: Dataset, html_col: str = "html",
                    url_col: str = "url") -> Dataset:
    """Dataset-level anchor explode: one narrow map, no shuffle."""
    return ds.map_batches(
        lambda b: extract_anchors_batch(b, html_col, url_col),
        batch_format="pandas",
    )


_LINK_TAG_RE = re.compile(r"<link\s[^>]*>", re.IGNORECASE | re.DOTALL)


def extract_hreflang_batch(
    batch: pd.DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> pd.DataFrame:
    """``(src_url, hreflang, alt_url)`` rows from ``<link rel="alternate"
    hreflang=...>`` tags — the crawl-level signal that pairs a page with
    its translations (the upstream feed for cross-lingual alignment).

    Frozen rules: rel is a whitespace-separated token list containing
    ``alternate`` (case-insensitive); hreflang is lowercased + trimmed;
    href entity-unescaped, trimmed, resolved against the page url;
    tags missing either attribute are skipped; duplicates emit as-is.
    """
    from urllib.parse import urljoin

    from pdf_extract_ray.functions.encoding import decode_html_bytes

    srcs: list[str] = []
    langs: list[str] = []
    alts: list[str] = []
    for src, html in zip(batch[url_col], batch[html_col]):
        if html is None:
            continue
        if isinstance(html, (bytes, bytearray)):
            html = decode_html_bytes(bytes(html))[0]
        for tag in _LINK_TAG_RE.findall(html):
            a = parse_tag_attrs(tag)
            if "alternate" not in a.get("rel", "").lower().split():
                continue
            lang = a.get("hreflang", "").strip().lower()
            href = unescape(a.get("href", "")).strip()
            if not lang or not href:
                continue
            try:
                alt = urljoin(src, href)
            except ValueError:
                continue
            srcs.append(src)
            langs.append(lang)
            alts.append(alt)
    return pd.DataFrame({"src_url": srcs, "hreflang": langs,
                         "alt_url": alts})


def extract_hreflang(ds: Dataset, html_col: str = "html",
                     url_col: str = "url") -> Dataset:
    """Dataset-level hreflang explode: one narrow map, no shuffle."""
    return ds.map_batches(
        lambda b: extract_hreflang_batch(b, html_col, url_col),
        batch_format="pandas",
    )


def anchor_host_rollup(ds: Dataset, html_col: str = "html",
                       url_col: str = "url") -> Dataset:
    """Per-target-host anchor-text histogram ``(dst_host, anchor,
    n_links)``: extract (narrow) -> host projection (narrow) -> map-side
    partial counts -> one small merge.  Anchor strings shuffle only as
    already-deduplicated (host, anchor, partial_count) rows, never the
    page HTML."""
    from pdf_extract_ray.functions.url import canonicalize_urls
    from pdf_extract_ray.stages.agg import grouped_aggregate

    anchors = extract_anchors(ds, html_col, url_col)

    def hostify(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "dst_host": canonicalize_urls(b["dst_url"])["url_host"],
            "anchor": b["anchor"],
        })

    return grouped_aggregate(
        anchors.map_batches(hostify, batch_format="pandas"),
        ["dst_host", "anchor"],
        {"n_links": ("anchor", "count")},
    )


def host_link_edges(ds: Dataset, html_col: str = "html",
                    url_col: str = "url") -> Dataset:
    """``(src_host, dst_host, n_links)`` host graph: extract -> host
    projection (narrow) -> map-side partial counts -> one small merge."""
    from pdf_extract_ray.functions.url import canonicalize_urls
    from pdf_extract_ray.stages.agg import grouped_aggregate

    links = extract_links(ds, html_col, url_col)

    def hostify(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "src_host": canonicalize_urls(b["src_url"])["url_host"],
            "dst_host": canonicalize_urls(b["dst_url"])["url_host"],
        })

    return grouped_aggregate(
        links.map_batches(hostify, batch_format="pandas"),
        ["src_host", "dst_host"],
        {"n_links": ("dst_host", "count")},
    )


def url_host_link_edges(ds: Dataset, html_col: str = "html",
                        url_col: str = "url") -> Dataset:
    """``(src_url, src_host, dst_host, n_links)`` per-PAGE edge rollup —
    the granularity the incremental link graph stores so a changed
    page's old contribution can be SUBTRACTED without re-parsing old
    crawls (pipelines/linkgraph.incremental_host_graph).  Same narrow
    extract + one grouped merge as ``host_link_edges``; rows are bounded
    by the corpus's total out-degree."""
    from pdf_extract_ray.functions.url import canonicalize_urls
    from pdf_extract_ray.stages.agg import grouped_aggregate

    links = extract_links(ds, html_col, url_col)

    def hostify(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "src_url": b["src_url"].astype(str).to_numpy(),
            "src_host": canonicalize_urls(b["src_url"])["url_host"],
            "dst_host": canonicalize_urls(b["dst_url"])["url_host"],
        })

    return grouped_aggregate(
        links.map_batches(hostify, batch_format="pandas"),
        ["src_url", "src_host", "dst_host"],
        {"n_links": ("dst_host", "count")},
    )


def host_template_stats(
    ds: Dataset,
    *,
    url_col: str = "url",
    text_col: str = "text",
) -> Dataset:
    """Per-host template/spam cue: how many DISTINCT content
    fingerprints a host's pages collapse to — template farms and
    scraped-mirror hosts publish thousands of urls over a handful of
    templates, and host-level spam screens (RefinedWeb-style curation)
    cut them before any per-document work.

    Output: ``(url_host, n_docs, n_templates, dup_frac)`` with
    ``dup_frac = round(1 - n_templates/n_docs, 4)`` (0 = every page
    unique, -> 1 = one template stamped everywhere).

    Scale shape: the narrow map emits only ``(url_host, fingerprint)``
    pairs — 32-byte hashes, never bodies — pre-deduplicated per batch
    (map-side shrink: a template farm's batches collapse before the
    wire); then ONE bucketed shuffle on the host and a vectorized
    nunique/size per bucket.  Host groups are count-bounded by the
    crawl's per-host page cap (compose with ``mix.cap_per_group``).
    """
    from pdf_extract_ray.functions.url import canonicalize_urls
    from pdf_extract_ray.stages.agg import bucketed_group_apply
    from pdf_extract_ray.stages.textquality import fingerprint_batch

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        host = canonicalize_urls(b[url_col])["url_host"].to_numpy()
        fp = fingerprint_batch(
            b[[text_col]].rename(columns={text_col: "text"}).copy()
        )["fingerprint"].to_numpy()
        out = pd.DataFrame({"url_host": host, "fingerprint": fp,
                            "__n": 1})
        # map-side shrink: per-batch (host, fp) partial counts
        return (out.groupby(["url_host", "fingerprint"], as_index=False)
                .agg(__n=("__n", "sum")))

    def rollup(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("url_host").agg(
            n_docs=("__n", "sum"), n_templates=("fingerprint", "nunique"))
        import numpy as np

        n_docs = g["n_docs"].to_numpy("int64")
        n_templates = g["n_templates"].to_numpy("int64")
        return pd.DataFrame({
            "url_host": g.index.to_numpy(),
            "n_docs": n_docs,
            "n_templates": n_templates,
            "dup_frac": np.round(1.0 - n_templates / n_docs, 4),
        })

    # second-level partial merge happens inside the bucket (all rows of
    # a host land in one bucket, so per-batch partials just sum)
    return bucketed_group_apply(
        ds.map_batches(pairs, batch_format="pandas"),
        ["url_host"], rollup)


def host_quality_prior(
    ds: Dataset,
    *,
    url_col: str = "url",
    score_col: str = "score",
    id_col: str = "doc_id",
    min_avg: float | None = None,
) -> Dataset:
    """Host-level quality prior: every page gets its host's document
    count and mean quality score, plus a ``kept`` flag when ``min_avg``
    is set — the RefinedWeb/CCNet-style "curate by site, not only by
    page" step (a spam farm's individually-plausible pages fall to the
    host mean; a reputable host rescues borderline pages from noisy
    page-level scores).

    Output: ``(id_col, url_host, host_n_docs, host_avg_score[, kept])``
    with ``host_avg_score = round(mean, 4)`` and ``kept =
    round(mean, 4) >= min_avg`` (the threshold applies to the rounded
    value — the frozen rule the SQL oracle mirrors).  Integer scores
    make the mean exact (int64 sum, one division); float scores carry
    the usual sum-order ulps, absorbed by the round.

    Scale shape: ONE bucketed shuffle of narrow ``(id, host, score)``
    rows — bodies never move (join the verdict back by id downstream);
    the per-host state inside a bucket is two scalars (sum, count), so
    skewed hosts cost memory proportional to their row count only."""
    from pdf_extract_ray.functions.url import canonicalize_urls
    from pdf_extract_ray.stages.agg import bucketed_group_apply
    from pdf_extract_ray.util import round_half_away

    def narrow(b: pd.DataFrame) -> pd.DataFrame:
        host = canonicalize_urls(b[url_col])["url_host"].to_numpy()
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(),
            "url_host": host,
            score_col: b[score_col].to_numpy(),
        })

    def rollup(bucket: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        g = bucket.groupby("url_host", sort=False)[score_col]
        s = g.transform("sum").to_numpy(np.float64)
        c = g.transform("size").to_numpy(np.int64)
        avg = round_half_away(s / c, 4)
        out = pd.DataFrame({
            id_col: bucket[id_col].to_numpy(),
            "url_host": bucket["url_host"].to_numpy(),
            "host_n_docs": c,
            "host_avg_score": avg,
        })
        if min_avg is not None:
            out["kept"] = avg >= min_avg
        return out

    return bucketed_group_apply(
        ds.map_batches(narrow, batch_format="pandas"),
        ["url_host"], rollup)


def host_quality_prior_oracle_sql(
    source_sql: str,
    *,
    score_col: str = "score",
    id_col: str = "doc_id",
    min_avg: float | None = None,
) -> str:
    """DuckDB mirror of :func:`host_quality_prior` — ``source_sql``
    must expose ``(id_col, url_host, score_col)`` per page row."""
    kept = (f", round(avg({score_col}), 4) >= {min_avg} AS kept"
            if min_avg is not None else "")
    return f"""
WITH src AS ({source_sql}),
h AS (
  SELECT url_host, CAST(count(*) AS BIGINT) AS host_n_docs,
         round(avg({score_col}), 4) AS host_avg_score{kept}
  FROM src GROUP BY url_host
)
SELECT src.{id_col}, src.url_host, h.host_n_docs, h.host_avg_score
       {', h.kept' if min_avg is not None else ''}
FROM src JOIN h USING (url_host)
"""


def host_template_stats_oracle_sql(
    source_sql: str,
    *,
    host_col: str = "url_host",
    fp_col: str = "fingerprint",
) -> str:
    """DuckDB mirror of :func:`host_template_stats` — ``source_sql``
    must expose the canonical host and the content fingerprint per
    page row."""
    return f"""
SELECT {host_col} AS url_host,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT {fp_col}) AS BIGINT) AS n_templates,
       round(1.0 - count(DISTINCT {fp_col})
                   / CAST(count(*) AS DOUBLE), 4) AS dup_frac
FROM ({source_sql}) GROUP BY {host_col}
"""


def url_path_rollup(ds: Dataset, url_col: str = "url", *,
                    max_depth: int = 2) -> Dataset:
    """Pages per (host, path-prefix) at each depth 1..``max_depth`` —
    the site-structure report behind per-section crawl budgeting and
    template-farm triage (one forum section holding 90% of a host's
    pages is a different curation decision than an even spread).

    Frozen rule: the depth-``d`` prefix is the leading ``d`` non-empty
    path segments, matched by the single regex ``^((?:/[^/?#]+){d})``
    over the raw (untouched-case) path — one vectorized
    ``Series.str.extract`` per depth, identical to the SQL mirror's
    ``regexp_extract`` per depth, so parity is exact.  Rows whose url
    does not parse (no scheme) are skipped; a path shallower than ``d``
    contributes no depth-``d`` row.

    Scale shape: per-batch value_counts = map-side combine; only
    (host, depth, prefix, n) partials shuffle into ONE grouped merge —
    output is O(distinct prefixes), bodies never move."""
    from pdf_extract_ray.functions.url import canonicalize_urls, URL_PARTS_RE
    from pdf_extract_ray.stages.agg import grouped_aggregate

    if max_depth < 1:
        raise ValueError("max_depth must be >= 1")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        s = b[url_col].fillna("").astype(str).str.strip()
        host = canonicalize_urls(b[url_col])["url_host"]
        path = s.str.extract(URL_PARTS_RE)[2].fillna("")
        frames = []
        for d in range(1, max_depth + 1):
            pref = path.str.extract(rf"^((?:/[^/?#]+){{{d}}})")[0]
            ok = pref.notna() & (host.to_numpy() != "")
            if ok.any():
                frames.append(pd.DataFrame({
                    "url_host": host[ok.to_numpy()].to_numpy(),
                    "depth": d,
                    "prefix": pref[ok].to_numpy(),
                }))
        if not frames:
            return pd.DataFrame({
                "url_host": pd.Series([], dtype=object),
                "depth": pd.Series([], dtype="int64"),
                "prefix": pd.Series([], dtype=object),
                "n_docs": pd.Series([], dtype="int64")})
        flat = pd.concat(frames, ignore_index=True)
        out = (flat.groupby(["url_host", "depth", "prefix"], as_index=False)
               .size().rename(columns={"size": "n_docs"}))
        out["n_docs"] = out["n_docs"].astype("int64")
        return out

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        ["url_host", "depth", "prefix"], {"n_docs": ("n_docs", "sum")})


def url_path_rollup_oracle_sql(source_sql: str, *, url_expr: str = "url",
                               max_depth: int = 2) -> str:
    """DuckDB mirror of :func:`url_path_rollup` — the identical
    per-depth ``regexp_extract`` over the identical path extraction."""
    host = ("regexp_replace(lower(regexp_extract(url, "
            "'^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)', 1)), "
            "':[0-9]+$', '')")
    path = ("regexp_extract(url, "
            "'^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*([^?#]*)', 1)")
    branches = " UNION ALL ".join(
        f"SELECT url_host, {d} AS depth, "
        f"regexp_extract(path, '^((?:/[^/?#]+){{{d}}})', 1) AS prefix "
        "FROM hp"
        for d in range(1, int(max_depth) + 1))
    return f"""
WITH u AS (SELECT trim({url_expr}) AS url FROM ({source_sql})),
hp AS (SELECT {host} AS url_host, {path} AS path FROM u
       WHERE {host} <> ''),
pref AS ({branches})
SELECT url_host, depth, prefix, count(*) AS n_docs
FROM pref WHERE prefix <> ''
GROUP BY url_host, depth, prefix
"""


def registered_domain_rollup(ds: Dataset, url_col: str = "url") -> Dataset:
    """Pages and distinct hosts per REGISTRABLE domain (eTLD+1): the
    site-level rollup crawl curation actually wants — ``a.shop.co.uk``
    and ``b.shop.co.uk`` are one owner, while a plain last-2-labels cut
    would lump every ``*.co.uk`` site together.  Uses the frozen
    public-suffix subset in :data:`functions.url.MULTI_SUFFIXES`.

    Scale shape: per-batch (domain, host) value_counts partials ->
    grouped merge keyed by the DISTINCT (domain, host) pair (bounded by
    #hosts, not #pages) -> one tiny per-domain merge.  Bodies never
    move; page rows shuffle as pre-aggregated counts only."""
    from pdf_extract_ray.functions.url import (
        canonicalize_urls, registered_domains)
    from pdf_extract_ray.stages.agg import grouped_aggregate

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        host = canonicalize_urls(b[url_col])["url_host"]
        keep = host != ""
        host = host[keep.to_numpy()]
        out = pd.DataFrame({
            "registered_domain": registered_domains(host).to_numpy(),
            "url_host": host.to_numpy(),
        })
        out = (out.groupby(["registered_domain", "url_host"],
                           as_index=False).size()
               .rename(columns={"size": "n_docs"}))
        out["n_docs"] = out["n_docs"].astype("int64")
        return out

    per_host = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        ["registered_domain", "url_host"], {"n_docs": ("n_docs", "sum")})
    return grouped_aggregate(
        per_host, ["registered_domain"],
        {"n_docs": ("n_docs", "sum"), "n_hosts": ("n_docs", "count")})


def registered_domain_rollup_oracle_sql(source_sql: str, *,
                                        url_expr: str = "url") -> str:
    """DuckDB mirror of :func:`registered_domain_rollup`."""
    from pdf_extract_ray.functions.url import registered_domain_sql_expr

    host = ("regexp_replace(lower(regexp_extract(url, "
            "'^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)', 1)), "
            "':[0-9]+$', '')")
    return f"""
WITH u AS (SELECT trim({url_expr}) AS url FROM ({source_sql})),
h AS (SELECT {host} AS url_host FROM u WHERE {host} <> ''),
r AS (SELECT url_host,
             {registered_domain_sql_expr('url_host')} AS registered_domain
      FROM h)
SELECT registered_domain, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT url_host) AS BIGINT) AS n_hosts
FROM r GROUP BY registered_domain
"""


def query_param_rollup(ds: Dataset, url_col: str = "url",
                       id_col: str = "doc_id") -> Dataset:
    """Occurrences and distinct documents per URL query-parameter KEY —
    the tracking-parameter / faceted-navigation census that feeds a
    crawler's canonicalization strip-list (a key on 40% of a site's
    urls with thousands of distinct values is a crawler trap).

    Frozen rule: query = text between the first ``?`` and ``#`` of the
    trimmed url (urls only), split on ``&``, empty parts dropped, key =
    text before the first ``=`` (case-sensitive, raw).

    Scale shape: per-batch (key, id) counts -> grouped merge keyed by
    DISTINCT (key, id) -> per-key merge; output O(distinct keys)."""
    from pdf_extract_ray.functions.url import URL_PARTS_RE
    from pdf_extract_ray.stages.agg import grouped_aggregate

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        s = b[url_col].fillna("").astype(str).str.strip()
        query = s.str.extract(URL_PARTS_RE)[3].fillna("")
        ids = b[id_col]
        ex = query.str.split("&").explode()
        flat = pd.DataFrame({
            "__id": ids.loc[ex.index].to_numpy(),
            "part": ex.to_numpy(),
        })
        flat = flat[flat["part"].fillna("") != ""]
        flat["param_key"] = flat["part"].str.split("=", n=1).str[0]
        out = (flat.groupby(["param_key", "__id"], as_index=False)
               .size().rename(columns={"size": "n"}))
        out["n"] = out["n"].astype("int64")
        return out[["param_key", "__id", "n"]]

    per_doc = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        ["param_key", "__id"], {"n": ("n", "sum")})
    out = grouped_aggregate(
        per_doc, ["param_key"],
        {"n_total": ("n", "sum"), "n_docs": ("n", "count")})
    return out


def query_param_rollup_oracle_sql(source_sql: str, *,
                                  url_expr: str = "url",
                                  id_expr: str = "doc_id") -> str:
    """DuckDB mirror of :func:`query_param_rollup`."""
    return f"""
WITH u AS (SELECT {id_expr} AS id, trim({url_expr}) AS url
           FROM ({source_sql})),
q AS (SELECT id, regexp_extract(url,
        '^[A-Za-z][A-Za-z0-9+.\\-]*://[^?#]*\\?([^#]*)', 1) AS query
      FROM u),
p AS (SELECT id, unnest(string_split(query, '&')) AS part
      FROM q WHERE query <> ''),
k AS (SELECT id, split_part(part, '=', 1) AS param_key
      FROM p WHERE part <> '')
SELECT param_key, CAST(count(*) AS BIGINT) AS n_total,
       CAST(count(DISTINCT id) AS BIGINT) AS n_docs
FROM k GROUP BY param_key
"""


def tld_lang_crosstab(
    ds: Dataset,
    *,
    url_col: str = "url",
    lang_col: str = "lang",
    num_buckets: int | None = None,
) -> Dataset:
    """Corpus-composition report: document counts per (top-level
    domain, language) — the curation crosstab behind "how much .de
    content is actually German" / country-vs-language skew checks.

    Frozen rule: ``tld`` = the last dot-separated label of the
    canonical host (``''`` for non-urls); language NULLs count as
    ``''``.

    Scale shape: per-batch (tld, lang) value_counts partials -> ONE
    grouped merge of pre-aggregated counts; output is O(#tlds x
    #langs)."""
    from pdf_extract_ray.functions.url import canonicalize_urls
    from pdf_extract_ray.stages.agg import grouped_aggregate

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        host = canonicalize_urls(b[url_col])["url_host"]
        tld = host.str.extract(r"([^.]+)$")[0].fillna("")
        out = (pd.DataFrame({
                   "tld": tld.to_numpy(),
                   lang_col: b[lang_col].fillna("").astype(str)
                   .to_numpy()})
               .groupby(["tld", lang_col], as_index=False)
               .size().rename(columns={"size": "n_docs"}))
        out["n_docs"] = out["n_docs"].astype("int64")
        return out

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        ["tld", lang_col], {"n_docs": ("n_docs", "sum")},
        num_buckets=num_buckets)


def tld_lang_crosstab_oracle_sql(
    source_sql: str,
    *,
    lang_col: str = "lang",
) -> str:
    """DuckDB mirror of :func:`tld_lang_crosstab` — ``source_sql``
    must expose the canonical ``url_host`` and the language column."""
    return f"""
SELECT regexp_extract(url_host, '([^.]+)$', 1) AS tld,
       coalesce({lang_col}, '') AS {lang_col},
       CAST(count(*) AS BIGINT) AS n_docs
FROM ({source_sql})
GROUP BY tld, coalesce({lang_col}, '')
"""


TEXT_URL_RE = r"https?://[^\s<>\"')\]]+"


def text_url_mentions(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Outlink mining from PLAIN TEXT — the link-graph source for
    WET-style corpora where no html anchors exist: one row per
    ``http(s)://`` mention, ``(id, pos, url)`` with ``pos`` the
    1-based mention index within the document.

    Frozen rule (:data:`TEXT_URL_RE`, shared with the SQL mirror):
    a mention runs until whitespace or one of ``< > " ' ) ]``.  One
    vectorized ``extractall``, zero shuffles; feed the urls to
    :func:`crawldiff.crawl_frontier` / the canonicalize family."""

    def batch(b: pd.DataFrame) -> pd.DataFrame:
        t = b[text_col].fillna("").astype(str)
        m = t.str.extractall("(" + TEXT_URL_RE + ")")
        if not len(m):
            return pd.DataFrame({
                id_col: pd.Series([], dtype=b[id_col].dtype),
                "pos": pd.Series([], dtype="int64"),
                "url": pd.Series([], dtype=object)})
        doc_idx = m.index.get_level_values(0).to_numpy()
        out = pd.DataFrame({
            id_col: b[id_col].to_numpy()[doc_idx],
            "url": m[0].to_numpy(),
        })
        out["pos"] = out.groupby(id_col, sort=False).cumcount() + 1
        return out[[id_col, "pos", "url"]]

    return ds.map_batches(batch, batch_format="pandas")


def text_url_mentions_oracle_sql(
    table: str = "documents",
    *,
    id_col: str = "doc_id",
    text_expr: str = "text",
) -> str:
    """DuckDB mirror of :func:`text_url_mentions`."""
    rx = TEXT_URL_RE.replace("'", "''")
    return f"""
WITH s AS (
  SELECT {id_col},
         regexp_extract_all(coalesce({text_expr}, ''), '{rx}') AS us
  FROM {table}
), q AS (
  SELECT {id_col}, unnest(us) AS url,
         unnest(range(1, len(us) + 1)) AS idx
  FROM s
)
SELECT {id_col}, CAST(idx AS BIGINT) AS pos, url FROM q
"""
