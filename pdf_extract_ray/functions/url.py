"""URL canonicalization for web-crawl pipelines: the frozen rule set a
crawler applies before using a URL as a dedup/partition key.

Rules (in order; every rule is regex/list-op based so the DuckDB oracle
mirrors it exactly):

1. trim surrounding whitespace;
2. rows that don't look like ``scheme://host...`` pass through trimmed
   (host/domain empty);
3. lowercase the scheme and the host (NEVER the path — paths are
   case-sensitive);
4. drop the default port (``:80`` for http, ``:443`` for https);
5. drop the ``#fragment``;
6. query string: split on ``&``, drop empties and tracking params
   (``utm_*``, ``fbclid``, ``gclid``), sort the rest lexicographically,
   re-join; no surviving params -> no ``?``;
7. empty path -> ``/``.

All vectorized (pandas str kernels + one explode/sort/groupby-join for
the query params); no per-row Python loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

URL_PARTS_RE = (
    r"^\s*([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?")
TRACKING_PARAM_RE = r"(utm_[A-Za-z0-9]*|fbclid|gclid)(=|$)"


def canonicalize_urls(urls: pd.Series) -> pd.DataFrame:
    """DataFrame with ``canonical_url``, ``url_host`` (lowercased host,
    port stripped) and ``url_domain`` (host minus leading ``www.``),
    index-aligned positionally with ``urls``."""
    s = urls.fillna("").astype(str).str.strip().reset_index(drop=True)
    parts = s.str.extract(URL_PARTS_RE)
    scheme = parts[0].fillna("").str.lower()
    hostport = parts[1].fillna("").str.lower()
    path = parts[2].fillna("")
    query = parts[3].fillna("")
    is_url = scheme != ""

    hostport = hostport.where(
        ~((scheme == "http") & hostport.str.endswith(":80")),
        hostport.str.replace(r":80$", "", regex=True))
    hostport = hostport.where(
        ~((scheme == "https") & hostport.str.endswith(":443")),
        hostport.str.replace(r":443$", "", regex=True))

    ex = query.str.split("&").explode()
    keep = pd.DataFrame({"i": ex.index, "p": ex})
    keep = keep[(keep["p"] != "")
                & ~keep["p"].str.match(TRACKING_PARAM_RE, na=False)]
    keep = keep.sort_values(["i", "p"], kind="mergesort")
    q2 = (keep.groupby("i")["p"].agg("&".join)
          .reindex(pd.RangeIndex(len(s))).fillna(""))

    path2 = path.where(path != "", "/")
    canon = (scheme + "://" + hostport + path2
             + np.where(q2 != "", "?" + q2, ""))
    host = hostport.str.replace(r":[0-9]+$", "", regex=True)
    domain = host.str.replace(r"^www\.", "", regex=True)
    return pd.DataFrame({
        "canonical_url": np.where(is_url, canon, s),
        "url_host": np.where(is_url, host, ""),
        "url_domain": np.where(is_url, domain, ""),
    })


def canonicalize_batch(batch: pd.DataFrame,
                       url_col: str = "url") -> pd.DataFrame:
    out = batch.reset_index(drop=True).copy()
    cols = canonicalize_urls(out[url_col])
    for c in cols.columns:
        out[c] = cols[c]
    return out


def canonicalize_oracle_sql(source_sql: str, *, url_expr: str = "url",
                            id_cols: str = "doc_id") -> str:
    """DuckDB SQL equal to :func:`canonicalize_urls` over
    ``source_sql`` rows (same regexes, same list ops, same ordering)."""
    return f"""
WITH u AS (
  SELECT {id_cols}, trim({url_expr}) AS url FROM ({source_sql})
), p AS (
  SELECT {id_cols}, url,
    lower(regexp_extract(url,
      '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme,
    lower(regexp_extract(url,
      '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)', 1)) AS hostport0,
    regexp_extract(url,
      '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*([^?#]*)', 1) AS path,
    regexp_extract(url,
      '^[A-Za-z][A-Za-z0-9+.\\-]*://[^?#]*\\?([^#]*)', 1) AS query
  FROM u
), q AS (
  SELECT {id_cols}, url, scheme, path, query,
    CASE WHEN scheme = 'http' AND hostport0 LIKE '%:80'
           THEN regexp_replace(hostport0, ':80$', '')
         WHEN scheme = 'https' AND hostport0 LIKE '%:443'
           THEN regexp_replace(hostport0, ':443$', '')
         ELSE hostport0 END AS hostport,
    array_to_string(list_sort(list_filter(string_split(query, '&'),
      x -> x <> '' AND NOT regexp_matches(x,
        '^(utm_[A-Za-z0-9]*|fbclid|gclid)(=|$)'))), '&') AS q2
  FROM p
)
SELECT {id_cols},
  CASE WHEN scheme = '' THEN url
       ELSE scheme || '://' || hostport
            || (CASE WHEN path = '' THEN '/' ELSE path END)
            || (CASE WHEN q2 <> '' THEN '?' || q2 ELSE '' END)
  END AS canonical_url,
  CASE WHEN scheme = '' THEN ''
       ELSE regexp_replace(hostport, ':[0-9]+$', '') END AS url_host,
  CASE WHEN scheme = '' THEN ''
       ELSE regexp_replace(regexp_replace(hostport, ':[0-9]+$', ''),
                           '^www\\.', '') END AS url_domain
FROM q
"""


def url_features(urls: pd.Series) -> pd.DataFrame:
    """C4-style URL quality features, fully vectorized: ``path_depth``
    (non-empty /-separated path segments), ``n_params`` (&-separated
    query parts, 0 when no ``?``), ``is_https``, ``path_len`` (chars of
    the path incl. leading slash, before ``?``/``#``).

    Frozen rules: the fragment is cut first, then the query; non-url
    strings (no ``://``) get depth/params/len 0 and is_https False.
    Narrow per-batch kernel, zero shuffles.
    """
    s = urls.fillna("").astype(str)
    is_url = s.str.contains("://", regex=False)
    no_frag = s.str.split("#", n=1).str[0]
    pre_q = no_frag.str.split("?", n=1).str[0]
    query = no_frag.str.split("?", n=1).str[1]  # NaN when no '?'
    # path = everything after the authority
    after_scheme = pre_q.str.split("://", n=1).str[1].fillna("")
    path = "/" + after_scheme.str.split("/", n=1).str[1].fillna("")
    has_path = after_scheme.str.contains("/", regex=False)
    depth = np.where(
        is_url & has_path,
        path.str.split("/").map(lambda xs: sum(1 for x in xs if x)), 0)
    # a bare trailing '?' (empty query) carries no params: ''.split('&')
    # yields [''] so the count must be masked, matching canonicalize_urls'
    # empty-param dropping and the documented "0 when no params" rule
    n_params = np.where(
        is_url & query.notna() & (query != ""),
        query.fillna("").str.split("&").str.len(), 0)
    return pd.DataFrame({
        "path_depth": depth.astype("int64"),
        "n_params": n_params.astype("int64"),
        "is_https": (is_url & s.str.lower().str.startswith(
            "https://")).to_numpy(),
        "path_len": np.where(is_url & has_path,
                             path.str.len(), 0).astype("int64"),
    }, index=urls.index)


# Frozen public-suffix SUBSET for eTLD+1 extraction: the 20 most common
# second-level public suffixes.  This is deliberately NOT the full
# Mozilla PSL (thousands of entries, updated monthly) — the operator
# documents the subset so the rule is reproducible and SQL-mirrorable;
# swap in the full list at deploy time by extending this tuple.
MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "com.tw", "com.sg", "co.za", "com.ar", "com.tr",
)


def registered_domains(hosts: pd.Series) -> pd.Series:
    """eTLD+1 (registrable domain) of each lowercased host under the
    frozen :data:`MULTI_SUFFIXES` rule: last 3 labels when the last 2
    form a listed public suffix (and a 3rd exists), else last 2 labels,
    else the host itself (single-label / empty pass through).

    Vectorized: two anchored regex extracts + one ``np.select``; the
    DuckDB mirror is :func:`registered_domain_sql_expr` (same regexes,
    same CASE order).
    """
    h = hosts.fillna("").astype(str)
    last2 = h.str.extract(r"([^.]+\.[^.]+)$")[0].fillna("")
    last3 = h.str.extract(r"([^.]+\.[^.]+\.[^.]+)$")[0].fillna("")
    return pd.Series(
        np.select(
            [last2.isin(MULTI_SUFFIXES) & (last3 != ""), last2 != ""],
            [last3, last2],
            default=h,
        ),
        index=hosts.index,
    )


def registered_domain_sql_expr(host_expr: str) -> str:
    """DuckDB expression mirroring :func:`registered_domains` over a
    lowercased-host SQL expression."""
    suf = ", ".join(f"'{s}'" for s in MULTI_SUFFIXES)
    last2 = f"regexp_extract({host_expr}, '([^.]+\\.[^.]+)$', 1)"
    last3 = f"regexp_extract({host_expr}, '([^.]+\\.[^.]+\\.[^.]+)$', 1)"
    return (f"CASE WHEN {last2} IN ({suf}) AND {last3} <> '' THEN {last3} "
            f"WHEN {last2} <> '' THEN {last2} ELSE {host_expr} END")
