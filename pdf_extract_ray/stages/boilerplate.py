"""Corpus-wide duplicated-LINE removal — the line-level dedup step of
CCNet / RefinedWeb-style web cleaning (Wenzek et al. 2019 §3.1; Penedo
et al. 2023 "The RefinedWeb Dataset" — public papers): navigation menus,
cookie banners and footers repeat verbatim across pages; any line whose
stripped form occurs at least ``min_count`` times corpus-wide is
boilerplate and is dropped from every document.

Semantics (frozen, SQL-mirrorable):

* lines = ``text.split("\\n")``, 1-based positions;
* match key = the line stripped of Python whitespace (``str.strip()``;
  the oracle passes the same char set to ``trim``);
* empty stripped lines never count as duplicates (else every blank line
  is boilerplate) and are always kept;
* cleaned text = the kept ORIGINAL lines re-joined with ``"\\n"``.

Scale shape (same two-shuffle plan as exact-substring dedup):

* per-batch line explode (vectorized pandas split/explode, narrow);
* ONE bucketed shuffle of ``(key, id, pos)`` rows for the corpus-wide
  frequency — ``key="hash"`` ships uint64 line hashes (scale mode),
  ``key="text"`` ships literal stripped lines (collision-free,
  SQL-parity, the driver-checked mode); texts never move;
* duplicated ``(id, pos)`` rows — only those — cogroup back to the
  documents through the tag-union-bucket pattern for removal.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset

from pdf_extract_ray.stages.agg import bucketed_group_apply
from pdf_extract_ray.util import PY_WS


def _line_rows(texts, key: str, sep: str = "\n") -> pd.DataFrame:
    """(g, __doc, pos) for every non-empty-stripped segment (lines by
    default; pass sep="\n\n" for paragraph-level dedup — the other
    granularity CCNet-family pipelines run)."""
    s = pd.Series(texts).fillna("").str.split(sep)
    ex = s.explode()
    pos = ex.groupby(level=0).cumcount() + 1
    stripped = ex.str.strip()
    keep = stripped != ""
    df = pd.DataFrame({
        "g": stripped[keep].to_numpy(),
        "__doc": ex.index[keep].to_numpy(),
        "pos": pos[keep].to_numpy(dtype=np.int64),
    })
    if key == "hash":
        df["g"] = (pd.util.hash_pandas_object(df["g"], index=False)
                   .to_numpy().astype(np.uint64))
    elif key != "text":
        raise ValueError(f"key must be 'text' or 'hash', got {key!r}")
    return df


def dup_line_positions(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    key: str = "hash",
    min_count: int = 2,
    num_buckets: int | None = None,
    sep: str = "\n",
    group_col: str | None = None,
) -> Dataset:
    """(id, pos) of every segment (line by default, paragraph with
    sep="\n\n") whose stripped form occurs at least ``min_count``
    times corpus-wide — or, with ``group_col`` (e.g. the canonical
    url host), at least ``min_count`` times WITHIN that group: the
    host-scoped boilerplate rule of CCNet-family cleaners, where a
    nav line repeated across one site is chrome but the same words
    on an unrelated site are content."""

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        rows = _line_rows(batch[text_col].tolist(), key, sep)
        idx = rows["__doc"].to_numpy()
        rows[id_col] = batch[id_col].to_numpy()[idx]
        cols = ["g", id_col, "pos"]
        if group_col is not None:
            rows[group_col] = batch[group_col].to_numpy()[idx]
            cols.append(group_col)
        return rows[cols]

    rows = ds.map_batches(explode, batch_format="pandas")
    freq_keys = ["g"] if group_col is None else [group_col, "g"]

    def dups(bucket: pd.DataFrame) -> pd.DataFrame:
        sizes = bucket.groupby(freq_keys, sort=False)["g"].transform("size")
        return bucket.loc[sizes >= min_count, [id_col, "pos"]]

    # Bucketing by the segment key alone already co-locates every
    # (group, key) pair for that key, so the group-scoped count is
    # complete inside one bucket.
    return bucketed_group_apply(rows, ["g"], dups, num_buckets=num_buckets,
                                pre_batch_size=65536)


def dedup_lines(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    key: str = "hash",
    min_count: int = 2,
    num_buckets: int | None = None,
    sep: str = "\n",
    group_col: str | None = None,
) -> Dataset:
    """Remove corpus-wide duplicated segments (lines by default,
    paragraphs with sep="\n\n") from every document:
    ``(id, cleaned_text, n_lines, n_removed_lines)``.  With
    ``group_col``, duplication is counted within the group (the
    host-scoped boilerplate rule)."""
    pos = dup_line_positions(
        ds, id_col=id_col, text_col=text_col, key=key,
        min_count=min_count, num_buckets=num_buckets, sep=sep,
        group_col=group_col)

    def tag_docs(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: b[id_col], "__text": b[text_col].fillna(""),
            "__pos": np.int64(-1)})

    def tag_pos(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: b[id_col], "__text": "",
            "__pos": b["pos"].astype(np.int64)})

    u = ds.map_batches(tag_docs, batch_format="pandas").union(
        pos.map_batches(tag_pos, batch_format="pandas"))

    def rebuild(bucket: pd.DataFrame) -> pd.DataFrame:
        out = []
        for did, g in bucket.groupby(id_col, sort=False):
            texts = g.loc[g["__pos"] == -1, "__text"]
            if not len(texts):
                continue
            lines = (texts.iloc[0] or "").split(sep)
            drop = set(g.loc[g["__pos"] > 0, "__pos"].tolist())
            kept = [ln for i, ln in enumerate(lines, 1) if i not in drop]
            out.append((did, sep.join(kept), len(lines),
                        len(lines) - len(kept)))
        return pd.DataFrame(
            out, columns=[id_col, "cleaned_text", "n_lines",
                          "n_removed_lines"])

    return bucketed_group_apply(u, [id_col], rebuild,
                                num_buckets=num_buckets)


def dedup_lines_oracle_sql(
    table: str = "documents",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    sep_sql: str = "chr(10)",
    group_col: str | None = None,
) -> str:
    """DuckDB SQL equal to :func:`dedup_lines` with ``key="text"``
    (``sep_sql="chr(10) || chr(10)"`` mirrors the paragraph mode;
    ``group_col`` mirrors the group-scoped frequency rule — the
    source ``table`` must expose that column)."""
    ws = PY_WS.replace("'", "''")
    gsel = f", {group_col}" if group_col else ""
    gkeys = f"{group_col}, key" if group_col else "key"
    return f"""
WITH s AS (
  SELECT {id_col}{gsel},
         string_split(coalesce({text_col}, ''), {sep_sql}) AS ls
  FROM {table}
), p AS (
  SELECT {id_col}{gsel}, unnest(ls) AS line,
         unnest(range(1, len(ls) + 1)) AS pos
  FROM s
), t AS (
  SELECT {id_col}{gsel}, pos, line, trim(line, '{ws}') AS key FROM p
), d AS (
  SELECT {gkeys} FROM t WHERE key <> ''
  GROUP BY {gkeys} HAVING count(*) >= {min_count}
), kept AS (
  SELECT t.{id_col}, t.pos, t.line
  FROM t LEFT JOIN d USING ({gkeys}) WHERE d.key IS NULL
), agg AS (
  SELECT {id_col},
         string_agg(line, {sep_sql} ORDER BY pos) AS cleaned_text,
         CAST(count(*) AS BIGINT) AS n_kept
  FROM kept GROUP BY {id_col}
), tot AS (
  SELECT {id_col}, CAST(len(ls) AS BIGINT) AS n_lines FROM s
)
SELECT tot.{id_col},
       coalesce(agg.cleaned_text, '') AS cleaned_text,
       tot.n_lines,
       tot.n_lines - coalesce(agg.n_kept, 0) AS n_removed_lines
FROM tot LEFT JOIN agg USING ({id_col})
"""


def dedup_doc_lines_arrays(texts: pd.Series):
    """Vectorized keep-first within-doc line dedup over one Series ->
    ``(cleaned, n_lines, n_kept)`` arrays.  Shared by the standalone
    dataset op and the fused webtext-pipeline flag."""
    t = texts.fillna("").astype(str)
    ls = t.str.split("\n")
    n_lines = ls.str.len().to_numpy(np.int64)
    ex = pd.DataFrame({
        "__i": np.repeat(np.arange(len(t)), n_lines),
        "line": np.concatenate(ls.to_numpy()) if len(t) else
                np.array([], dtype=object),
    })
    kept = ex.drop_duplicates(["__i", "line"], keep="first")
    agg = kept.groupby("__i", sort=True)["line"].agg("\n".join)
    cleaned = np.full(len(t), "", dtype=object)
    cleaned[agg.index.to_numpy()] = agg.to_numpy()
    n_kept = np.zeros(len(t), dtype=np.int64)
    cnt = kept.groupby("__i", sort=True).size()
    n_kept[cnt.index.to_numpy()] = cnt.to_numpy()
    return cleaned, n_lines, n_kept


def dedup_lines_in_doc(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """WITHIN-document duplicated-line removal — keep only the FIRST
    occurrence of each exact line inside each document (the per-document
    "remove repeated lines" cleaning of Gopher-family pipelines, Rae et
    al. 2021 §A1.1; complements the corpus-wide :func:`dedup_lines`).

    Semantics (frozen, SQL-mirrorable): lines = ``text.split("\\n")``
    with 1-based positions; a line is kept iff no EQUAL line (exact
    bytes, no stripping) occurs earlier in the same document; cleaned
    text = kept lines re-joined with ``"\\n"``.  Empty lines dedup like
    any other line (repeated blank separators collapse to the first).

    Scale shape: ONE narrow map — the duplicate test never leaves the
    document, so there is no shuffle at all; the per-batch kernel is
    vectorized pandas (split / explode / drop_duplicates / groupby-agg).
    """

    def clean(b: pd.DataFrame) -> pd.DataFrame:
        cleaned, n_lines, n_kept = dedup_doc_lines_arrays(b[text_col])
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(),
            "cleaned_text": cleaned,
            "n_lines": n_lines,
            "n_removed_lines": n_lines - n_kept,
        })

    return ds.map_batches(clean, batch_format="pandas")


def dedup_lines_in_doc_oracle_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror of :func:`dedup_lines_in_doc` (row_number over
    (doc, line) picks the first occurrence; positions re-join in input
    order)."""
    return f"""
WITH s AS (
  SELECT {id_col},
         string_split(coalesce({text_col}, ''), chr(10)) AS ls
  FROM {table}
), p AS (
  SELECT {id_col}, unnest(ls) AS line,
         unnest(range(1, len(ls) + 1)) AS pos
  FROM s
), r AS (
  SELECT {id_col}, line, pos,
         row_number() OVER (PARTITION BY {id_col}, line ORDER BY pos)
           AS rn
  FROM p
), agg AS (
  SELECT {id_col},
         string_agg(line, chr(10) ORDER BY pos) AS cleaned_text,
         CAST(count(*) AS BIGINT) AS n_kept
  FROM r WHERE rn = 1 GROUP BY {id_col}
), tot AS (
  SELECT {id_col}, CAST(len(ls) AS BIGINT) AS n_lines FROM s
)
SELECT tot.{id_col},
       coalesce(agg.cleaned_text, '') AS cleaned_text,
       tot.n_lines,
       tot.n_lines - coalesce(agg.n_kept, 0) AS n_removed_lines
FROM tot LEFT JOIN agg USING ({id_col})
"""


def host_common_prefix(
    ds: Dataset,
    *,
    group_col: str = "host",
    text_col: str = "text",
    max_len: int | None = None,
    num_buckets: int | None = None,
) -> Dataset:
    """Per-host longest-common-prefix report — the site-template
    banner detector: a host whose every page starts with the same
    chrome ("HostBanner | nav | ...") gets that prefix surfaced so a
    cleaning pass (:func:`strip_common_prefix`) can remove it.

    Algebra (the part that scales): ``lcp(S) == lcp(min(S), max(S))``
    under lexicographic order, and min/max are associative +
    commutative — so the WHOLE reduction is a standard min/max grouped
    aggregate with map-side partials; only two strings per (host,
    batch) ever shuffle, and the per-host LCP scan runs once on the
    final O(#hosts) table.  ``max_len`` truncates texts before the
    aggregate (truncation is monotone w.r.t. lexicographic order, so
    the result is exactly ``min(lcp, max_len)``) — set it at corpus
    scale to bound shuffle row width.

    Frozen rules: NULL text counts as ``""`` (forcing that host's LCP
    empty); comparison and lengths are code-point-wise (Python ==
    DuckDB semantics for UTF-8, whose byte order preserves code-point
    order).  Output: ``(group_col, n_docs, lcp_len, prefix)``.
    """
    from pdf_extract_ray.stages.agg import grouped_aggregate

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        t = b[text_col].fillna("")
        if max_len is not None:
            t = t.str.slice(0, max_len)
        return pd.DataFrame({group_col: b[group_col].to_numpy(),
                             "__t": t.to_numpy()})

    merged = grouped_aggregate(
        ds.map_batches(prep, batch_format="pandas"), [group_col],
        {"mn": ("__t", "min"), "mx": ("__t", "max"),
         "n_docs": ("__t", "count")},
        num_buckets=num_buckets)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        lens, prefs = [], []
        for mn, mx in zip(b["mn"].tolist(), b["mx"].tolist()):
            lim = min(len(mn), len(mx))
            i = 0
            while i < lim and mn[i] == mx[i]:
                i += 1
            lens.append(i)
            prefs.append(mn[:i])
        return pd.DataFrame({
            group_col: b[group_col].to_numpy(),
            "n_docs": b["n_docs"].to_numpy(np.int64),
            "lcp_len": pd.Series(lens, dtype=np.int64),
            "prefix": pd.Series(prefs, dtype=object),
        })

    return merged.map_batches(finish, batch_format="pandas")


def host_common_prefix_oracle_sql(
    table_sql: str,
    *,
    group_col: str = "host",
    text_col: str = "text",
) -> str:
    """DuckDB mirror of :func:`host_common_prefix` (same min/max
    algebra; the LCP scan is a correlated position probe)."""
    g = group_col
    return f"""
WITH __cp_g AS (
  SELECT {g}, min(coalesce({text_col}, '')) AS mn,
         max(coalesce({text_col}, '')) AS mx,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM ({table_sql}) GROUP BY {g}),
__cp_l AS (
  SELECT {g}, n_docs, mn,
    CAST(coalesce((SELECT max(i) FROM (SELECT unnest(generate_series(
           1, least(length(mn), length(mx)))) AS i)
         WHERE substr(mn, 1, i) = substr(mx, 1, i)), 0) AS BIGINT)
      AS lcp_len
  FROM __cp_g)
SELECT {g}, n_docs, lcp_len, substr(mn, 1, CAST(lcp_len AS INTEGER))
       AS prefix
FROM __cp_l
"""


def strip_common_prefix(
    ds: Dataset,
    prefixes,
    *,
    group_col: str = "host",
    text_col: str = "text",
) -> Dataset:
    """Remove each host's detected template prefix from its pages.
    ``prefixes``: the :func:`host_common_prefix` result as a pandas
    DataFrame (or any frame with ``group_col``/``prefix``) — one row
    per host, the "vertex state fits, pages don't" regime: shipped
    ONCE via ``ray.put`` and read per task, never per batch.  Rows
    whose text does not actually start with the prefix (or whose host
    has none) pass through unchanged."""
    import ray

    pref = dict(zip(prefixes[group_col], prefixes["prefix"]))
    handle = ray.put(pref)

    def strip(b: pd.DataFrame, h=handle) -> pd.DataFrame:
        p = ray.get(h)
        t = b[text_col].fillna("")
        px = b[group_col].map(p).fillna("")
        starts = np.fromiter(
            (bool(x) and s.startswith(x)
             for s, x in zip(t.tolist(), px.tolist())),
            dtype=bool, count=len(b))
        out = b.copy()
        out[text_col] = np.where(
            starts,
            [s[len(x):] for s, x in zip(t.tolist(), px.tolist())],
            t.to_numpy())
        return out

    return ds.map_batches(strip, batch_format="pandas")
