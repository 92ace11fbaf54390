"""Exact-substring deduplication: find and remove k-token spans whose
exact text occurs multiple times across the corpus (the token-level
"ExactSubstr" dedup of Lee et al. 2022, "Deduplicating Training Data
Makes Language Models Better" — public paper).  Doc-level near-dup
(minhash/simhash) misses boilerplate shared by otherwise-distinct pages;
this catches it.

Scale shape:

* Tokenize + window per batch (narrow).  ``key="hash"`` (the scale mode)
  ships only ``(uint64 shingle hash, id, pos)`` rows into ONE bucketed
  shuffle — texts never move; the rolling polynomial reuses the dedup
  kernels' vectorized family.  ``key="text"`` ships the literal k-word
  shingle string instead: exact (collision-free) and byte-parity with the
  DuckDB oracle — the driver-checked mode.
* Duplicate detection is a per-bucket grouped size filter; output is
  ``(id, pos)`` rows only.
* Span REMOVAL cogroups those positions back to the documents with the
  same tag-union-bucket pattern the aligner uses (one more bucketed
  shuffle keyed by id; position rows are small — only duplicated windows).

Positions are 1-based token indices (SQL ``range(1, len-k+2)`` parity).
Removal works in token space: cleaned text is the kept tokens joined by
single spaces (tokenization is ``[a-z0-9]+`` on lowercased text, so
original casing/punctuation does not survive — document-level policy
decides whether to keep the original or the cleaned column).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from ray.data import Dataset

from pdf_extract_ray.stages.agg import bucketed_group_apply

_WORD_RE = re.compile(r"[a-z0-9]+")
_C = np.uint64(0x9E3779B97F4A7C15)


def _tokenize(texts) -> tuple[list[list[str]], np.ndarray]:
    toks = [_WORD_RE.findall((t or "").lower()) for t in texts]
    lens = np.fromiter((len(x) for x in toks), dtype=np.int64,
                       count=len(toks))
    return toks, lens


def _window_index(lens: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(doc_index, 1-based pos) for every k-window fully inside a doc."""
    nwin = np.maximum(lens - k + 1, 0)
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), nwin)
    total = int(nwin.sum())
    starts = np.cumsum(nwin) - nwin
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, nwin) + 1
    return doc_idx, pos


def shingle_rows(texts, k: int, key: str) -> pd.DataFrame:
    """One row per k-token window: ``g`` (shingle key), ``__doc`` (index
    into ``texts``), ``pos`` (1-based)."""
    toks, lens = _tokenize(texts)
    doc_idx, pos = _window_index(lens, k)
    if key == "text":
        g = [" ".join(toks[d][p - 1 : p - 1 + k])
             for d, p in zip(doc_idx, pos)]
        return pd.DataFrame({"g": g, "__doc": doc_idx, "pos": pos})
    if key != "hash":
        raise ValueError(f"key must be 'text' or 'hash', got {key!r}")
    total = int(lens.sum())
    flat = np.empty(total, dtype=object)
    i = 0
    for x in toks:
        flat[i : i + len(x)] = x
        i += len(x)
    if total < k:
        return pd.DataFrame({"g": np.empty(0, np.uint64),
                             "__doc": doc_idx[:0], "pos": pos[:0]})
    th = pd.util.hash_pandas_object(
        pd.Series(flat), index=False).to_numpy().astype(np.uint64)
    did = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    with np.errstate(over="ignore"):
        acc = np.zeros(total - k + 1, dtype=np.uint64)
        for j in range(k):
            acc = (acc + th[j : total - k + 1 + j]) * _C
    ok = did[: total - k + 1] == did[k - 1 :]
    return pd.DataFrame({"g": acc[ok], "__doc": doc_idx, "pos": pos})


def dup_shingle_positions(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    key: str = "hash",
    min_count: int = 2,
    num_buckets: int | None = None,
) -> Dataset:
    """(id, pos) of every k-token window whose shingle occurs at least
    ``min_count`` times corpus-wide (same-doc repeats count).  One
    bucketed shuffle of (key, id, pos) rows."""

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        rows = shingle_rows(batch[text_col].tolist(), k, key)
        rows[id_col] = batch[id_col].to_numpy()[rows["__doc"].to_numpy()]
        return rows[["g", id_col, "pos"]]

    rows = ds.map_batches(explode, batch_format="pandas")

    def dups(bucket: pd.DataFrame) -> pd.DataFrame:
        sizes = bucket.groupby("g", sort=False)["g"].transform("size")
        return bucket.loc[sizes >= min_count, [id_col, "pos"]]

    # narrow rows (hash/short-shingle + id + pos): coalesce the tiny
    # upstream blocks so the all-to-all's fixed cost doesn't dominate
    return bucketed_group_apply(rows, ["g"], dups, num_buckets=num_buckets,
                                pre_batch_size=65536)


def merge_spans(positions, k: int) -> list[tuple[int, int]]:
    """Sorted 1-based window starts -> merged half-open token intervals
    [start, end) covering every duplicated window."""
    out: list[tuple[int, int]] = []
    for p in sorted(set(int(x) for x in positions)):
        s, e = p, p + k
        if out and s <= out[-1][1]:
            out[-1] = (out[-1][0], max(out[-1][1], e))
        else:
            out.append((s, e))
    return out


def remove_spans(tokens: list[str], spans: list[tuple[int, int]]) -> list[str]:
    """Tokens outside the (1-based, half-open) intervals."""
    if not spans:
        return tokens
    drop = np.zeros(len(tokens), dtype=bool)
    for s, e in spans:
        drop[s - 1 : e - 1] = True
    return [t for t, d in zip(tokens, drop) if not d]


def dedup_substrings(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    key: str = "hash",
    min_count: int = 2,
    num_buckets: int | None = None,
) -> Dataset:
    """Remove every duplicated k-token span from every document:
    (id, cleaned_text, n_tokens, n_removed_tokens).  Two bucketed
    shuffles total (shingle groups, then id cogroup); only duplicated
    positions — not texts — travel through the second."""
    pos = dup_shingle_positions(
        ds, id_col=id_col, text_col=text_col, k=k, key=key,
        min_count=min_count, num_buckets=num_buckets)

    def tag_docs(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: b[id_col], "__text": b[text_col].fillna(""),
            "__pos": np.int64(-1)})

    def tag_pos(b: pd.DataFrame) -> pd.DataFrame:
        # "" (not None) keeps the union's Arrow schema string-typed
        return pd.DataFrame({
            id_col: b[id_col], "__text": "",
            "__pos": b["pos"].astype(np.int64)})

    u = ds.map_batches(tag_docs, batch_format="pandas").union(
        pos.map_batches(tag_pos, batch_format="pandas"))

    def rebuild(bucket: pd.DataFrame) -> pd.DataFrame:
        out = []
        for did, g in bucket.groupby(id_col, sort=False):
            texts = g.loc[g["__pos"] == -1, "__text"]
            if not len(texts):  # positions for an id outside ds: ignore
                continue
            toks = _WORD_RE.findall((texts.iloc[0] or "").lower())
            starts = g.loc[g["__pos"] > 0, "__pos"].tolist()
            kept = remove_spans(toks, merge_spans(starts, k))
            out.append((did, " ".join(kept), len(toks),
                        len(toks) - len(kept)))
        return pd.DataFrame(
            out, columns=[id_col, "cleaned_text", "n_tokens",
                          "n_removed_tokens"])

    return bucketed_group_apply(u, [id_col], rebuild,
                                num_buckets=num_buckets)


def dup_shingles_oracle_sql(table: str = "documents", *,
                            id_col: str = "doc_id", text_col: str = "text",
                            k: int = 8, min_count: int = 2) -> str:
    """DuckDB SQL equal to :func:`dup_shingle_positions` with
    ``key="text"`` (exact string shingles, 1-based positions)."""
    return f"""
WITH s AS (
  SELECT {id_col},
         regexp_extract_all(lower(coalesce({text_col}, '')), '[a-z0-9]+')
           AS arr
  FROM {table}
), p AS (
  SELECT {id_col}, unnest(range(1, len(arr) - {k} + 2)) AS pos, arr
  FROM s WHERE len(arr) >= {k}
), sh AS (
  SELECT {id_col}, pos,
         array_to_string(arr[pos : pos + {k} - 1], ' ') AS g
  FROM p
), d AS (
  SELECT g FROM sh GROUP BY g HAVING count(*) >= {min_count}
)
SELECT sh.{id_col}, sh.pos FROM sh JOIN d USING (g)
"""


# ---------------------------------------------------------------------------
# content-defined chunking (CDC) dedup — the backup-system granularity
# (Muthitacharoen et al. 2001 LBFS; FastCDC, Xia et al. 2016 — public
# papers): chunk boundaries follow CONTENT (a rolling hash hitting a
# mask), so an insertion early in a page shifts only one chunk instead
# of re-aligning every fixed-width window — recrawl storage and
# transfer dedup as well as shared-passage detection.
# ---------------------------------------------------------------------------

_CDC_WINDOW = 8
_CDC_PRIME = np.uint64(1_000_003)


def cdc_boundaries(data: bytes, *, mask: int = 63,
                   min_len: int = 16, max_len: int = 4096) -> list[int]:
    """Frozen chunking rule: end a chunk after byte i when the
    polynomial rolling hash of the last ``_CDC_WINDOW`` bytes satisfies
    ``h % (mask+1) == 0`` and the chunk has >= ``min_len`` bytes, or at
    ``max_len``.  Returns end offsets (exclusive), last = len(data).
    Vectorized: ONE sliding-window matmul over the byte array (uint64
    wraparound arithmetic = the modulus), then a linear boundary sweep
    over candidate positions only."""
    n = len(data)
    if n == 0:
        return []
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    if n < _CDC_WINDOW:
        return [n]
    from numpy.lib.stride_tricks import sliding_window_view

    pows = _CDC_PRIME ** np.arange(_CDC_WINDOW - 1, -1, -1,
                                   dtype=np.uint64)
    h = (sliding_window_view(arr, _CDC_WINDOW) * pows).sum(axis=1)
    # candidate boundary AFTER byte (i + _CDC_WINDOW - 1)
    cand = np.flatnonzero(h % np.uint64(mask + 1) == 0) \
        + (_CDC_WINDOW - 1) + 1
    out, start = [], 0
    for c in cand.tolist():
        if c - start >= min_len:
            # honor max_len splits that precede this candidate
            while c - start > max_len:
                start += max_len
                out.append(start)
            out.append(c)
            start = c
    while n - start > max_len:
        start += max_len
        out.append(start)
    if start < n:
        out.append(n)
    return out


def cdc_chunk_rows(texts, *, mask: int = 63, min_len: int = 16,
                   max_len: int = 4096) -> pd.DataFrame:
    """(doc index, pos, chunk md5 hex, chunk byte length) rows for a
    list of texts (utf-8 bytes), via :func:`cdc_boundaries`."""
    import hashlib

    rows = {"__doc": [], "pos": [], "h": [], "clen": []}
    for i, t in enumerate(texts):
        data = ("" if t is None else str(t)).encode("utf-8")
        start = 0
        for p, end in enumerate(cdc_boundaries(
                data, mask=mask, min_len=min_len, max_len=max_len), 1):
            rows["__doc"].append(i)
            rows["pos"].append(p)
            rows["h"].append(hashlib.md5(data[start:end]).hexdigest())
            rows["clen"].append(end - start)
            start = end
    return pd.DataFrame({
        "__doc": pd.Series(rows["__doc"], dtype="int64"),
        "pos": pd.Series(rows["pos"], dtype="int64"),
        "h": pd.Series(rows["h"], dtype="object"),
        "clen": pd.Series(rows["clen"], dtype="int64"),
    })


def cdc_dedup_stats(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    mask: int = 63,
    min_len: int = 16,
    max_len: int = 4096,
    num_buckets: int | None = None,
):
    """Per-document CDC dedup report: ``(id, n_chunks, n_bytes,
    n_dup_chunks, dup_bytes)`` where a chunk is duplicated when its
    md5 occurs >= 2 times corpus-wide (multiset: every occurrence of a
    shared chunk counts, including the first — the storage-dedup view).

    Scale shape (the exact-substring plan): narrow chunk explode
    per batch; ONE bucketed shuffle of (hash, id, len) rows for the
    corpus-wide frequency; per-doc sums reduce map-side in a second
    narrow grouped merge — bodies never move after the explode."""
    from pdf_extract_ray.stages.agg import bucketed_group_apply, grouped_aggregate

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        rows = cdc_chunk_rows(b[text_col].tolist(), mask=mask,
                              min_len=min_len, max_len=max_len)
        rows[id_col] = b[id_col].to_numpy()[rows["__doc"].to_numpy()]
        return rows[[id_col, "h", "clen"]]

    rows = ds.map_batches(explode, batch_format="pandas")

    def flag(bucket: pd.DataFrame) -> pd.DataFrame:
        sizes = bucket.groupby("h", sort=False)["h"].transform("size")
        out = pd.DataFrame({
            id_col: bucket[id_col].to_numpy(),
            "n_chunks": np.int64(1),
            "n_bytes": bucket["clen"].to_numpy(np.int64),
            "n_dup_chunks": (sizes >= 2).to_numpy(np.int64),
            "dup_bytes": np.where(sizes >= 2,
                                  bucket["clen"].to_numpy(np.int64), 0),
        })
        return out

    flagged = bucketed_group_apply(rows, ["h"], flag,
                                   num_buckets=num_buckets,
                                   pre_batch_size=65536)
    return grouped_aggregate(
        flagged, [id_col],
        {c: (c, "sum") for c in ("n_chunks", "n_bytes",
                                 "n_dup_chunks", "dup_bytes")},
        num_buckets=num_buckets)
