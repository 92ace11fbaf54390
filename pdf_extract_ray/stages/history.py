"""SCD-2 url version history — the crawl-refresh lineage primitive:
given every snapshot of every url across crawls, collapse consecutive
identical contents and emit one row per *version* with its validity
interval::

    (url, version_no, content_hash, valid_from, valid_to, is_current)

This is the slowly-changing-dimension (type 2) build over a crawl
archive: ``dedup_keep_latest`` answers "what is the page now",
``crawl_diff`` answers "what moved between two crawls"; this operator
answers "what did the page look like at time T" for the WHOLE archive
(point-in-time training-corpus reconstruction, change-frequency priors
for recrawl scheduling).

Scale shape: page bodies are content-hashed in a narrow map and never
shuffle — only ``(url, ts, 32-char hash)`` rows cross the ONE bucketed
exchange keyed by url.  All snapshots of a url land in one bucket, so
the in-bucket collapse (sort by ts, drop rows whose hash equals the
previous row's, number the survivors, LEAD the next change time) is a
complete, vectorized implementation: one ``sort_values`` + two grouped
``shift``/``cumcount`` passes over the whole bucket, never per-url
Python.

Frozen rules (mirrored by the SQL oracle in ``__ray_entry__``):
* content hash is ``md5(utf-8(content))`` hex; NULL content hashes as
  the empty string (``method="fast"`` swaps the vectorized numpy hash
  for production scale — same shape, not SQL-parity);
* snapshots of one url are ordered by ``(ts, content_hash)`` — the
  hash tiebreak makes duplicate-timestamp inputs deterministic;
* a version starts at every snapshot whose hash differs from the
  previous snapshot's (the first snapshot always starts version 1);
* ``valid_to`` is the NEXT version's ``valid_from`` (NULL for the
  current version — half-open intervals ``[from, to)``).

Reference parity: the reference engine re-extracts every crawl from
scratch and keeps no history (main.py's per-run output dirs); this is
the from-scratch archive-aware replacement.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset

from pdf_extract_ray.stages.agg import bucketed_group_apply
from pdf_extract_ray.stages.crawldiff import _fast_hex, _md5_hex


def url_version_history(
    snapshots: Dataset,
    *,
    url_col: str = "url",
    ts_col: str = "ts",
    content_col: str = "text",
    method: str = "md5",
    num_buckets: int | None = None,
) -> Dataset:
    """``(url, version_no, content_hash, valid_from, valid_to,
    is_current)`` — one row per distinct consecutive content version."""
    if method not in ("md5", "fast"):
        raise ValueError(f"method must be 'md5' or 'fast', got {method!r}")
    hash_fn = _md5_hex if method == "md5" else _fast_hex

    def to_hashes(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "url": b[url_col].to_numpy(),
            "ts": b[ts_col].to_numpy(),
            "content_hash": hash_fn(b[content_col]).to_numpy(),
        })

    hashed = snapshots.map_batches(to_hashes, batch_format="pandas")
    return bucketed_group_apply(
        hashed, ["url"], collapse_versions,
        num_buckets=num_buckets, pre_batch_size=16384,
    )


def collapse_versions(g: pd.DataFrame) -> pd.DataFrame:
    """Vectorized version collapse over COMPLETE url groups of
    ``(url, ts, content_hash)`` rows (the frozen rules above) — the
    shared body of :func:`url_version_history` and the resumable
    per-bucket builder (``pipelines.history.history_run``)."""
    g = g.sort_values(["url", "ts", "content_hash"], kind="mergesort")
    prev = g.groupby("url")["content_hash"].shift(1)
    starts = g.loc[prev.isna() | (prev != g["content_hash"])]
    grp = starts.groupby("url")
    version_no = (grp.cumcount() + 1).to_numpy(np.int64)
    valid_to = grp["ts"].shift(-1)
    return pd.DataFrame({
        "url": starts["url"].to_numpy(),
        "version_no": version_no,
        "content_hash": starts["content_hash"].to_numpy(),
        "valid_from": starts["ts"].to_numpy(),
        "valid_to": valid_to.to_numpy(),
        "is_current": valid_to.isna().to_numpy(),
    })


def version_change_stats(
    history: Dataset,
    *,
    url_col: str = "url",
) -> Dataset:
    """Per-url change-frequency rollup over a version history:
    ``(url, n_versions, first_seen, last_change)`` — the recrawl-
    scheduling prior (hot pages get short revisit intervals).  One
    small grouped merge over the already-narrow history rows."""
    from pdf_extract_ray.stages.agg import grouped_aggregate

    return grouped_aggregate(
        history, [url_col],
        {"n_versions": ("version_no", "max"),
         "first_seen": ("valid_from", "min"),
         "last_change": ("valid_from", "max")},
    )


def update_version_history(
    history: Dataset,
    snapshot: Dataset,
    *,
    url_col: str = "url",
    ts_col: str = "ts",
    content_col: str = "text",
    method: str = "md5",
    num_buckets: int | None = None,
) -> Dataset:
    """Incremental SCD-2 maintenance: fold ONE new crawl into an
    existing version history without reprocessing the archive —
    byte-identical to rebuilding :func:`url_version_history` over all
    snapshots (pytest-proven), but the work is proportional to the NEW
    crawl, not to history depth.

    Per url: if the new content hash equals the current (open)
    version's hash, the history row passes through unchanged; otherwise
    the open interval closes at the new snapshot's ts and a fresh
    version (``max(version_no) + 1``) opens.  Urls never seen before
    start at version 1.

    Frozen precondition (documented, asserted nowhere — the caller owns
    crawl ordering): every new snapshot's ts is strictly greater than
    every existing ``valid_from`` of its url, and the new crawl has at
    most one row per (url, ts) after the same ``(ts, hash)`` tiebreak
    as the full build.  Multiple rows per url in the new crawl are
    handled by the same collapse rule (sorted by ts then hash).

    Scale shape: new bodies hash in a narrow map; ONE bucketed cogroup
    by url moves only history rows + ``(url, ts, hash)`` news — at
    10^12 urls the history side is the big one, but it is already the
    narrow version table, never page bodies.
    """
    if method not in ("md5", "fast"):
        raise ValueError(f"method must be 'md5' or 'fast', got {method!r}")
    hash_fn = _md5_hex if method == "md5" else _fast_hex

    def to_hashes(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "url": b[url_col].to_numpy(),
            "ts": b[ts_col].to_numpy(),
            "content_hash": hash_fn(b[content_col]).to_numpy(),
        })

    new_hashes = snapshot.map_batches(to_hashes, batch_format="pandas")

    def tag_hist(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__side"] = np.int8(0)
        b["ts"] = pd.NaT
        return b

    def tag_new(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "url": b["url"].to_numpy(),
            "version_no": np.int64(0),
            "content_hash": b["content_hash"].to_numpy(),
            "valid_from": pd.NaT,
            "valid_to": pd.NaT,
            "is_current": False,
            "__side": np.int8(1),
            "ts": b["ts"].to_numpy(),
        })

    u = (history.map_batches(tag_hist, batch_format="pandas")
         .union(new_hashes.map_batches(tag_new, batch_format="pandas")))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        hist = g[g["__side"] == 0]
        news = g[g["__side"] == 1]
        out_cols = ["url", "version_no", "content_hash",
                    "valid_from", "valid_to", "is_current"]
        if not len(news):
            return hist[out_cols]
        # current open version per url (absent for never-seen urls),
        # prepended as a VIRTUAL row so the standard consecutive-
        # duplicate collapse applies relative to the open version's hash
        cur = hist.loc[hist["is_current"],
                       ["url", "version_no", "content_hash"]]
        virt = pd.DataFrame({
            "url": cur["url"].to_numpy(),
            "ts": pd.NaT, "content_hash": cur["content_hash"].to_numpy(),
            "__ord": np.int8(0),
        })
        nn = pd.DataFrame({
            "url": news["url"].to_numpy(), "ts": news["ts"].to_numpy(),
            "content_hash": news["content_hash"].to_numpy(),
            "__ord": np.int8(1),
        })
        allr = pd.concat([virt, nn], ignore_index=True).sort_values(
            ["url", "__ord", "ts", "content_hash"], kind="mergesort")
        prev = allr.groupby("url")["content_hash"].shift(1)
        starts = allr.loc[(prev.isna() | (prev != allr["content_hash"]))
                          & (allr["__ord"] == 1)]

        hist_out = hist[out_cols]
        if not len(starts):
            return hist_out
        grp = starts.groupby("url")
        base = cur.set_index("url")["version_no"]
        ver = (grp.cumcount().to_numpy(np.int64) + 1
               + base.reindex(starts["url"]).fillna(0)
               .to_numpy(np.int64))
        valid_to = grp["ts"].shift(-1)
        fresh = pd.DataFrame({
            "url": starts["url"].to_numpy(),
            "version_no": ver,
            "content_hash": starts["content_hash"].to_numpy(),
            "valid_from": starts["ts"].to_numpy(),
            "valid_to": valid_to.to_numpy(),
            "is_current": valid_to.isna().to_numpy(),
        })
        # close the open interval of every url that gained a version
        first_ts = grp["ts"].min()
        closing = hist_out["url"].map(first_ts)
        hit = closing.notna() & hist_out["is_current"]
        if hit.any():
            hist_out = hist_out.copy()
            hist_out.loc[hit, "valid_to"] = closing[hit]
            hist_out.loc[hit, "is_current"] = False
        return pd.concat([hist_out, fresh], ignore_index=True)

    return bucketed_group_apply(u, ["url"], merge,
                                num_buckets=num_buckets)


def snapshot_asof(
    history: Dataset,
    asof,
    *,
    url_col: str = "url",
) -> Dataset:
    """Point-in-time corpus reconstruction: the version of every url
    that was live at ``asof`` (half-open intervals: ``valid_from <=
    asof < valid_to``).  Pure narrow filter over the version table —
    zero shuffles, streams at any scale."""
    asof = pd.Timestamp(asof)

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        live = (b["valid_from"] <= asof) & (
            b["valid_to"].isna() | (b["valid_to"] > asof))
        b = b.loc[live]
        return pd.DataFrame({
            url_col: b[url_col].to_numpy(),
            "version_no": b["version_no"].to_numpy(np.int64),
            "content_hash": b["content_hash"].to_numpy(),
        })

    return history.map_batches(pick, batch_format="pandas")
