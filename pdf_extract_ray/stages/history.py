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

    def collapse(g: pd.DataFrame) -> pd.DataFrame:
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

    hashed = snapshots.map_batches(to_hashes, batch_format="pandas")
    return bucketed_group_apply(
        hashed, ["url"], collapse,
        num_buckets=num_buckets, pre_batch_size=16384,
    )


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
