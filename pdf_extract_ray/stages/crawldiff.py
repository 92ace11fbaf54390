"""Crawl snapshot diff — the incremental-crawl primitive: given two
crawls of the same corpus, classify every url as ``added`` / ``removed``
/ ``changed`` / ``unchanged`` so downstream extraction re-processes only
what moved.

Scale shape: each side is content-hashed in a narrow map (page bodies
never shuffle — only ``(url, 32-hex-char hash)`` rows move), pre-combined
map-side with the same associative rule used at the merge, then ONE
tag-union-bucket cogroup by url produces the verdicts.

Frozen rules:
* the content hash is ``md5(utf-8(content))`` hex (``method="md5"``,
  SQL-mirrorable via DuckDB's ``md5()``); ``method="fast"`` swaps in the
  vectorized numpy hash family for production scale (same shape, not
  SQL-parity);
* null content hashes as the empty string;
* duplicate urls within one snapshot resolve to the lexicographically
  MAX hash (deterministic, associative — so map-side pre-combining and
  any merge order give the same answer).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from ray.data import Dataset


def _md5_hex(values: pd.Series) -> pd.Series:
    return pd.Series(
        [hashlib.md5(("" if v is None else str(v)).encode()).hexdigest()
         for v in values],
        index=values.index,
    )


def _fast_hex(values: pd.Series) -> pd.Series:
    h = pd.util.hash_pandas_object(values.fillna("").astype(str),
                                   index=False)
    return pd.Series(np.char.mod("%016x", h.to_numpy(np.uint64)),
                     index=values.index)


def content_hashes(
    ds: Dataset,
    *,
    url_col: str = "url",
    content_col: str = "text",
    method: str = "md5",
) -> Dataset:
    """Narrow map -> ``(url, h)`` rows, pre-combined per batch with the
    frozen max-hash duplicate rule."""
    if method not in ("md5", "fast"):
        raise ValueError(f"method must be 'md5' or 'fast', got {method!r}")
    hash_fn = _md5_hex if method == "md5" else _fast_hex

    def to_hashes(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({"url": b[url_col].to_numpy(),
                          "h": hash_fn(b[content_col]).to_numpy()})
        return d.groupby("url", sort=False, as_index=False)["h"].max()

    return ds.map_batches(to_hashes, batch_format="pandas")


def crawl_diff(
    old: Dataset,
    new: Dataset,
    *,
    url_col: str = "url",
    content_col: str = "text",
    method: str = "md5",
    num_buckets: int | None = None,
) -> Dataset:
    """``(url, status, old_hash, new_hash)`` with status in
    added/removed/changed/unchanged.  One bucketed shuffle of
    (url, hash, side) rows; bodies never move."""
    from pdf_extract_ray.stages.agg import bucketed_group_apply

    def tag(side: int):
        def apply(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["side"] = np.int8(side)
            return b
        return apply

    u = (content_hashes(old, url_col=url_col, content_col=content_col,
                        method=method)
         .map_batches(tag(0), batch_format="pandas")
         .union(content_hashes(new, url_col=url_col,
                               content_col=content_col, method=method)
                .map_batches(tag(1), batch_format="pandas")))

    def body(g: pd.DataFrame) -> pd.DataFrame:
        o = g.loc[g["side"] == 0].groupby("url")["h"].max()
        n = g.loc[g["side"] == 1].groupby("url")["h"].max()
        urls = o.index.union(n.index)  # sorted within the bucket
        oh, nh = o.reindex(urls), n.reindex(urls)
        status = np.where(
            oh.isna(), "added",
            np.where(nh.isna(), "removed",
                     np.where(oh.to_numpy() == nh.to_numpy(),
                              "unchanged", "changed")))
        return pd.DataFrame({
            "url": urls.to_numpy(),
            "status": status,
            "old_hash": oh.where(oh.notna(), None).to_numpy(object),
            "new_hash": nh.where(nh.notna(), None).to_numpy(object),
        })

    return bucketed_group_apply(u, ["url"], body, num_buckets=num_buckets)
