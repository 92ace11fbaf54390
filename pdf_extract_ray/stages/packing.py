"""Sequence packing assignment — the training-prep step that decides
where every document lands in the fixed-length training sequences
(GPT-style concat-and-chunk: documents are concatenated in a frozen
order and sliced every ``seq_len`` tokens, so no padding is wasted and
documents may straddle pack boundaries).

Frozen semantics:
* ``bucket = id % num_buckets`` — packing is independent per bucket, so
  buckets are the distribution unit AND the shard a training job reads;
* within a bucket documents concatenate in ascending id order;
* ``cum`` = total tokens of the documents BEFORE this one in its bucket;
* ``pack_id = cum // seq_len``, ``pack_offset = cum % seq_len``.

The assignment is a pure function of (id, token count) — re-running on
any topology gives the identical layout, which is what makes packed
corpora resumable and exactly reproducible.

Scale shape: one bucketed shuffle of ``(id, n_tokens)`` int rows (texts
never move — the actual byte layout job later reads them straight from
the partitioned corpus by id); per-bucket work is a vectorized
sort + exclusive cumsum.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset


def assign_packs(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    seq_len: int = 2048,
    num_buckets: int = 64,
    shuffle_buckets: int | None = None,
) -> Dataset:
    """``(id, bucket, pack_id, pack_offset, n_tokens)`` assignment rows.

    ``num_buckets`` is the SEMANTIC shard count (part of the frozen
    layout); ``shuffle_buckets`` only tunes the physical shuffle width.
    """
    from pdf_extract_ray.stages.agg import bucketed_group_apply

    if seq_len <= 0:
        raise ValueError("seq_len must be positive")

    def project(b: pd.DataFrame) -> pd.DataFrame:
        ids = b[id_col].to_numpy()
        return pd.DataFrame({
            "id": ids,
            "bucket": (ids % num_buckets).astype(np.int64),
            "n_tokens": b[tokens_col].to_numpy(np.int64),
        })

    def body(g: pd.DataFrame) -> pd.DataFrame:
        out_parts = []
        for bkt, grp in g.groupby("bucket", sort=False):
            grp = grp.sort_values("id", kind="mergesort")
            toks = grp["n_tokens"].to_numpy(np.int64)
            cum = np.concatenate(([0], np.cumsum(toks)[:-1]))
            out_parts.append(pd.DataFrame({
                "id": grp["id"].to_numpy(),
                "bucket": np.full(len(grp), bkt, dtype=np.int64),
                "pack_id": cum // seq_len,
                "pack_offset": cum % seq_len,
                "n_tokens": toks,
            }))
        if not out_parts:
            return pd.DataFrame({c: pd.Series([], dtype="int64") for c in
                                 ("id", "bucket", "pack_id", "pack_offset",
                                  "n_tokens")})
        return pd.concat(out_parts, ignore_index=True)

    return bucketed_group_apply(
        ds.map_batches(project, batch_format="pandas"),
        ["bucket"], body, num_buckets=shuffle_buckets)


def assign_packs_reference(
    df: pd.DataFrame,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    seq_len: int = 2048,
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Plain single-process implementation of the same frozen rules."""
    rows = []
    d = pd.DataFrame({"id": df[id_col].to_numpy(),
                      "n_tokens": df[tokens_col].to_numpy(np.int64)})
    d["bucket"] = (d["id"] % num_buckets).astype(np.int64)
    for bkt in sorted(d["bucket"].unique()):
        grp = d[d["bucket"] == bkt].sort_values("id")
        cum = 0
        for _, r in grp.iterrows():
            rows.append({"id": r["id"], "bucket": bkt,
                         "pack_id": cum // seq_len,
                         "pack_offset": cum % seq_len,
                         "n_tokens": int(r["n_tokens"])})
            cum += int(r["n_tokens"])
    return pd.DataFrame(rows, columns=["id", "bucket", "pack_id",
                                       "pack_offset", "n_tokens"]).astype(
        {"id": "int64", "bucket": "int64", "pack_id": "int64",
         "pack_offset": "int64", "n_tokens": "int64"})


def chunk_spans(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    chunk_len: int = 256,
    stride: int = 192,
) -> Dataset:
    """Overlapping-window chunk spans (RAG / long-doc training prep):
    each document with ``n`` tokens explodes into chunks starting at
    0, stride, 2*stride, ... while start < n, each ``[start,
    min(start+chunk_len, n))`` — so every token is covered and adjacent
    chunks overlap by ``chunk_len - stride``.  Empty documents emit no
    chunks (frozen).

    Scale shape: a narrow vectorized 1->N explode (np.repeat + offset
    arange — no Python loop, no shuffle); the downstream slicing job
    reads texts by (id, start, end) without this stage moving them.
    """
    if chunk_len <= 0 or stride <= 0:
        raise ValueError("chunk_len and stride must be positive")

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        n = b[tokens_col].to_numpy(np.int64)
        n_chunks = np.where(n > 0, -(-n // stride), 0)
        ids = np.repeat(b[id_col].to_numpy(), n_chunks)
        total = int(n_chunks.sum())
        # per-doc 0..k-1 counters from a global arange minus offsets
        starts_of_doc = np.repeat(np.concatenate(
            ([0], np.cumsum(n_chunks)[:-1])), n_chunks)
        chunk_no = np.arange(total, dtype=np.int64) - starts_of_doc
        start = chunk_no * stride
        end = np.minimum(start + chunk_len, np.repeat(n, n_chunks))
        return pd.DataFrame({"id": ids, "chunk_no": chunk_no,
                             "start_tok": start, "end_tok": end})

    return ds.map_batches(explode, batch_format="pandas")
