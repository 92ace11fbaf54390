"""Importance-resampling data selection — the DSIR shape (Xie et al.
2023, "Data Selection for Language Models via Importance Resampling" —
public paper): rank raw-crawl documents by how much they read like a
TARGET corpus, using the log likelihood ratio of hashed bag-of-n-gram
features under two smoothed bucket-unigram distributions,

``dsir_logratio(doc) = Σ_t [ ln p_target(bucket_t) - ln p_raw(bucket_t) ]``

(the paper's importance weight in log space; ``dsir_avg`` is the
length-normalized variant for threshold-style selection).  Selection
itself composes from existing operators — top-k by weight via
``sort + limit``, or Gumbel-free deterministic resampling via the
stratified sampler keyed on weight buckets.

The reference repo has no data-selection machinery; this operator exists
for the training-data-pipeline mandate.  The feature space — word
unigrams + adjacent bigrams hashed into ``n_buckets`` by the engine's
frozen hash — is shared verbatim with the NB quality classifier
(``stages/nbquality.ngram_features``), exactly how DSIR's public
implementation shares fastText's hashing trick.

Scale shape:

* **Training** (one vector per corpus): per-batch partial counts — the
  shuffle sees distinct ``(bucket, c)`` rows per block, never tokens —
  ONE grouped merge, then a driver vector BOUNDED BY ``n_buckets`` by
  construction.  The target corpus is typically tiny (a curated slice);
  the raw pass is one full scan, the price of the denominator.
* **Scoring**: the single ``log p_target - log p_raw`` difference vector
  is broadcast ONCE via ``ray.put`` (one dense float64 vector, ~0.5 MB
  at the default 2^16 buckets); one narrow ``map_batches`` with a
  scatter-add per batch (``np.add.at`` — sequential accumulation in the
  frozen uni-then-bi document order, so the single-process reference
  loop matches byte-for-byte).  No shuffle, texts never move.

Oracle strategy: the frozen hash is not SQL-expressible, so the driver
oracle is a COMMITTED golden from ``dsir_reference`` (dict-count
training + per-feature loop — independent of the distributed
merge/scatter path), the ``nb_quality_docs`` convention.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset

from pdf_extract_ray.stages.nbquality import (
    DEFAULT_ALPHA,
    DEFAULT_N_BUCKETS,
    _TOKEN_RE,
    hash_buckets,
    ngram_features,
)
from pdf_extract_ray.util import round_half_away


def train_bucket_dist(
    ds: Dataset,
    *,
    text_col: str = "text",
    n_buckets: int = DEFAULT_N_BUCKETS,
    alpha: float = DEFAULT_ALPHA,
) -> np.ndarray:
    """Smoothed log-probability vector over hashed n-gram buckets:
    ``ln (c(bucket) + alpha) / (total + alpha * n_buckets)``."""
    from pdf_extract_ray.stages.agg import grouped_aggregate

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        _, buckets = ngram_features(b[text_col], n_buckets)
        if len(buckets):
            c = pd.Series(buckets).value_counts()
            return pd.DataFrame({"bucket": c.index.to_numpy(np.int64),
                                 "c": c.to_numpy(np.int64)})
        return pd.DataFrame({"bucket": [], "c": []}).astype(
            {"bucket": np.int64, "c": np.int64})

    merged = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        ["bucket"], {"c": ("c", "sum")},
    ).to_pandas()  # bounded: <= n_buckets rows
    vec = np.zeros(n_buckets, dtype=np.float64)
    if len(merged):
        vec[merged["bucket"].to_numpy(np.int64)] = \
            merged["c"].to_numpy(np.float64)
    return np.log((vec + alpha) / (vec.sum() + alpha * n_buckets))


def dsir_weights(
    ds: Dataset,
    log_target: np.ndarray,
    log_raw: np.ndarray,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """``(id_col, n_features, dsir_logratio, dsir_avg)`` — one row per
    document.  ``dsir_logratio`` is the summed log importance weight
    (higher = more target-like), rounded half-away at 6; ``dsir_avg`` is
    per-feature (NULL for feature-less docs, whose logratio is 0)."""
    import ray

    if log_target.shape != log_raw.shape:
        raise ValueError("target/raw distributions must share n_buckets")
    diff_ref = ray.put(np.ascontiguousarray(log_target - log_raw))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        diff = ray.get(diff_ref)
        doc, buckets = ngram_features(batch[text_col], len(diff))
        n_docs = len(batch)
        s = np.zeros(n_docs, dtype=np.float64)
        if len(doc):
            np.add.at(s, doc, diff[buckets])
        nf = np.bincount(doc, minlength=n_docs).astype(np.int64)
        avg = round_half_away(s / np.maximum(nf, 1), 6)
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(),
            "n_features": nf,
            "dsir_logratio": round_half_away(s, 6),
            "dsir_avg": np.where(nf > 0, avg, np.nan),
        })

    return ds.map_batches(score, batch_format="pandas")


def dsir_reference(target_texts, raw_texts, score_texts, *,
                   n_buckets: int = DEFAULT_N_BUCKETS,
                   alpha: float = DEFAULT_ALPHA) -> pd.DataFrame:
    """Single-process reference (dict-count training + per-feature
    scoring loop) for the golden generator and the A/B pytest; the
    distributed train+score must match byte-for-byte."""
    import re
    from collections import Counter

    def grams(text) -> list[int]:
        ws = re.findall(_TOKEN_RE,
                        ("" if text is None else str(text)).lower())
        items = list(ws) + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        if not items:
            return []
        return list(hash_buckets(np.array(items, dtype=object), n_buckets))

    def dist(texts) -> np.ndarray:
        c: Counter = Counter()
        for t in texts:
            for b in grams(t):
                c[b] += 1
        vec = np.zeros(n_buckets, dtype=np.float64)
        for b, n in c.items():
            vec[b] = float(n)
        return np.log((vec + alpha) / (vec.sum() + alpha * n_buckets))

    diff = dist(target_texts) - dist(raw_texts)
    rows = []
    for t in score_texts:
        bs = grams(t)
        s = np.float64(0.0)
        for b in bs:
            s = s + diff[b]
        nf = len(bs)
        rows.append({
            "n_features": nf,
            "dsir_logratio": float(round_half_away(s, 6)),
            "dsir_avg": (float(round_half_away(s / np.float64(nf), 6))
                         if nf else np.nan),
        })
    return pd.DataFrame(rows).astype({"n_features": np.int64})
