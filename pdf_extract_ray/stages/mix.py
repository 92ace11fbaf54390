"""Deterministic corpus mixing — per-group keep rates for composing a
training mix (e.g. upweight curated sources, downsample bulk crawl), the
standard last-mile rebalancing step of web-scale LLM corpora (Brown et
al. 2020 §2.2 mix weights; Gao et al. 2020 "The Pile" per-set epochs —
public papers).

Mechanism: a document survives iff ``hash_frac(id) < rate[group]`` where
``hash_frac`` is the same md5-8-hex-prefix rank used by
``stages/split.py`` — a pure function of the id, so membership is
reproducible across runs, engines, parallelism and even across
OVERLAPPING rates (the kept set for rate 0.2 is a subset of the kept set
for rate 0.5: nested samples for mix experiments come free).

Scale shape: one narrow ``map_batches`` filter, zero shuffles; the rate
table is a plain broadcast dict (a few hundred groups at most).
``method="md5"`` is the SQL-parity oracle mode (per-row md5, the
deliberate ``split.py`` trade); ``method="fast"`` is the vectorized
numpy hash for crawl scale (same determinism contract, different
membership, not SQL-expressible).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from ray.data import Dataset

from pdf_extract_ray.stages.agg import _hash_numpy_col

_SPACE = 16 ** 8


def _bound_hex(rate: float) -> str:
    """Keep-probability -> 8-hex upper bound ('g'*8 keeps everything —
    lexicographically above any hex digit, mirroring split.py)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if rate >= 1.0:
        return "g" * 8
    return format(int(rate * _SPACE), "08x")


def weighted_sample_batch(
    batch: pd.DataFrame,
    group_col: str,
    rates: dict[str, float],
    id_col: str = "doc_id",
    default_rate: float = 1.0,
    method: str = "md5",
) -> pd.DataFrame:
    """Filter one batch to the deterministic per-group sample."""
    bounds = {g: _bound_hex(r) for g, r in rates.items()}
    default_bound = _bound_hex(default_rate)
    group_bound = (batch[group_col].astype(str).map(bounds)
                   .fillna(default_bound).to_numpy())
    if method == "md5":
        ids = batch[id_col].astype(str).to_numpy()
        keys = np.array(
            [hashlib.md5(s.encode()).hexdigest()[:8] for s in ids])
        keep = keys < group_bound
    elif method == "fast":
        keys = _hash_numpy_col(batch[id_col].to_numpy()) >> np.uint64(32)
        int_bound = np.array(
            [_SPACE if b == "g" * 8 else int(b, 16) for b in group_bound],
            dtype=np.uint64)
        keep = keys < int_bound
    else:
        raise ValueError(f"method must be 'md5' or 'fast', got {method!r}")
    return batch[keep]


def weighted_sample(
    ds: Dataset,
    group_col: str,
    rates: dict[str, float],
    id_col: str = "doc_id",
    default_rate: float = 1.0,
    method: str = "md5",
) -> Dataset:
    """Dataset-level mixing: one narrow map filter, no shuffle."""
    return ds.map_batches(
        lambda b: weighted_sample_batch(
            b, group_col, rates, id_col, default_rate, method),
        batch_format="pandas",
    )


def weighted_sample_oracle_sql(
    table_sql: str,
    group_col: str,
    rates: dict[str, float],
    id_col: str = "doc_id",
    default_rate: float = 1.0,
) -> str:
    """DuckDB mirror of ``weighted_sample(method='md5')``."""
    key = f"substr(md5(CAST({id_col} AS VARCHAR)), 1, 8)"
    whens = " ".join(
        "WHEN CAST({} AS VARCHAR) = '{}' THEN '{}'".format(
            group_col, str(g).replace("'", "''"), _bound_hex(r))
        for g, r in rates.items())
    bound = f"CASE {whens} ELSE '{_bound_hex(default_rate)}' END"
    return f"SELECT * FROM ({table_sql}) WHERE {key} < {bound}"
