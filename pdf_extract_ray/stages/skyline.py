"""Distributed skyline (Pareto frontier): rows not dominated by any
other row, maximizing every metric column — the multi-objective
selection behind "keep documents that are long AND high-quality AND
fresh" curation cuts, where any single weighted score would bake in an
arbitrary trade-off.

Dominance (frozen): ``s`` dominates ``r`` iff ``s[c] >= r[c]`` for ALL
metric columns and ``s[c] > r[c]`` for at least one.  Duplicate metric
points do not dominate each other, so all copies of a frontier point
survive (the SQL mirror's NOT EXISTS agrees).

Scale shape: the skyline operator is ALGEBRAIC — skyline(A ∪ B) =
skyline(skyline(A) ∪ skyline(B)) — so phase 1 computes each block's
local frontier in place (the 2-D path is the classic sort-scan,
O(n log n); d > 2 falls back to a chunked pairwise mask), and only
those survivors move: one ``repartition(1)`` of the union, then a final
local pass.  For n uniformly random points in d dimensions the expected
frontier is O((ln n)^(d-1)) rows — the documented assumption; on
adversarial (anti-correlated) data the frontier can be large, so
``max_frontier_rows`` hard-fails rather than silently materializing an
unbounded set on one worker.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from ray.data import Dataset


def local_skyline(df: pd.DataFrame, cols: Sequence[str]) -> pd.DataFrame:
    """Non-dominated rows of one in-memory frame (maximizing ``cols``)."""
    cols = list(cols)
    if len(df) <= 1:
        return df
    if len(cols) == 2:
        x = df[cols[0]].to_numpy()
        y = df[cols[1]].to_numpy()
        # per-x maximum y, then a strict suffix-max over larger x:
        # keep (x, y) iff y == M(x) and y > max_{x' > x} M(x')
        ux, inv = np.unique(x, return_inverse=True)  # ux ascending
        m = np.full(len(ux), -np.inf)
        np.maximum.at(m, inv, y)
        suf = np.full(len(ux), -np.inf)
        if len(ux) > 1:
            suf[:-1] = np.maximum.accumulate(m[::-1])[::-1][1:]
        keep = (y == m[inv]) & (y > suf[inv])
        return df[keep]
    vals = df[cols].to_numpy(np.float64)
    n = len(vals)
    keep = np.ones(n, dtype=bool)
    chunk = max(1, 2_000_000 // max(n, 1))
    for lo in range(0, n, chunk):
        sub = vals[lo:lo + chunk]  # (c, d)
        ge = (vals[None, :, :] >= sub[:, None, :]).all(axis=2)
        gt = (vals[None, :, :] > sub[:, None, :]).any(axis=2)
        keep[lo:lo + chunk] = ~(ge & gt).any(axis=1)
    return df[keep]


def pareto_frontier(ds: Dataset, cols: Sequence[str], *,
                    max_frontier_rows: int = 1_000_000) -> Dataset:
    """Global skyline of ``ds`` maximizing ``cols`` (see module doc)."""
    cols = list(cols)

    def phase1(b: pd.DataFrame) -> pd.DataFrame:
        out = local_skyline(b, cols)
        if len(out) > max_frontier_rows:
            raise ValueError(
                f"local frontier {len(out)} rows > max_frontier_rows="
                f"{max_frontier_rows}; data is anti-correlated in "
                f"{cols} — raise the cap or pre-bucket")
        return out

    local = ds.map_batches(phase1, batch_format="pandas")
    return local.repartition(1).map_batches(
        lambda b: local_skyline(b, cols), batch_format="pandas")


def pareto_frontier_oracle_sql(source_sql: str,
                               cols: Sequence[str]) -> str:
    """DuckDB mirror of :func:`pareto_frontier` (NOT EXISTS dominance)."""
    cols = list(cols)
    ge = " AND ".join(f"s.{c} >= t.{c}" for c in cols)
    gt = " OR ".join(f"s.{c} > t.{c}" for c in cols)
    return f"""
WITH __sk_t AS ({source_sql})
SELECT * FROM __sk_t t
WHERE NOT EXISTS (
  SELECT 1 FROM __sk_t s WHERE {ge} AND ({gt})
)
"""
