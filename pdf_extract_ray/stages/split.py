"""Deterministic train/val/test split assignment — the last stage of a
training-data pipeline: every document gets a stable split label from a
hash of its id, so the assignment is reproducible across runs, engines
and parallelism levels (no seed, no state, no shuffle).

Mechanism: ``split_of(id) = first 8 hex chars of md5(str(id))`` compared
against precomputed hex thresholds.  The md5 hex prefix is uniform over
``[0, 16^8)`` and lexicographic comparison of fixed-width lowercase hex
equals numeric comparison, so a fraction ``f`` maps to the threshold
string ``format(floor(f * 16^8), '08x')`` — both Python and SQL compare
plain strings and agree bit-for-bit (mirror: ``substr(md5(CAST(id AS
VARCHAR)), 1, 8) < '<hex>'``).

Scale shape: one narrow ``map_batches`` (embarrassingly parallel, zero
shuffles).  ``method="md5"`` is the SQL-parity oracle mode but hashes
per row (same deliberate trade as ``stratified_sample``); at crawl
scale use ``method="fast"`` — the vectorized numpy hash family used for
bucket tagging (same determinism contract: seedless, order- and
parallelism-independent; different membership, not SQL-expressible).

Reference analogue: the reference persists per-file processing state so
work splits deterministically across sessions (pdf_extract
session_state.py); here the same idea — a pure function of the id —
assigns corpus splits.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from ray.data import Dataset

from pdf_extract_ray.stages.agg import _hash_numpy_col

_SPACE = 16 ** 8  # md5 8-hex-char prefix space


def split_thresholds(fractions: dict[str, float]) -> list[tuple[str, str]]:
    """``[(label, upper_hex_bound), ...]`` in declaration order; the last
    label absorbs rounding slack (its bound is ``'ffffffff...'``)."""
    labels = list(fractions)
    if not labels:
        raise ValueError("fractions must be non-empty")
    total = sum(fractions.values())
    if not np.isclose(total, 1.0):
        raise ValueError(f"fractions must sum to 1, got {total}")
    out, acc = [], 0.0
    for lab in labels[:-1]:
        acc += fractions[lab]
        out.append((lab, format(int(acc * _SPACE), "08x")))
    out.append((labels[-1], "g" * 8))  # > any hex char
    return out


DEFAULT_FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}


def assign_split_batch(
    batch: pd.DataFrame,
    id_col: str = "doc_id",
    fractions: dict[str, float] = DEFAULT_FRACTIONS,
    method: str = "md5",
) -> pd.DataFrame:
    """Append a ``split`` column to one batch."""
    thresholds = split_thresholds(fractions)
    if method == "md5":
        ids = batch[id_col].astype(str).to_numpy()
        keys = np.array(
            [hashlib.md5(s.encode()).hexdigest()[:8] for s in ids])
        conds = [keys < bound for _, bound in thresholds[:-1]]
    elif method == "fast":
        # pure-numpy: top 32 bits of the vectorized hash vs integer bounds
        keys = _hash_numpy_col(batch[id_col].to_numpy()) >> np.uint64(32)
        conds = [
            keys < np.uint64(int(bound, 16))
            for _, bound in thresholds[:-1]]
    else:
        raise ValueError(f"method must be 'md5' or 'fast', got {method!r}")
    labels = [lab for lab, _ in thresholds]
    batch = batch.copy()
    batch["split"] = np.select(conds, labels[:-1], default=labels[-1])
    return batch


def assign_split(
    ds: Dataset,
    id_col: str = "doc_id",
    fractions: dict[str, float] = DEFAULT_FRACTIONS,
    method: str = "md5",
) -> Dataset:
    """Dataset-level split assignment: one narrow map, no shuffle."""
    return ds.map_batches(
        lambda b: assign_split_batch(b, id_col, fractions, method),
        batch_format="pandas",
    )


def split_oracle_sql(
    table_sql: str,
    id_col: str = "doc_id",
    fractions: dict[str, float] = DEFAULT_FRACTIONS,
) -> str:
    """DuckDB mirror of ``assign_split(method='md5')`` over ``table_sql``
    (a SELECT producing ``id_col`` plus any passthrough columns)."""
    thresholds = split_thresholds(fractions)
    key = f"substr(md5(CAST({id_col} AS VARCHAR)), 1, 8)"
    whens = " ".join(
        "WHEN {} < '{}' THEN '{}'".format(
            key, bound, str(lab).replace("'", "''"))
        for lab, bound in thresholds[:-1])
    last = str(thresholds[-1][0]).replace("'", "''")
    case = f"CASE {whens} ELSE '{last}' END AS split"
    return f"SELECT *, {case} FROM ({table_sql})"
