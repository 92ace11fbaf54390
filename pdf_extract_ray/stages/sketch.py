"""Mergeable sketches for approximate aggregates at crawl scale.

HyperLogLog here follows the guide's sketch pattern: one serialized sketch
per batch emitted from ``map_batches`` (map-side), merged in a tiny final
stage — distinct-count over 10^12 rows moves only ``2^p``-byte registers
through the shuffle, never values.  Deterministic (single stable hash
family — pandas' keyed siphash — for every input type).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ray.data import Dataset


class HyperLogLog:
    """Classic HLL with the standard bias corrections; p in [4, 16]."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hashes: np.ndarray) -> None:
        idx = (hashes >> np.uint64(64 - self.p)).astype(np.int64)
        rest = hashes << np.uint64(self.p)
        # rank = leading zeros of the remaining 64-p bits + 1
        ranks = np.zeros(len(hashes), dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        rest_work = rest.copy()
        rank = 1
        pending = np.ones(len(hashes), dtype=bool)
        while pending.any() and rank <= 64 - self.p + 1:
            is_set = (rest_work & mask) != 0
            newly = pending & is_set
            ranks[newly] = rank
            pending &= ~is_set
            rest_work = rest_work << np.uint64(1)
            rank += 1
        ranks[pending] = 64 - self.p + 1
        np.maximum.at(self.registers, idx, ranks)

    def add(self, values) -> None:
        """ONE hash family for every input type (deterministic
        hash_pandas_object, the same family stages/agg uses): generic
        iterables are wrapped into a Series first.  Two sketches built
        from different container types of the same values merge
        correctly — a second family would make ``merge()`` silently
        meaningless.  Numeric dtypes are widened to 64-bit so int32 and
        int64 representations of the same value hash identically."""
        s = values if isinstance(values, pd.Series) else pd.Series(list(values))
        if pd.api.types.is_integer_dtype(s):
            s = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            s = s.astype("float64")
        hs = pd.util.hash_pandas_object(s, index=False).to_numpy().astype(np.uint64)
        if len(hs):
            self.add_hashes(hs)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        out = HyperLogLog(self.p)
        out.registers = np.maximum(self.registers, other.registers)
        return out

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        e = alpha * m * m / inv.sum()
        if e <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                e = m * math.log(m / zeros)
        return e

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, p: int) -> "HyperLogLog":
        h = cls(p)
        h.registers = np.frombuffer(b, dtype=np.uint8).copy()
        return h


def approx_distinct(ds: Dataset, col: str, *, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT col): per-batch sketches (map-side),
    merged on the driver — only 2^p bytes per batch ever move."""

    def sketch_batch(b: pd.DataFrame) -> pd.DataFrame:
        h = HyperLogLog(p)
        h.add(b[col].dropna())
        return pd.DataFrame({"sketch": [h.to_bytes()]})

    parts = ds.map_batches(sketch_batch, batch_format="pandas").take_all()
    acc = HyperLogLog(p)
    for r in parts:
        acc = acc.merge(HyperLogLog.from_bytes(r["sketch"], p))
    return acc.estimate()
