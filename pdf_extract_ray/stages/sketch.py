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


# --- deterministic mergeable quantile histogram (HDR-histogram shape) ---
#
# The exact per-key quantile (`bucketed_group_apply` + pandas quantile)
# ships EVERY value of a key group through the shuffle — with a handful
# of hot keys over 10^12 rows that is the skew bottleneck.  This sketch
# is the scale path: per-batch counts into fixed log-spaced magnitude
# bins (map-side, pre-aggregated), ONE tiny (key, bin, n) shuffle, and a
# per-key interpolation over at most ``2*decades*bins_per_decade + 1``
# int64 counters.  Merging is integer vector addition — associative and
# commutative — so the distributed estimate equals the single-process
# reference EXACTLY (a determinism freeze; accuracy vs the true quantile
# is bounded by the bin ratio ``10**(1/(2*bins_per_decade))`` and
# asserted separately in pytest).
#
# Frozen rules:
# * non-finite values are dropped;
# * |v| < min_abs (including 0) maps to the zero bin, estimate 0.0;
# * magnitudes clip into [min_abs, min_abs*10**decades) — overflow
#   saturates at the top bin;
# * signed bin ordinal: negatives mirror positives below zero, so
#   ascending ordinal == ascending value;
# * the q-quantile is the representative (geometric bin midpoint) of the
#   bin holding rank floor(q*(n-1)) — "lower" interpolation.

QH_BINS_PER_DECADE = 32
QH_MIN_ABS = 1e-9
QH_DECADES = 21  # magnitudes [1e-9, 1e12)


def qh_bin_ordinals(values, *, bins_per_decade: int = QH_BINS_PER_DECADE,
                    min_abs: float = QH_MIN_ABS,
                    decades: int = QH_DECADES) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized value -> signed bin ordinal.  Returns ``(ordinals,
    keep_mask)`` where ``keep_mask`` drops non-finite inputs."""
    v = np.asarray(values, np.float64)
    keep = np.isfinite(v)
    out = np.zeros(len(v), np.int64)
    absv = np.abs(v)
    nz = keep & (absv >= min_abs)
    mag = np.floor(np.log10(absv[nz] / min_abs) * bins_per_decade)
    mag = np.clip(mag, 0, bins_per_decade * decades - 1).astype(np.int64)
    out[nz] = np.where(v[nz] > 0, mag + 1, -(mag + 1))
    return out, keep


def qh_representative(ordinals, *,
                      bins_per_decade: int = QH_BINS_PER_DECADE,
                      min_abs: float = QH_MIN_ABS) -> np.ndarray:
    """Signed bin ordinal -> representative value (geometric midpoint)."""
    o = np.asarray(ordinals, np.int64)
    mag = np.abs(o).astype(np.float64)
    rep = min_abs * 10.0 ** ((mag - 0.5) / bins_per_decade)
    return np.where(o == 0, 0.0, np.sign(o) * rep)


def _qh_quantiles_from_counts(ordinals: np.ndarray, counts: np.ndarray,
                              qs, *, bins_per_decade: int,
                              min_abs: float) -> np.ndarray:
    order = np.argsort(ordinals, kind="stable")
    o, c = ordinals[order], counts[order]
    cum = np.cumsum(c)
    n = int(cum[-1])
    ranks = np.floor(np.asarray(qs, np.float64) * (n - 1)).astype(np.int64)
    idx = np.searchsorted(cum, ranks, side="right")
    return qh_representative(o[idx], bins_per_decade=bins_per_decade,
                             min_abs=min_abs)


def approx_quantiles(
    ds: Dataset,
    keys: list[str],
    value_col: str,
    qs=(0.5, 0.9, 0.99),
    *,
    names: list[str] | None = None,
    bins_per_decade: int = QH_BINS_PER_DECADE,
    min_abs: float = QH_MIN_ABS,
    decades: int = QH_DECADES,
    round_digits: int | None = 4,
    num_buckets: int | None = None,
) -> Dataset:
    """Approximate per-key quantiles: map-side histogram partials + one
    (key, bin, n) shuffle + per-key interpolation.  Values never move."""
    from pdf_extract_ray.stages.agg import (bucketed_group_apply,
                                            grouped_aggregate)
    from pdf_extract_ray.util import round_half_away

    names = names or [f"p{int(q * 100)}" for q in qs]
    qs = tuple(float(q) for q in qs)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ords, keep = qh_bin_ordinals(
            b[value_col].to_numpy(np.float64),
            bins_per_decade=bins_per_decade, min_abs=min_abs,
            decades=decades)
        d = pd.DataFrame({k: b[k].to_numpy()[keep] for k in keys})
        d["qbin"] = ords[keep]
        return d.groupby(keys + ["qbin"], sort=False).size().reset_index(
            name="n")

    merged = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        keys + ["qbin"], {"n": ("n", "sum")})

    def body(bucket: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for kv, g in bucket.groupby(keys, sort=False):
            est = _qh_quantiles_from_counts(
                g["qbin"].to_numpy(np.int64), g["n"].to_numpy(np.int64),
                qs, bins_per_decade=bins_per_decade, min_abs=min_abs)
            if round_digits is not None:
                est = round_half_away(est, round_digits)
            kv = kv if isinstance(kv, tuple) else (kv,)
            rows.append(dict(zip(keys, kv)) | dict(zip(names, est)))
        return pd.DataFrame(rows, columns=keys + names)

    return bucketed_group_apply(merged, keys, body, num_buckets=num_buckets)


def approx_quantiles_reference(
    df: pd.DataFrame,
    keys: list[str],
    value_col: str,
    qs=(0.5, 0.9, 0.99),
    *,
    names: list[str] | None = None,
    bins_per_decade: int = QH_BINS_PER_DECADE,
    min_abs: float = QH_MIN_ABS,
    decades: int = QH_DECADES,
    round_digits: int | None = 4,
) -> pd.DataFrame:
    """Independent single-process implementation of the same frozen
    rules (plain pandas/numpy, no Ray, no shuffle) — golden generator
    and determinism check for :func:`approx_quantiles`."""
    from pdf_extract_ray.util import round_half_away

    names = names or [f"p{int(q * 100)}" for q in qs]
    rows = []
    for kv, g in df.groupby(keys, sort=False):
        ords, keep = qh_bin_ordinals(
            g[value_col].to_numpy(np.float64),
            bins_per_decade=bins_per_decade, min_abs=min_abs,
            decades=decades)
        o, c = np.unique(ords[keep], return_counts=True)
        est = _qh_quantiles_from_counts(
            o, c.astype(np.int64), qs,
            bins_per_decade=bins_per_decade, min_abs=min_abs)
        if round_digits is not None:
            est = round_half_away(est, round_digits)
        kv = kv if isinstance(kv, tuple) else (kv,)
        rows.append(dict(zip(keys, kv)) | dict(zip(names, est)))
    return pd.DataFrame(rows, columns=keys + names)


# --- count-min sketch (Cormode & Muthukrishnan 2005, public paper) ---
#
# Frequency estimation over key spaces too large to count exactly
# (urls, shingles, hosts at 10^12 rows): a d x w int64 counter matrix
# whose merge is elementwise addition — associative and commutative, so
# the distributed per-batch-partial plan produces EXACTLY the matrix the
# single-process pass does, and every estimate is deterministic.
# Guarantee: est >= true, and est <= true + eps*N with prob 1-delta for
# w = ceil(e/eps), d = ceil(ln 1/delta).  Hash family: one stable
# siphash per value (the dedup kernel family), mixed into d row indexes
# with fixed odd multipliers (splitmix-style) — vectorized, no per-row
# Python.

CMS_DEPTH = 4
CMS_WIDTH = 2048
_CMS_MULT = np.array([0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9,
                      0x94D049BB133111EB, 0xD6E8FEB86659FD93],
                     dtype=np.uint64)


def cms_indexes(values: pd.Series, *, depth: int = CMS_DEPTH,
                width: int = CMS_WIDTH) -> np.ndarray:
    """(depth, n) column indexes for each value, from one stable hash."""
    h = pd.util.hash_pandas_object(
        values.astype(str), index=False).to_numpy(np.uint64)
    mixed = h[None, :] * _CMS_MULT[:depth, None]
    mixed ^= mixed >> np.uint64(31)
    return (mixed % np.uint64(width)).astype(np.int64)


def cms_from_values(values: pd.Series, *, depth: int = CMS_DEPTH,
                    width: int = CMS_WIDTH) -> np.ndarray:
    """One (depth, width) int64 sketch of a value series."""
    m = np.zeros((depth, width), dtype=np.int64)
    idx = cms_indexes(values, depth=depth, width=width)
    for j in range(depth):
        m[j] += np.bincount(idx[j], minlength=width)
    return m


def cms_estimate(m: np.ndarray, values: pd.Series) -> np.ndarray:
    """Point estimates (min over rows) for each value."""
    depth, width = m.shape
    idx = cms_indexes(values, depth=depth, width=width)
    return np.min(
        np.stack([m[j, idx[j]] for j in range(depth)]), axis=0)


def cms_sketch(ds: Dataset, col: str, *, depth: int = CMS_DEPTH,
               width: int = CMS_WIDTH) -> np.ndarray:
    """Distributed sketch: one (depth*width) int64 partial per batch
    (map-side), summed — only ``depth*width*8`` bytes per batch move."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        m = cms_from_values(b[col].dropna(), depth=depth, width=width)
        return pd.DataFrame({"sketch": [m.tobytes()]})

    parts = ds.map_batches(partial, batch_format="pandas").take_all()
    acc = np.zeros((depth, width), dtype=np.int64)
    for r in parts:
        acc += np.frombuffer(r["sketch"], dtype=np.int64).reshape(
            depth, width)
    return acc


# ---------------------------------------------------------------------------
# Bloom filter — set-membership sketch (Bloom 1970, public): the crawl
# frontier's "url seen before?" primitive and the cheap pre-filter in
# front of exact dedup at 100 TB.  Merge is bitwise OR — associative,
# commutative, idempotent — so the distributed per-batch-partial build is
# bit-identical on any topology (same contract as HLL/CMS above).
# ---------------------------------------------------------------------------

BLOOM_BITS = 1 << 20   # 128 KiB filter; ~1e5 keys -> <1% FP at k=7
BLOOM_K = 7
_BLOOM_MULT = np.array(
    [0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB,
     0xD6E8FEB86659FD93, 0xA0761D6478BD642F, 0xE7037ED1A0B428DB,
     0x8EBC6AF09C88C6E3], dtype=np.uint64)


def bloom_bit_indexes(values: pd.Series, *, bits: int = BLOOM_BITS,
                      k: int = BLOOM_K) -> np.ndarray:
    """(k, n) bit positions per value from one stable hash + k
    splitmix-style mixes (the CMS index family)."""
    h = pd.util.hash_pandas_object(
        values.astype(str), index=False).to_numpy(np.uint64)
    mixed = h[None, :] * _BLOOM_MULT[:k, None]
    mixed ^= mixed >> np.uint64(31)
    return (mixed % np.uint64(bits)).astype(np.int64)


def bloom_from_values(values: pd.Series, *, bits: int = BLOOM_BITS,
                      k: int = BLOOM_K) -> np.ndarray:
    """One ``bits/64``-word uint64 filter of a value series."""
    words = np.zeros(bits // 64, dtype=np.uint64)
    if len(values):
        pos = bloom_bit_indexes(values, bits=bits, k=k).ravel()
        np.bitwise_or.at(words, pos // 64,
                         np.uint64(1) << (pos % 64).astype(np.uint64))
    return words


def bloom_contains(words: np.ndarray, values: pd.Series, *,
                   k: int = BLOOM_K) -> np.ndarray:
    """Membership probes: True may be a false positive (rate bounded by
    the fill factor), False is exact."""
    bits = len(words) * 64
    idx = bloom_bit_indexes(values, bits=bits, k=k)
    hit = np.ones(len(values), dtype=bool)
    for j in range(k):
        pos = idx[j]
        bit = (words[pos // 64] >> (pos % 64).astype(np.uint64)) \
            & np.uint64(1)
        hit &= bit.astype(bool)
    return hit


def bloom_sketch(ds: Dataset, col: str, *, bits: int = BLOOM_BITS,
                 k: int = BLOOM_K) -> np.ndarray:
    """Distributed build: one ``bits/8``-byte partial per batch
    (map-side), OR-merged on the driver — only filter bytes move,
    never keys."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        w = bloom_from_values(b[col].dropna(), bits=bits, k=k)
        return pd.DataFrame({"sketch": [w.tobytes()]})

    parts = ds.map_batches(partial, batch_format="pandas").take_all()
    acc = np.zeros(bits // 64, dtype=np.uint64)
    for r in parts:
        acc |= np.frombuffer(r["sketch"], dtype=np.uint64)
    return acc


def grouped_approx_distinct(
    ds: "Dataset",
    keys,
    col: str,
    *,
    p: int = 12,
    num_buckets: int | None = None,
) -> "Dataset":
    """Approximate ``COUNT(DISTINCT col)`` PER GROUP — the crawl-scale
    "distinct visitors per host" / "unique urls per snapshot" rollup
    where the exact distinct would ship every value through the
    shuffle.  Per-batch per-group HLL register sketches move instead
    (``2^p`` bytes per (batch, group) pair); ONE bucketed max-merge
    produces the estimates.

    Register max-merge is associative and commutative and the hash is
    deterministic, so the distributed result equals a single-process
    sketch of the same column EXACTLY at any parallelism — the
    determinism freeze the ``grouped_distinct_users`` golden checks;
    accuracy vs the exact count is a pytest property (~1.6% typical
    error at p=12).

    Output: ``(*keys, approx_distinct: float64)``."""
    from pdf_extract_ray.stages.agg import bucketed_group_apply

    keys = list(keys)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = {k: [] for k in keys}
        sk = []
        for kv, g in b.groupby(keys, sort=False, dropna=False):
            kv = kv if isinstance(kv, tuple) else (kv,)
            h = HyperLogLog(p)
            h.add(g[col].dropna())
            for k, v in zip(keys, kv):
                rows[k].append(v)
            sk.append(h.to_bytes())
        rows["__sk"] = sk
        return pd.DataFrame(rows)

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        outs = {k: [] for k in keys}
        est = []
        for kv, g in bucket.groupby(keys, sort=False, dropna=False):
            kv = kv if isinstance(kv, tuple) else (kv,)
            regs = np.frombuffer(
                b"".join(g["__sk"]), dtype=np.uint8).reshape(len(g), -1)
            acc = HyperLogLog(p)
            acc.registers = regs.max(axis=0)
            for k, v in zip(keys, kv):
                outs[k].append(v)
            est.append(acc.estimate())
        outs["approx_distinct"] = pd.Series(est, dtype="float64")
        return pd.DataFrame(outs)

    return bucketed_group_apply(
        ds.map_batches(partial, batch_format="pandas"), keys, merge,
        num_buckets=num_buckets)
