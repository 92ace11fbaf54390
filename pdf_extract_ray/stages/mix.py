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


def temperature_rates(
    counts: dict[str, int], alpha: float = 0.5,
) -> dict[str, float]:
    """Per-group keep rates for temperature sampling (Conneau et al.
    2020 XLM-R §3.1; Raffel et al. 2020 mC4 — public papers): sample
    group g with probability proportional to ``p_g ** alpha`` where
    ``p_g = n_g / N``.  Realized as per-document keep rates normalized
    so the smallest group keeps everything::

        r_g = (n_min / n_g) ** (1 - alpha)

    alpha=1 reproduces the raw distribution (all rates 1), alpha=0
    equalizes group sizes, alpha in between (0.3-0.7 in practice)
    upweights low-resource groups without flattening the mix.

    For bit-parity with the SQL oracle the alpha=0.5 exponent is
    computed via np.sqrt (correctly rounded in IEEE-754, so numpy and
    DuckDB agree bitwise); other alphas use np.power (engine-only).
    """
    if not counts:
        return {}
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    n_min = min(counts.values())
    exp = 1.0 - alpha
    out: dict[str, float] = {}
    for g, n in counts.items():
        ratio = np.float64(n_min) / np.float64(n)
        if exp == 0.5:
            out[g] = float(np.sqrt(ratio))
        else:
            out[g] = float(np.power(ratio, np.float64(exp)))
    return out


def temperature_sample(
    ds: Dataset,
    group_col: str,
    *,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    method: str = "md5",
) -> Dataset:
    """Temperature-based corpus rebalancing: ONE bounded count pass
    (map-side partials; the merged table and the driver dict are
    bounded by the number of distinct groups — languages/sources, a
    few hundred at most), then the same zero-shuffle hash-threshold
    filter as ``weighted_sample``.  Deterministic: membership is a
    pure function of (id, group counts, alpha)."""
    from pdf_extract_ray.stages.agg import grouped_aggregate

    cnt = grouped_aggregate(
        ds.select_columns([group_col]), [group_col],
        {"n": (group_col, "count")})
    # bounded driver materialization: one row per distinct group.
    counts = {
        str(r[group_col]): int(r["n"]) for r in cnt.take_all()
    }
    rates = temperature_rates(counts, alpha)
    return weighted_sample(
        ds, group_col, rates, id_col=id_col, method=method)


def temperature_sample_oracle_sql(
    table_sql: str,
    group_col: str,
    *,
    alpha: float = 0.5,
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror of ``temperature_sample(alpha=0.5, method='md5')``.

    The rate is data-dependent, so the SQL computes the group counts in
    a CTE and derives the same 8-hex bound: sqrt and double division
    are correctly rounded in both engines, and
    ``printf('%08x', floor(rate * 2**32))`` reproduces
    ``_bound_hex`` digit for digit (verified bitwise over random count
    pairs in tests).  Only alpha=0.5 is oracle-expressible with exact
    parity; the min-count group keeps everything via the 'gggggggg'
    sentinel exactly as ``_bound_hex(1.0)`` does.
    """
    if alpha != 0.5:
        raise ValueError("oracle parity is only guaranteed for alpha=0.5")
    key = f"substr(md5(CAST({id_col} AS VARCHAR)), 1, 8)"
    return f"""
WITH src AS ({table_sql}),
cnt AS (
  SELECT CAST({group_col} AS VARCHAR) AS g, COUNT(*) AS n
  FROM src GROUP BY 1
),
bounds AS (
  SELECT g,
    CASE WHEN n = (SELECT MIN(n) FROM cnt) THEN 'gggggggg'
         ELSE printf('%08x', CAST(floor(
           sqrt(CAST((SELECT MIN(n) FROM cnt) AS DOUBLE) / n)
           * 4294967296.0) AS BIGINT))
    END AS bound
  FROM cnt
)
SELECT src.* FROM src
JOIN bounds ON CAST(src.{group_col} AS VARCHAR) = bounds.g
WHERE {key} < bounds.bound
"""


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


def cap_per_group(
    ds: Dataset,
    group_col: str,
    k: int,
    *,
    id_col: str = "doc_id",
    method: str = "md5",
    num_buckets: int | None = None,
) -> Dataset:
    """Anti-spam group cap: keep at most ``k`` documents per group —
    the per-host page cap of RefinedWeb (Penedo et al. 2023 §3.1) and
    C4's per-domain limits (public papers).  A handful of hosts
    dominating a crawl would otherwise dominate the training mix.

    Which ``k`` survive is deterministic: the k smallest
    ``(hash(id), id)`` ranks within each group — seedless, order- and
    parallelism-independent, and NESTED (the kept set for k=10 is a
    subset of the kept set for k=100: cap experiments compose).
    ``method="md5"`` is the SQL-parity mode; ``method="fast"`` is the
    vectorized numpy hash for crawl scale (same contract, different
    membership).

    Scale shape: one narrow rank map, then ONE bucketed shuffle on the
    group key (the same coarse-bucket machinery as every grouped op
    here); within a bucket the cap is a vectorized sort + groupby-head.
    Skew note: a single pathological group lands in one bucket — salt
    upstream if a host exceeds a block (the webtext reassembly salting
    pattern applies unchanged).
    """
    from pdf_extract_ray.stages.agg import bucketed_group_apply

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    if method == "md5":
        def add_rank(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["__rank"] = [
                hashlib.md5(s.encode()).hexdigest()[:8]
                for s in b[id_col].astype(str)]
            return b
    elif method == "fast":
        def add_rank(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["__rank"] = _hash_numpy_col(b[id_col].to_numpy())
            return b
    else:
        raise ValueError(f"method must be 'md5' or 'fast', got {method!r}")

    def cap(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.sort_values(
            [group_col, "__rank", id_col], kind="mergesort")
        return (g.groupby(group_col, as_index=False, sort=False)
                .head(k).drop(columns="__rank"))

    ranked = ds.map_batches(add_rank, batch_format="pandas")
    return bucketed_group_apply(
        ranked, [group_col], cap, num_buckets=num_buckets)


def cap_per_group_oracle_sql(
    table_sql: str,
    group_col: str,
    k: int,
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror of ``cap_per_group(method='md5')``."""
    key = f"substr(md5(CAST({id_col} AS VARCHAR)), 1, 8)"
    return (
        f"SELECT * EXCLUDE (__rn) FROM ("
        f"SELECT *, row_number() OVER (PARTITION BY {group_col} "
        f"ORDER BY {key}, {id_col}) AS __rn FROM ({table_sql})) "
        f"WHERE __rn <= {k}")
