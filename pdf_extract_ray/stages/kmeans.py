"""Distributed Lloyd k-means over an embedding column — the clustering
primitive behind SemDeDup-style pruning, DCLM-style topic balancing and
IVF index training (the existing ``similarity.py`` IVF uses a one-shot
sampled init; THIS is the iterative refinement that real index builds
run over the full corpus).

Exact-determinism discipline (the repo's rule: distributed ==
single-process BIT-FOR-BIT, proven by a committed golden):

* Vectors are frozen to integers up front: ``xq = floor(x · scale)``
  per dimension.  Every per-cluster update sum is then EXACT (integer
  values carried in float64 stay exact below 2^53), so the mean — one
  IEEE division per dimension — is order- and parallelism-independent.
* Initial centroids are the ``k`` rows with the smallest ids (frozen,
  data-independent of topology).
* Assignment avoids BLAS matmul on purpose: a Python loop over the k
  centroids computing ``((X - c)**2).sum(axis=1)`` — numpy's axis
  reduction over the FIXED embedding dimension is bitwise reproducible
  regardless of batch size, while a ``X @ C.T`` dot could change
  blocking (and last-ulp results) with the batch shape.  Ties take the
  LOWEST cluster index (``argmin`` first-hit).
* An empty cluster keeps its previous centroid (frozen rule).

Scale shape: the quantized ``(id, xq)`` projection is materialized ONCE
and re-consumed every iteration (re-running the upstream read per
iteration would re-scan the corpus T times); each iteration is one
narrow assign map (centroids ride the closure — k·D floats) plus
:func:`similarity.grouped_centroids`' partial-sum merge, whose shuffle
carries one (sum-vector, n) row per (cluster, batch) — bodies never
move, and the driver only ever sees the k-row centroid table.

Reference analogue: the reference repo has no clustering; this is the
engine-native generalization of its grouped-aggregation stages
(metadata_generator.py's per-group rollups) to iterative ML fitting.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset


def _assign_to(xq: np.ndarray, cents: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n, D) int-valued matrix -> (cluster, dist) under the frozen
    argmin rule.  BLAS-free on purpose (see module docstring)."""
    n = xq.shape[0]
    best = np.full(n, np.inf, dtype=np.float64)
    cl = np.zeros(n, dtype=np.int64)
    for j in range(cents.shape[0]):
        d = xq - cents[j]
        dist = (d * d).sum(axis=1)
        hit = dist < best  # strict: ties keep the LOWEST j
        best[hit] = dist[hit]
        cl[hit] = j
    return cl, best


def kmeans(
    ds: Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    k: int,
    n_iters: int,
    scale: int = 1000,
    num_buckets: int | None = None,
) -> Dataset:
    """Lloyd k-means (frozen rules above).  Returns the FINAL assignment
    ``(id_col, cluster, dist)`` against the last-iteration centroids;
    use :func:`kmeans_centroids` when the centroid table itself is the
    product (IVF training)."""
    asn, _ = _kmeans_impl(ds, id_col, vec_col, k=k, n_iters=n_iters,
                          scale=scale, num_buckets=num_buckets)
    return asn


def kmeans_centroids(
    ds: Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    k: int,
    n_iters: int,
    scale: int = 1000,
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """The k-row centroid table ``(cluster, centroid list<double>,
    n_vecs)`` after ``n_iters`` Lloyd iterations (counts from the final
    assignment)."""
    from pdf_extract_ray.stages.agg import grouped_aggregate

    out, cents = _kmeans_impl(ds, id_col, vec_col, k=k, n_iters=n_iters,
                              scale=scale, num_buckets=num_buckets)
    counts = np.zeros(k, dtype=np.int64)
    cnt = grouped_aggregate(out.select_columns(["cluster"]), ["cluster"],
                            {"n": ("cluster", "count")},
                            num_buckets=num_buckets).to_pandas()
    counts[cnt["cluster"].to_numpy(np.int64)] = cnt["n"].to_numpy(np.int64)
    return pd.DataFrame({
        "cluster": np.arange(k, dtype=np.int64),
        "centroid": list(cents),
        "n_vecs": counts})


def _kmeans_impl(ds, id_col, vec_col, *, k, n_iters, scale, num_buckets):
    from pdf_extract_ray.stages.similarity import grouped_centroids

    if k < 1 or n_iters < 0:
        raise ValueError("need k >= 1 and n_iters >= 0")

    def quant(b: pd.DataFrame) -> pd.DataFrame:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in b[vec_col]])
        xq = np.floor(m * np.float64(scale))
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(np.int64),
            "__xq": list(xq)})

    # one pinned narrow copy; every iteration re-consumes it
    qds = ds.map_batches(quant, batch_format="pandas").materialize()

    seed = (qds.sort(id_col).limit(k).to_pandas())
    if len(seed) < k:
        raise ValueError(f"k={k} exceeds the {len(seed)} input rows")
    cents = np.stack([np.asarray(v, np.float64) for v in seed["__xq"]])

    def make_assign(c: np.ndarray):
        def assign(b: pd.DataFrame) -> pd.DataFrame:
            xq = np.stack([np.asarray(v, np.float64) for v in b["__xq"]])
            cl, dist = _assign_to(xq, c)
            return pd.DataFrame({
                id_col: b[id_col].to_numpy(np.int64),
                "__xq": b["__xq"].to_numpy(),
                "cluster": cl, "dist": dist})
        return assign

    for _ in range(n_iters):
        assigned = qds.map_batches(make_assign(cents),
                                   batch_format="pandas")
        upd = grouped_centroids(assigned, ["cluster"], vec_col="__xq",
                                num_buckets=num_buckets).to_pandas()
        nxt = cents.copy()  # empty clusters keep their old centroid
        for _, r in upd.iterrows():
            nxt[int(r["cluster"])] = np.asarray(r["centroid"], np.float64)
        cents = nxt

    final = qds.map_batches(make_assign(cents), batch_format="pandas")
    return final.drop_columns(["__xq"]), cents


def silhouette(
    ds: Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    k: int,
    n_iters: int,
    scale: int = 1000,
    num_buckets: int | None = None,
) -> Dataset:
    """Clustering-quality report — the simplified (centroid-based)
    silhouette of Lloyd k-means: per vector ``a`` = squared distance
    to its OWN final centroid, ``b`` = min squared distance to any
    OTHER centroid, ``silhouette = (b - a) / max(a, b)`` (0 when both
    are 0) — the standard "are these clusters real" readout before
    trusting SemDeDup/IVF cells, at O(n·k) instead of the exact
    silhouette's O(n²).

    Frozen rules: distances live in the same floor-quantized integer
    space as :func:`kmeans` (exact sums -> deterministic), silhouette
    rounded half-away to 6.  Output ``(id, cluster, silhouette)``.

    Scale shape: the k-row centroid table broadcasts once; one narrow
    vectorized map, zero shuffles beyond the kmeans iterations."""
    import ray as _ray

    from pdf_extract_ray.util import round_half_away

    _, cents = _kmeans_impl(ds, id_col, vec_col, k=k, n_iters=n_iters,
                            scale=scale, num_buckets=num_buckets)
    cents_ref = _ray.put(cents)

    def score(b: pd.DataFrame) -> pd.DataFrame:
        c = _ray.get(cents_ref)
        m = np.stack([np.asarray(v, dtype=np.float64) for v in b[vec_col]])
        xq = np.floor(m * np.float64(scale))
        best = np.full(len(xq), np.inf)
        second = np.full(len(xq), np.inf)
        cl = np.zeros(len(xq), dtype=np.int64)
        for j in range(len(c)):
            d = xq - c[j]
            dist = (d * d).sum(axis=1)
            hit = dist < best
            second = np.where(hit, best, np.minimum(second, dist))
            best[hit] = dist[hit]
            cl[hit] = j
        denom = np.maximum(best, second)
        with np.errstate(invalid="ignore"):
            s = np.where(denom > 0, (second - best) / denom, 0.0)
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(np.int64),
            "cluster": cl,
            "silhouette": round_half_away(s, 6),
        })

    return ds.map_batches(score, batch_format="pandas")
