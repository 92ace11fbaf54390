"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — one numpy matmul per batch against a
broadcast query matrix (queries are ``ray.put`` once and read per actor,
never re-shipped per batch), then a global top-k via sort+limit on the
tiny per-batch partial top-k rows.  Scale path: IVF-style coarse
quantization — assign each vector to its nearest of C centroids (learned
deterministically from a sample), search only the ``nprobe`` closest
cells.

Reference analogue: the LaBSE embedding scorer pattern (T2,
euaa_사례/sentences/aligner.py:24-38) — load-once state in an actor pool,
vectorized scoring per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from pdf_extract_ray.util import default_concurrency, round_half_away


def _topk_indices(ids: np.ndarray, col: np.ndarray, k: int) -> np.ndarray:
    """Indices of the top-``k`` rows by (col DESC, id ASC).

    Tie-break on id at the PARTIAL stage too: argpartition on the score
    alone keeps/drops candidates tied at the k-th value arbitrarily, and
    the global (score desc, id asc) reduce can then disagree with the
    SQL oracle's QUALIFY ordering.  O(n) argpartition narrows to the
    top-k VALUES, then every row tied at the k-th value joins the
    candidate set and only that set is lexsorted (a full lexsort per
    query would be O(n log n) on the hot scoring path)."""
    if len(col) > k:
        rough = np.argpartition(-col, k - 1)[:k]
        kth = col[rough].min()
        cand = np.flatnonzero(col >= kth)
    else:
        cand = np.arange(len(col))
    return cand[np.lexsort((ids[cand], -col[cand]))][:k]


class _ScoreTopK:
    """Per-batch partial top-k against broadcast queries (object-store ref
    resolved once per actor in __init__)."""

    def __init__(self, query_ref, id_col: str, vec_col: str, k: int):
        q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        self.q = np.asarray(q, dtype=np.float64)
        qn = np.linalg.norm(self.q, axis=1, keepdims=True)
        qn[qn == 0] = 1.0
        self.qn = self.q / qn
        self.id_col, self.vec_col, self.k = id_col, vec_col, k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[self.id_col].to_numpy()
        v = np.stack(batch[self.vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(v, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sim = (v / norms) @ self.qn.T  # (n, n_queries)
        return self._partial_topk(ids, sim)

    def _partial_topk(self, ids: np.ndarray, sim: np.ndarray) -> pd.DataFrame:
        out = {"query_id": [], self.id_col: [], "cosine": []}
        for qi in range(sim.shape[1]):
            # NaN cosines (NaN/inf embedding components) must neither win
            # nor poison the k-th boundary value below: map them to -inf
            # (the old full-lexsort path sorted them last)
            col = np.where(np.isnan(sim[:, qi]), -np.inf, sim[:, qi])
            part = _topk_indices(ids, col, self.k)
            for i in part:
                out["query_id"].append(qi)
                out[self.id_col].append(ids[i])
                # unrounded: the global top-k must select/tie-break on the
                # true cosine (the SQL oracle's QUALIFY does); rounding
                # happens once after the final head(k)
                out["cosine"].append(float(col[i]))
        return pd.DataFrame(out)


def brute_force_topk(
    ds: Dataset,
    queries: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    concurrency=None,
) -> Dataset:
    """Exact cosine top-k per query.  Result: (query_id, id_col, cosine),
    k rows per query, ordered by (query_id, -cosine, id)."""
    query_ref = ray.put(np.asarray(queries, dtype=np.float64))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        # stateless tasks; the broadcast query matrix is fetched zero-copy
        # from the object store once per worker process and cached
        cache = getattr(score, "_c", None)
        if cache is None:
            cache = score._c = _ScoreTopK(query_ref, id_col, vec_col, k)
        return cache(batch)

    partial = ds.map_batches(score, batch_format="pandas")

    # global top-k: the partials are tiny (k rows per batch per query) —
    # a per-query group reduce, not a global sort of the data
    def reduce_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["cosine", id_col], ascending=[False, True], kind="mergesort"
        ).head(k).reset_index(drop=True)
        g["cosine"] = round_half_away(g["cosine"], 6)
        return g

    return partial.groupby("query_id").map_groups(reduce_topk, batch_format="pandas")


def hard_negative_topk(
    ds: Dataset,
    queries: np.ndarray,
    query_labels: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 10,
) -> Dataset:
    """Hard-NEGATIVE mining for contrastive training: per query, the
    exact cosine top-k among vectors whose ``label_col`` DIFFERS from
    the query's label — the closest wrong-class examples, the pairs a
    contrastive loss learns the most from.

    Same scale shape as :func:`brute_force_topk` (one ``ray.put``
    broadcast of the query matrix + labels, per-batch matmul partials
    of k rows each, one tiny per-query reduce); same-label rows are
    EXCLUDED before the partial top-k, not merely ranked last, so a
    query whose negatives are scarce returns fewer than k rows —
    exactly like the SQL mirror's ``WHERE label <> q.label``."""
    query_ref = ray.put(np.asarray(queries, dtype=np.float64))
    qlab_ref = ray.put(np.asarray(query_labels))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        cache = getattr(score, "_c", None)
        if cache is None:
            cache = score._c = _ScoreTopK(query_ref, id_col, vec_col, k)
            cache._qlabels = ray.get(qlab_ref)
        ids = batch[id_col].to_numpy()
        labels = batch[label_col].to_numpy()
        v = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(v, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sim = (v / norms) @ cache.qn.T
        out = {"query_id": [], id_col: [], "cosine": []}
        for qi in range(sim.shape[1]):
            neg = np.flatnonzero(labels != cache._qlabels[qi])
            col = np.where(np.isnan(sim[neg, qi]), -np.inf, sim[neg, qi])
            for j in _topk_indices(ids[neg], col, k):
                out["query_id"].append(qi)
                out[id_col].append(ids[neg][j])
                out["cosine"].append(float(col[j]))
        return pd.DataFrame({
            "query_id": pd.Series(out["query_id"], dtype="int64"),
            id_col: pd.Series(out[id_col], dtype="int64"),
            "cosine": pd.Series(out["cosine"], dtype="float64"),
        })

    partial = ds.map_batches(score, batch_format="pandas")

    def reduce_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["cosine", id_col], ascending=[False, True], kind="mergesort"
        ).head(k).reset_index(drop=True)
        g["cosine"] = round_half_away(g["cosine"], 6)
        return g

    return partial.groupby("query_id").map_groups(
        reduce_topk, batch_format="pandas")


# ---------------------------------------------------------------------------
# IVF-style bucketed ANN (scale path)
# ---------------------------------------------------------------------------

def _kmeanspp_lite(sample: np.ndarray, c: int, seed: int = 5) -> np.ndarray:
    """Deterministic centroid pick: farthest-point traversal from a fixed
    start (no iterative Lloyd refinement — cells only need to be stable)."""
    rng = np.random.RandomState(seed)
    idx = [int(rng.randint(len(sample)))]
    d = np.full(len(sample), np.inf)
    for _ in range(c - 1):
        d = np.minimum(d, np.linalg.norm(sample - sample[idx[-1]], axis=1))
        idx.append(int(d.argmax()))
    return sample[idx]


def _centroid_sample(ds: Dataset, id_col: str, vec_col: str,
                     sample_n: int, n_cells: int) -> np.ndarray:
    """Deterministic unbiased centroid sample: keep rows whose id hash
    lands on a stride sized for ~``sample_n`` hits (seedless,
    parallelism-independent — per-row hash, not block-seeded RNG), then
    truncate to the ``sample_n`` smallest (hash, id) — NOT ``limit``,
    whose survivors under streaming execution follow nondeterministic
    block-completion order.  Falls back to a head sample only when the
    filter yields fewer rows than cells (tiny inputs, where head==all)."""
    n_total = ds.count()
    stride = max(1, n_total // max(1, sample_n))

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(b[id_col], index=False)
        out = b.loc[(h.to_numpy() % np.uint64(stride)) == 0,
                    [id_col, vec_col]]
        out["__h"] = h[out.index].to_numpy()
        return out

    # expected candidate count ~ n/stride in [sample_n, 2*sample_n):
    # bounded driver-side materialization by construction
    rows = ds.map_batches(pick, batch_format="pandas").take_all()
    if len(rows) < n_cells:
        rows = ds.limit(sample_n).take_all()
        return np.stack([r[vec_col] for r in rows]).astype(np.float64)
    rows.sort(key=lambda r: (r["__h"], r[id_col]))
    return np.stack(
        [r[vec_col] for r in rows[:sample_n]]).astype(np.float64)


def ivf_topk(
    ds: Dataset,
    queries: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    sample_n: int = 2048,
    concurrency=None,
) -> Dataset:
    """Approximate top-k: assign vectors to coarse cells, score only the
    ``nprobe`` cells closest to each query.  The centroid table is tiny and
    broadcast; the cell filter happens inside map_batches (no shuffle).

    Centroids are learned from a HASH-SPREAD sample: rows whose id hash
    falls on a stride — deterministic, parallelism-independent, and
    unbiased w.r.t. the corpus layout.  (A head-of-stream ``limit`` sample
    — the round-2 flaw — silently degrades recall on inputs sorted or
    clustered by topic: the centroids only see the first topics.)"""
    sample = _centroid_sample(ds, id_col, vec_col, sample_n, n_cells)
    cents = _kmeanspp_lite(sample, n_cells)
    cents_ref = ray.put(cents)

    q = np.asarray(queries, dtype=np.float64)
    qd = np.linalg.norm(q[:, None, :] - cents[None, :, :], axis=2)
    # (n_queries, n_cells) bool: which cells each query probes
    probe_mask = np.zeros((len(q), n_cells), dtype=bool)
    for qi in range(len(q)):
        probe_mask[qi, np.argsort(qd[qi])[:nprobe]] = True
    wanted_mask = probe_mask.any(axis=0)

    class CellFilterTopK(_ScoreTopK):
        def __init__(self, query_ref, id_col, vec_col, k):
            super().__init__(query_ref, id_col, vec_col, k)
            self.cents = ray.get(cents_ref)
            # ‖c‖² once per actor: cell assignment is then one matmul +
            # argmin over (‖c‖² - 2 v·c), never an (n x C x d) tensor
            self.cents_sq = (self.cents ** 2).sum(axis=1)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            ids = batch[self.id_col].to_numpy()
            v = np.stack(batch[self.vec_col].to_numpy()).astype(np.float64)
            cell = (self.cents_sq[None, :] - 2.0 * (v @ self.cents.T)).argmin(axis=1)
            keep = wanted_mask[cell]
            if not keep.any():
                return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                     self.id_col: pd.Series([], dtype=ids.dtype),
                                     "cosine": pd.Series([], dtype="float64")})
            ids_k, v_k, cell_k = ids[keep], v[keep], cell[keep]
            norms = np.linalg.norm(v_k, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sim = (v_k / norms) @ self.qn.T  # (n_keep, n_queries)
            # mask out rows whose cell this query does not probe, then the
            # shared tie-broken partial top-k (positions, no id searching)
            allowed = probe_mask[:, cell_k].T  # (n_keep, n_queries)
            sim = np.where(allowed, sim, -np.inf)
            out = self._partial_topk(ids_k, sim)
            return out[np.isfinite(out["cosine"])].reset_index(drop=True)

    query_ref = ray.put(q)
    partial = ds.map_batches(
        CellFilterTopK,
        fn_constructor_args=(query_ref, id_col, vec_col, k),
        batch_format="pandas",
        concurrency=concurrency or default_concurrency(),
        num_cpus=1,
    )

    def reduce_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = (
            group.sort_values(["cosine", id_col], ascending=[False, True], kind="mergesort")
            .head(k)
            .reset_index(drop=True)
        )
        g["cosine"] = round_half_away(g["cosine"], 6)
        return g

    return partial.groupby("query_id").map_groups(reduce_topk, batch_format="pandas")


def quantize_embeddings_batch(batch: pd.DataFrame,
                              vec_col: str = "embedding",
                              id_col: str = "vec_id") -> pd.DataFrame:
    """Per-vector symmetric int8 quantization — the storage/transport
    form ANN services keep vectors in (4x smaller than float32, one
    dequant multiply to restore): ``scale = max(|v|) / 127`` per
    vector, ``q_i = round(v_i / scale)`` (half away from zero, the SQL
    round rule), all-zero vectors get scale 0 and all-zero codes.

    Frozen rule: float32 inputs widen to float64 BEFORE the divide
    (matching the oracle's DOUBLE casts); ``scale`` is emitted rounded
    to 8 places for the oracle while codes use the unrounded scale.
    One narrow vectorized map, zero shuffles.

    Output: ``(id_col, q: list<int64 in [-127,127]>, scale)``."""
    from pdf_extract_ray.util import round_half_away as _r

    X = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
    amax = np.abs(X).max(axis=1)
    scale = amax / 127.0
    safe = np.where(scale > 0, scale, 1.0)
    q = np.sign(X) * np.floor(np.abs(X / safe[:, None]) + 0.5)
    q = np.where(scale[:, None] > 0, q, 0.0).astype(np.int64)
    return pd.DataFrame({
        id_col: batch[id_col].to_numpy(),
        "q": list(q),
        "scale": _r(scale, 8),
    })


def quantize_embeddings_oracle_sql(table: str = "embeddings",
                                   vec_col: str = "embedding",
                                   id_col: str = "vec_id") -> str:
    """DuckDB mirror of :func:`quantize_embeddings_batch` (list_max of
    |v| / 127, per-element round; all-zero vectors -> zero codes)."""
    return f"""
WITH b AS (
  SELECT {id_col},
         list_transform({vec_col},
                        x -> abs(CAST(x AS DOUBLE))) AS av,
         list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v
  FROM {table}
),
s AS (SELECT {id_col}, v, list_max(av) / 127.0 AS scale FROM b)
SELECT {id_col},
       CASE WHEN scale > 0
            THEN list_transform(v, x -> CAST(round(x / scale) AS BIGINT))
            ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS q,
       round(scale, 8) AS scale
FROM s
"""


def grouped_centroids(
    ds: Dataset,
    keys,
    vec_col: str = "embedding",
    *,
    num_buckets: int | None = None,
) -> Dataset:
    """Mean embedding per group — the k-means/IVF assignment-step
    reducer and the per-language / per-source class-centroid builder.

    Scale shape: each batch reduces to ONE (sum-vector, n) partial per
    group it contains (a D-float row, bodies never move), then ONE tiny
    bucketed merge divides summed vectors by summed counts.  Vector
    sums are numpy column sums; on integer-valued components every sum
    is exact, so the mean is bit-identical to the SQL mirror's
    per-dimension AVG (one IEEE division of exact values).

    Output: ``(*keys, centroid: list<double>, n_vecs: int64)``."""
    from pdf_extract_ray.stages.agg import bucketed_group_apply

    keys = list(keys)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = {k: [] for k in keys}
        sums, ns = [], []
        for kv, g in b.groupby(keys, sort=False, dropna=False):
            kv = kv if isinstance(kv, tuple) else (kv,)
            m = np.stack([np.asarray(v, dtype=np.float64)
                          for v in g[vec_col]])
            for k, v in zip(keys, kv):
                rows[k].append(v)
            sums.append(m.sum(axis=0))
            ns.append(np.int64(len(g)))
        rows["__sum"] = sums
        rows["__n"] = pd.Series(ns, dtype="int64")
        return pd.DataFrame(rows)

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        rows = {k: [] for k in keys}
        cents, ns = [], []
        for kv, g in bucket.groupby(keys, sort=False, dropna=False):
            kv = kv if isinstance(kv, tuple) else (kv,)
            total = np.stack([np.asarray(v, dtype=np.float64)
                              for v in g["__sum"]]).sum(axis=0)
            n = int(g["__n"].sum())
            for k, v in zip(keys, kv):
                rows[k].append(v)
            cents.append(total / n)
            ns.append(np.int64(n))
        rows["centroid"] = cents
        rows["n_vecs"] = pd.Series(ns, dtype="int64")
        return pd.DataFrame(rows)

    return bucketed_group_apply(
        ds.map_batches(partial, batch_format="pandas"), keys, merge,
        num_buckets=num_buckets)


def grouped_centroids_oracle_sql(
    table_sql: str,
    keys,
    vec_col: str = "embedding",
) -> str:
    """DuckDB mirror of :func:`grouped_centroids` — per-dimension
    sum/count over unnest-with-subscripts, re-assembled in dimension
    order.  Bit-identical on integer-valued components (exact sums,
    one division)."""
    part = ", ".join(keys)
    return f"""
WITH __gc_x AS (
  SELECT {part},
         unnest({vec_col}) AS x,
         generate_subscripts({vec_col}, 1) AS dim
  FROM ({table_sql})),
__gc_d AS (
  SELECT {part}, dim,
         sum(CAST(x AS DOUBLE)) / count(*) AS m,
         count(*) AS c
  FROM __gc_x GROUP BY {part}, dim)
SELECT {part},
       list(m ORDER BY dim) AS centroid,
       CAST(min(c) AS BIGINT) AS n_vecs
FROM __gc_d GROUP BY {part}
"""


# --- Johnson–Lindenstrauss random sign projection ----------------------------

_SIGN_CACHE: dict = {}


def _jl_sign_matrix(d: int, k: int) -> np.ndarray:
    """Deterministic ±1 sign matrix (d x k), entry (j, kk) 1-based from
    the parity of the first hex digit of md5(f"{j}_{kk}") — the same
    rule the SQL oracle evaluates with strpos('0123456789abcdef', ...).
    Cached per worker process (built once per (d, k), ~d·k tiny md5s)."""
    key = (int(d), int(k))
    got = _SIGN_CACHE.get(key)
    if got is None:
        import hashlib

        S = np.empty((d, k), dtype=np.int64)
        for j in range(1, d + 1):
            for kk in range(1, k + 1):
                digit = hashlib.md5(f"{j}_{kk}".encode()).hexdigest()[0]
                S[j - 1, kk - 1] = 1 if int(digit, 16) % 2 == 0 else -1
        _SIGN_CACHE[key] = got = S
    return got


def random_project(
    ds: Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    out_dim: int = 8,
    scale: int = 1000,
) -> Dataset:
    """Johnson–Lindenstrauss random sign projection (Achlioptas 2003's
    database-friendly ±1 variant): project each embedding onto
    ``out_dim`` deterministic ±1 directions — the cheap
    dimensionality-reduction front of LSH bucketing, sketched ANN and
    drift fingerprints.

    Exactness: vectors are floor-quantized to int64 (``floor(x·scale)``
    after a float64 widen, the kmeans/centroid convention), the sign
    matrix is ±1 int64 derived from md5 parity (frozen, shared with the
    SQL mirror), so every projection is an EXACT integer dot product —
    the output is bit-identical to :func:`random_project_oracle_sql`
    with no rounding convention needed.

    Scale shape: one narrow map, zero shuffles; the (d × out_dim) sign
    matrix is rebuilt once per worker from the hash rule (cheaper than
    broadcasting — it is pure code).  Output: tidy ``(id, k, proj)``
    rows, k 1-based, BIGINT proj.
    """
    out_dim = int(out_dim)
    scale = int(scale)
    if out_dim < 1:
        raise ValueError("out_dim must be >= 1")

    def project(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({id_col: [], "k": [], "proj": []})
        X = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        Xq = np.floor(X * scale).astype(np.int64)
        S = _jl_sign_matrix(X.shape[1], out_dim)
        P = Xq @ S
        n = len(b)
        return pd.DataFrame({
            id_col: np.repeat(b[id_col].to_numpy(np.int64), out_dim),
            "k": np.tile(np.arange(1, out_dim + 1, dtype=np.int64), n),
            "proj": P.ravel(),
        })

    return ds.map_batches(project, batch_format="pandas")


def random_project_oracle_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    out_dim: int = 8,
    scale: int = 1000,
) -> str:
    """DuckDB mirror of :func:`random_project`: unnest to (id, j, x),
    floor-quantize after an explicit DOUBLE widen, join the same
    md5-parity sign table, integer dot product — exact BIGINT parity."""
    return f"""
WITH __rp_w AS (
  SELECT {id_col} AS id,
         unnest(range(1, len({vec_col}) + 1)) AS j,
         CAST(floor(CAST(unnest({vec_col}) AS DOUBLE) * {int(scale)})
              AS BIGINT) AS xq
  FROM {table}
),
__rp_s AS (
  SELECT d.j, k.k,
         CASE WHEN (strpos('0123456789abcdef',
                           substr(md5(d.j || '_' || k.k), 1, 1)) - 1)
                   % 2 = 0
              THEN 1 ELSE -1 END AS sgn
  FROM (SELECT DISTINCT j FROM __rp_w) d,
       (SELECT unnest(range(1, {int(out_dim)} + 1)) AS k) k
)
SELECT w.id AS {id_col}, CAST(s.k AS BIGINT) AS k,
       CAST(sum(w.xq * s.sgn) AS BIGINT) AS proj
FROM __rp_w w JOIN __rp_s s ON s.j = w.j
GROUP BY w.id, s.k
"""


def knn_join(
    ds: Dataset,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_cells: int = 8,
    sample_n: int = 2048,
    max_cell: int = 200_000,
    num_buckets: int | None = None,
) -> Dataset:
    """k-nearest-neighbor SELF-join over an embedding column: each
    vector's top-``k`` cosine neighbors among vectors of the SAME
    coarse cell — the all-pairs primitive behind embedding-based
    curation (SemDeDup-style cluster pruning, hard-negative mining,
    neighborhood-consistency audits).

    PARTITIONING ASSUMPTION (documented, the IVF trade): neighbors are
    exact WITHIN a cell; a true neighbor on the far side of a cell
    boundary is missed.  Cells come from the deterministic hash-spread
    sample + kmeans++-lite centroids (:func:`ivf_topk`'s machinery), so
    the result is parallelism-independent and golden-stable.

    Deterministic output rule: cosine rounded half-away to 6, top-k by
    (cosine DESC, neighbor id ASC), self excluded; rows emit as
    ``(id, neighbor_id, rank, cosine)``.

    Scale shape: ONE bucketed shuffle keyed by cell id; per-cell work
    is quadratic IN THE CELL (Σ|cell|², not n²) — cells above
    ``max_cell`` are dropped with a logged warning (the capped-bucket
    convention); raise ``n_cells`` to shrink cells at scale."""
    import logging

    from pdf_extract_ray.stages.agg import bucketed_group_apply
    from pdf_extract_ray.util import round_half_away

    cents = _kmeanspp_lite(
        _centroid_sample(ds, id_col, vec_col, sample_n, n_cells), n_cells)
    cents_ref = ray.put(cents)
    cents_sq_ref = ray.put((cents ** 2).sum(axis=1))

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cents_ref)
        csq = ray.get(cents_sq_ref)
        v = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        cell = (csq[None, :] - 2.0 * (v @ c.T)).argmin(axis=1)
        return pd.DataFrame({
            "__cell": cell.astype(np.int64),
            id_col: b[id_col].to_numpy(),
            vec_col: b[vec_col],
        })

    def body(g: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for cell, sub in g.groupby("__cell", sort=True):
            n = len(sub)
            if n < 2:
                continue
            if n > max_cell:
                logging.getLogger(__name__).warning(
                    "knn_join: cell %d has %d > max_cell=%d vectors; "
                    "dropped (raise n_cells)", int(cell), n, max_cell)
                continue
            sub = sub.sort_values(id_col, kind="mergesort")
            ids = sub[id_col].to_numpy()
            v = np.stack(sub[vec_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(v, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            vn = v / norms
            sim = round_half_away(vn @ vn.T, 6)
            np.fill_diagonal(sim, -np.inf)
            kk = min(k, n - 1)
            for i in range(n):
                top = _topk_indices(ids, sim[i], kk)
                frames.append(pd.DataFrame({
                    id_col: ids[i],
                    "neighbor_id": ids[top],
                    "rank": np.arange(1, len(top) + 1, dtype=np.int64),
                    "cosine": sim[i][top],
                }))
        if not frames:
            return pd.DataFrame({
                id_col: pd.Series([], dtype="int64"),
                "neighbor_id": pd.Series([], dtype="int64"),
                "rank": pd.Series([], dtype="int64"),
                "cosine": pd.Series([], dtype="float64")})
        return pd.concat(frames, ignore_index=True)

    return bucketed_group_apply(
        ds.map_batches(assign, batch_format="pandas"), ["__cell"], body,
        num_buckets=num_buckets)


def embedding_norm_stats(
    ds: Dataset,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Dataset:
    """Embedding health audit — ``(id, l2_norm, is_zero)`` per vector:
    zero/degenerate vectors poison cosine similarity (the engine's
    kernels guard them, but a corpus where 10% of embeddings are zero
    is an upstream-model bug worth a report).  ``l2_norm`` is rounded
    half-away to 6.

    One narrow vectorized map, zero shuffles.  SQL-parity note: the
    per-row sum runs over the embedding dim (<128), where numpy's
    pairwise reduction is sequential — bit-identical to the SQL list
    fold."""
    from pdf_extract_ray.util import round_half_away

    def batch(b: pd.DataFrame) -> pd.DataFrame:
        v = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        sq = (v * v).sum(axis=1)
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(),
            "l2_norm": round_half_away(np.sqrt(sq), 6),
            "is_zero": sq == 0.0,
        })

    return ds.map_batches(batch, batch_format="pandas")


def embedding_norm_oracle_sql(
    table: str = "embeddings",
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB mirror of :func:`embedding_norm_stats`."""
    sq = (f"list_sum(list_transform({vec_col}, "
          f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))")
    return (f"SELECT {id_col}, round(sqrt({sq}), 6) AS l2_norm, "
            f"{sq} = 0 AS is_zero FROM {table}")
