"""Distributed PCA over an embedding column — the whitening /
dimensionality-reduction step embedding-curation pipelines run before
clustering or ANN (SemDeDup-style pipelines normalize and reduce
vectors; product quantizers train on PCA-rotated data).

Scale shape (the part that actually touches 100 TB): ONE streaming
pass computes the moment partials per batch — ``n`` (count), ``s``
(sum vector, D) and ``SS`` (sum of outer products, D x D) — each a
BOUNDED array independent of row count.  Partials tree-reduce through
one ``repartition(16)`` combine level, so the driver materializes at
most 16 rows of (D^2 + D + 1) floats no matter the corpus size.  The
eigendecomposition itself is a driver-side O(D^3) triviality (D <= a
few thousand), and the projection is one broadcast (k x D) matmul per
batch — zero shuffles end to end.

Frozen rules:
- covariance is the POPULATION covariance ``E[xy] - E[x]E[y]`` in
  float64 (float32 inputs are widened BEFORE any product, matching the
  SQL oracle's explicit DOUBLE casts);
- eigenvector sign: the component with the largest absolute value is
  made positive (ties: the earliest index, np.argmax order);
- components are ordered by eigenvalue descending, ties by the
  original symmetric-eig order.

The driver-gated query checks the distributed part (the moments) via a
FULL SQL oracle; the eig/projection math is pytest-gated with
tolerance assertions (eigenvectors amplify last-ulp noise by the
inverse eigen gap, so bit-exactness across summation orders is not a
meaningful contract there).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data import Dataset

from pdf_extract_ray.util import round_half_away


def _moment_partials(ds: Dataset, vec_col: str) -> tuple[
        np.int64, np.ndarray, np.ndarray]:
    """(n, s, SS) summed over the whole dataset via per-batch partials
    + one repartition(16) combine level + a <=16-row driver sum."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({"n": [], "s": [], "SS": []})
        X = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        return pd.DataFrame({
            "n": [np.int64(len(X))],
            "s": [X.sum(axis=0)],
            "SS": [(X.T @ X).ravel()],
        })

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return b
        return pd.DataFrame({
            "n": [np.int64(b["n"].sum())],
            "s": [np.sum(np.stack(b["s"].to_numpy()), axis=0)],
            "SS": [np.sum(np.stack(b["SS"].to_numpy()), axis=0)],
        })

    rows = (ds.map_batches(partial, batch_format="pandas")
            .repartition(16)
            .map_batches(combine, batch_size=None, batch_format="pandas")
            .take_all())
    n = np.int64(sum(r["n"] for r in rows))
    s = np.sum(np.stack([np.asarray(r["s"]) for r in rows]), axis=0)
    SS = np.sum(np.stack([np.asarray(r["SS"]) for r in rows]), axis=0)
    return n, s, SS


def embedding_covariance(ds: Dataset, vec_col: str = "embedding",
                         ndigits: int = 4) -> pd.DataFrame:
    """Population covariance matrix of the embedding column as tidy
    ``(i, j, cov)`` rows (1-based indices, upper triangle i <= j,
    rounded half-away to ``ndigits``) — the distributed-moments
    surface the SQL oracle checks exactly."""
    n, s, SS = _moment_partials(ds, vec_col)
    d = len(s)
    mu = s / n
    cov = SS.reshape(d, d) / n - np.outer(mu, mu)
    iu, ju = np.triu_indices(d)
    return pd.DataFrame({
        "i": (iu + 1).astype(np.int64),
        "j": (ju + 1).astype(np.int64),
        "cov": round_half_away(cov[iu, ju], ndigits),
    })


def embedding_covariance_oracle_sql(table: str = "embeddings",
                                    vec_col: str = "embedding",
                                    id_col: str = "vec_id",
                                    ndigits: int = 4) -> str:
    """DuckDB mirror of :func:`embedding_covariance`: unnest to
    (id, i, v), widen to DOUBLE before any product, self-join per
    vector for the upper triangle, population E[xy] - E[x]E[y]."""
    return f"""
WITH w AS (
  SELECT {id_col} AS id,
         unnest(range(1, len({vec_col}) + 1)) AS i,
         CAST(unnest({vec_col}) AS DOUBLE) AS v
  FROM {table}
),
m AS (SELECT i, avg(v) AS mu FROM w GROUP BY i),
p AS (
  SELECT a.i AS i, b.i AS j, avg(a.v * b.v) AS exy
  FROM w a JOIN w b ON a.id = b.id AND a.i <= b.i
  GROUP BY a.i, b.i
)
SELECT p.i, p.j, round(p.exy - ma.mu * mb.mu, {ndigits}) AS cov
FROM p JOIN m ma ON ma.i = p.i JOIN m mb ON mb.i = p.j
"""


def fit_pca(ds: Dataset, k: int, vec_col: str = "embedding") -> dict:
    """Fit a k-component PCA from one distributed moment pass.
    Returns ``{"mean": (D,), "components": (k, D), "eigvals": (k,)}``
    with the frozen sign/order rules from the module docstring."""
    n, s, SS = _moment_partials(ds, vec_col)
    d = len(s)
    mu = s / n
    cov = SS.reshape(d, d) / n - np.outer(mu, mu)
    w, v = np.linalg.eigh(cov)          # ascending eigenvalues
    order = np.argsort(-w, kind="stable")[:k]
    comps = v[:, order].T               # (k, D)
    # frozen sign rule: largest-|component| entry positive
    flip = comps[np.arange(len(comps)),
                 np.argmax(np.abs(comps), axis=1)] < 0
    comps[flip] *= -1.0
    return {"mean": mu, "components": comps, "eigvals": w[order]}


def transform_pca(ds: Dataset, model: dict,
                  vec_col: str = "embedding",
                  id_col: str = "vec_id") -> Dataset:
    """Project every vector onto the fitted components: one narrow
    broadcast-matmul map (``(X - mean) @ components.T``), zero
    shuffles.  Output: ``(id_col, pc: list<double>)``."""
    mu = np.asarray(model["mean"], dtype=np.float64)
    comps = np.asarray(model["components"], dtype=np.float64)

    def project(b: pd.DataFrame) -> pd.DataFrame:
        X = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        P = (X - mu) @ comps.T
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(),
            "pc": list(P),
        })

    return ds.map_batches(project, batch_format="pandas")
