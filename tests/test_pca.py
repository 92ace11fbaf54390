"""Distributed PCA (stages/pca.py): moment partials vs single-process
numpy, SQL covariance parity, eig/projection properties."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd


def _clustered(n=400, d=16, seed=9):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 5, size=(3, d)).astype(np.float32)
    X = (centers[rng.integers(0, 3, size=n)]
         + rng.normal(0, 0.5, size=(n, d))).astype(np.float32)
    return pd.DataFrame({"vec_id": np.arange(n), "embedding": list(X)})


def test_covariance_matches_numpy_and_sql(ray_session):
    from pdf_extract_ray.stages.pca import (
        embedding_covariance,
        embedding_covariance_oracle_sql,
    )

    df = _clustered()
    got = (embedding_covariance(rd.from_pandas(df).repartition(7))
           .sort_values(["i", "j"]).reset_index(drop=True))
    # independent single-process reference (population covariance)
    X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    ref = X.T @ X / len(X) - np.outer(X.mean(0), X.mean(0))
    iu, ju = np.triu_indices(X.shape[1])
    np.testing.assert_allclose(got["cov"].to_numpy(), ref[iu, ju],
                               atol=5e-4)
    # SQL parity (the driver-gate contract, exact after round-4)
    con = duckdb.connect()
    con.register("embeddings", df)
    want = (con.sql(embedding_covariance_oracle_sql()).df()
            .sort_values(["i", "j"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_fit_pca_properties_and_projection(ray_session):
    from pdf_extract_ray.stages.pca import fit_pca, transform_pca

    df = _clustered()
    ds = rd.from_pandas(df).repartition(5)
    model = fit_pca(ds, k=4)
    comps = model["components"]
    assert comps.shape == (4, 16)
    # orthonormal rows, eigenvalues descending, sign rule applied
    np.testing.assert_allclose(comps @ comps.T, np.eye(4), atol=1e-9)
    assert (np.diff(model["eigvals"]) <= 1e-9).all()
    mx = np.argmax(np.abs(comps), axis=1)
    assert (comps[np.arange(4), mx] > 0).all()
    # matches single-process numpy PCA up to the frozen sign rule
    X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    cov = np.cov(X, rowvar=False, bias=True)
    w, v = np.linalg.eigh(cov)
    ref = v[:, np.argsort(-w, kind="stable")[:4]].T
    flip = ref[np.arange(4), np.argmax(np.abs(ref), axis=1)] < 0
    ref[flip] *= -1.0
    np.testing.assert_allclose(comps, ref, atol=1e-6)
    # projection: narrow map, centred, variance per PC == eigenvalue
    proj = (transform_pca(ds, model).to_pandas()
            .sort_values("vec_id").reset_index(drop=True))
    P = np.stack(proj["pc"].to_numpy())
    assert P.shape == (len(df), 4)
    np.testing.assert_allclose(P.mean(axis=0), 0, atol=1e-9)
    np.testing.assert_allclose(P.var(axis=0), model["eigvals"],
                               rtol=1e-9)
    # the 3-cluster structure survives in the top PCs: projecting the
    # cluster centres apart means within-cluster distance << between
    np.testing.assert_allclose(
        P, (X - model["mean"]) @ comps.T, atol=1e-9)
