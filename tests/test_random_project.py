"""JL random sign projection (stages/similarity.random_project) vs a
plain-numpy reference and the DuckDB unnest/join mirror — the output is
all-integer, so every check is exact equality."""

import hashlib

import numpy as np
import pandas as pd
import pytest


def _ref_signs(d: int, k: int) -> np.ndarray:
    S = np.empty((d, k), dtype=np.int64)
    for j in range(1, d + 1):
        for kk in range(1, k + 1):
            digit = hashlib.md5(f"{j}_{kk}".encode()).hexdigest()[0]
            S[j - 1, kk - 1] = 1 if int(digit, 16) % 2 == 0 else -1
    return S


def _vecs(n=60, d=16, seed=5) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [rng.normal(0, 0.3, d).astype(np.float32)
                      for _ in range(n)],
    })


@pytest.mark.parametrize("blocks", [1, 5])
def test_random_project_matches_reference_and_sql(ray_session, blocks):
    import duckdb
    import ray.data as rd

    from pdf_extract_ray.stages.similarity import (
        random_project, random_project_oracle_sql)

    df = _vecs()
    got = (random_project(rd.from_pandas(df).repartition(blocks),
                          out_dim=6, scale=1000)
           .to_pandas().sort_values(["vec_id", "k"]).reset_index(drop=True))
    # plain reference: quantize then integer matmul against the md5 signs
    X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    Xq = np.floor(X * 1000).astype(np.int64)
    P = Xq @ _ref_signs(16, 6)
    want = pd.DataFrame({
        "vec_id": np.repeat(df["vec_id"].to_numpy(), 6),
        "k": np.tile(np.arange(1, 7, dtype=np.int64), len(df)),
        "proj": P.ravel(),
    }).sort_values(["vec_id", "k"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # SQL mirror: exact BIGINT equality
    con = duckdb.connect()
    con.register("embeddings", df)
    sql = (con.sql(random_project_oracle_sql(out_dim=6, scale=1000))
           .df().sort_values(["vec_id", "k"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, sql, check_dtype=False)


def test_random_project_distance_preservation(ray_session):
    import ray.data as rd

    from pdf_extract_ray.stages.similarity import random_project

    # JL sanity: projected squared distances concentrate near d_out/d_in
    # times the original (signs are unit-variance) — a loose statistical
    # band, the exactness is covered by the parity test above.
    df = _vecs(n=40, d=32, seed=9)
    got = (random_project(rd.from_pandas(df), out_dim=16, scale=1000)
           .to_pandas())
    P = (got.sort_values(["vec_id", "k"])["proj"].to_numpy()
         .reshape(len(df), 16).astype(np.float64))
    X = np.floor(np.stack(df["embedding"].to_numpy()).astype(np.float64)
                 * 1000)
    dx = np.linalg.norm(X[0] - X[1:], axis=1) ** 2
    dp = np.linalg.norm(P[0] - P[1:], axis=1) ** 2
    ratio = dp / (16 * dx / 32 * 32)  # E[dp] = out_dim * dx  (sign variance 1)
    # E[|Sx|^2] = out_dim * |x|^2; allow a wide concentration band
    ratio = dp / (16 * dx)
    assert 0.3 < np.median(ratio) < 3.0

    with pytest.raises(ValueError):
        random_project(rd.from_pandas(df), out_dim=0)
