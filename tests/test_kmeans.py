"""Distributed Lloyd k-means (stages/kmeans.py): bitwise equality with a
plain single-process reference across partitionings, frozen empty-cluster
and tie rules, and the centroid-table product."""

import numpy as np
import pandas as pd
import pytest

from pdf_extract_ray.stages.kmeans import kmeans, kmeans_centroids


def _vecs(n=120, d=8, seed=4):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": list(rng.normal(0, 0.3, (n, d)).astype(np.float32)),
    })


def _reference(df, k, n_iters, scale=1000):
    order = np.argsort(df["vec_id"].to_numpy(np.int64), kind="stable")
    ids = df["vec_id"].to_numpy(np.int64)[order]
    xq = np.floor(np.stack(df["embedding"].to_numpy())[order]
                  .astype(np.float64) * scale)
    cents = xq[:k].copy()

    def assign(c):
        best = np.full(len(xq), np.inf)
        cl = np.zeros(len(xq), dtype=np.int64)
        for j in range(k):
            dd = xq - c[j]
            dist = (dd * dd).sum(axis=1)
            hit = dist < best
            best[hit] = dist[hit]
            cl[hit] = j
        return cl, best

    for _ in range(n_iters):
        cl, _ = assign(cents)
        for j in range(k):
            m = cl == j
            if m.any():
                cents[j] = xq[m].sum(axis=0) / np.float64(m.sum())
    cl, dist = assign(cents)
    return pd.DataFrame({"vec_id": ids, "cluster": cl, "dist": dist}), cents


@pytest.mark.parametrize("blocks", [1, 7])
@pytest.mark.parametrize("n_iters", [0, 3])
def test_kmeans_bitwise_matches_reference(ray_session, blocks, n_iters):
    import ray.data as rd

    df = _vecs()
    got = (kmeans(rd.from_pandas(df).repartition(blocks), k=5,
                  n_iters=n_iters)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    want, _ = _reference(df, 5, n_iters)
    # bitwise: no tolerance on dist
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)


def test_kmeans_centroids_and_empty_cluster_rule(ray_session):
    import ray.data as rd

    # two far blobs, k=3: at least one cluster must go empty and keep
    # its seed centroid
    df = pd.DataFrame({
        "vec_id": np.arange(40, dtype=np.int64),
        "embedding": list(np.where(
            (np.arange(40) % 2 == 0)[:, None],
            np.full((40, 4), 10.0), np.full((40, 4), -10.0)
        ).astype(np.float32))})
    cents = kmeans_centroids(rd.from_pandas(df).repartition(3), k=3,
                             n_iters=2)
    _, ref_cents = _reference(df, 3, 2)
    assert len(cents) == 3
    for j in range(3):
        np.testing.assert_array_equal(
            np.asarray(cents["centroid"].iloc[j]), ref_cents[j])
    assert cents["n_vecs"].sum() == 40
    assert (cents["n_vecs"] == 0).any()  # the empty cluster exists
    with pytest.raises(ValueError):
        kmeans(rd.from_pandas(df), k=0, n_iters=1)
    with pytest.raises(ValueError):
        kmeans(rd.from_pandas(df), k=100, n_iters=1)


def test_silhouette_bounds_and_separated_blobs(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pdf_extract_ray.stages.kmeans import silhouette

    rng = np.random.RandomState(4)
    a = rng.normal(0, 0.01, (30, 4)) + np.r_[1.0, 0, 0, 0]
    b = rng.normal(0, 0.01, (30, 4)) + np.r_[0, 0, 0, 1.0]
    df = pd.DataFrame({
        "vec_id": np.arange(60),
        "embedding": [v.astype("float32") for v in np.vstack([a, b])],
    })
    got = (silhouette(rd.from_pandas(df).repartition(3), k=2, n_iters=3)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    assert got["silhouette"].between(-1, 1).all()
    # tight well-separated blobs: near-perfect silhouette everywhere
    assert (got["silhouette"] > 0.9).all()
    # the two blobs land in different clusters
    assert got.loc[:29, "cluster"].nunique() == 1
    assert got.loc[30:, "cluster"].nunique() == 1
    assert got.loc[0, "cluster"] != got.loc[59, "cluster"]
