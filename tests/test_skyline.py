"""Distributed Pareto skyline (stages/skyline.py) vs brute-force
dominance, across block counts, dimensions and tie shapes."""

import numpy as np
import pandas as pd
import pytest

from pdf_extract_ray.stages.skyline import (
    local_skyline,
    pareto_frontier,
)


def _brute(df: pd.DataFrame, cols) -> pd.DataFrame:
    vals = df[cols].to_numpy()
    keep = []
    for i in range(len(vals)):
        dom = ((vals >= vals[i]).all(axis=1)
               & (vals > vals[i]).any(axis=1)).any()
        keep.append(not dom)
    return df[np.array(keep, dtype=bool)]


def _rand(n, d, seed, lo=0, hi=30):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(rng.integers(lo, hi, size=(n, d)),
                      columns=[f"m{i}" for i in range(d)])
    df.insert(0, "rid", np.arange(n))
    return df


@pytest.mark.parametrize("d", [2, 3])
@pytest.mark.parametrize("seed", [1, 2])
def test_local_skyline_matches_brute(d, seed):
    df = _rand(300, d, seed)
    cols = [f"m{i}" for i in range(d)]
    got = set(local_skyline(df, cols)["rid"])
    want = set(_brute(df, cols)["rid"])
    assert got == want


def test_local_skyline_keeps_duplicate_frontier_points():
    df = pd.DataFrame({"rid": [0, 1, 2], "x": [5, 5, 1], "y": [7, 7, 9]})
    got = local_skyline(df, ["x", "y"])
    assert set(got["rid"]) == {0, 1, 2}


@pytest.mark.parametrize("blocks", [1, 8])
def test_pareto_frontier_distributed(ray_session, blocks):
    import ray.data as rd

    df = _rand(500, 2, seed=5)
    got = (pareto_frontier(rd.from_pandas(df).repartition(blocks),
                           ["m0", "m1"]).to_pandas())
    want = _brute(df, ["m0", "m1"])
    assert set(got["rid"]) == set(want["rid"])


def test_pareto_frontier_cap_raises(ray_session):
    import ray.data as rd

    # perfectly anti-correlated line: EVERY row is on the frontier
    n = 50
    df = pd.DataFrame({"rid": range(n), "x": range(n),
                       "y": range(n - 1, -1, -1)})
    with pytest.raises(Exception, match="max_frontier_rows"):
        pareto_frontier(rd.from_pandas(df), ["x", "y"],
                        max_frontier_rows=10).to_pandas()
