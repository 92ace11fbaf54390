"""Triangle counting + reciprocal pairs (stages/graph.py) vs brute-force
references on random and adversarial graphs."""

from itertools import combinations

import numpy as np
import pandas as pd
import pytest

from pdf_extract_ray.stages.graph import count_triangles, reciprocal_pairs


def _brute_triangles(edges: pd.DataFrame) -> dict:
    und = set()
    for a, b in zip(edges["src"], edges["dst"]):
        if a != b:
            und.add((min(a, b), max(a, b)))
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts: dict = {}
    for x, y, z in combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for n in (x, y, z):
                counts[n] = counts.get(n, 0) + 1
    return counts


@pytest.mark.parametrize("blocks", [1, 6])
def test_triangles_random_graph(ray_session, blocks):
    import ray.data as rd

    rng = np.random.default_rng(3)
    edges = pd.DataFrame({
        "src": rng.integers(0, 25, size=300),
        "dst": rng.integers(0, 25, size=300),
    })
    got = (count_triangles(rd.from_pandas(edges).repartition(blocks))
           .to_pandas())
    want = _brute_triangles(edges)
    assert dict(zip(got["node"], got["n_triangles"])) == want


def test_triangles_hub_star_and_duplicates(ray_session):
    import ray.data as rd

    # star around node 0 (no triangles) + one triangle + dupes/reverses
    edges = pd.DataFrame({
        "src": [0] * 10 + [1, 2, 3, 3, 1, 1],
        "dst": list(range(10, 20)) + [2, 3, 1, 1, 2, 1],
    })
    got = count_triangles(rd.from_pandas(edges)).to_pandas()
    assert dict(zip(got["node"], got["n_triangles"])) == {1: 1, 2: 1, 3: 1}


def test_triangles_id_contract(ray_session):
    import ray.data as rd

    edges = pd.DataFrame({"src": [2 ** 31], "dst": [1]})
    with pytest.raises(Exception, match="2\\^31"):
        count_triangles(rd.from_pandas(edges)).to_pandas()


@pytest.mark.parametrize("blocks", [1, 4])
def test_reciprocal_pairs(ray_session, blocks):
    import ray.data as rd

    edges = pd.DataFrame({
        "src": [1, 2, 3, 4, 5, 5, 1, 2],
        "dst": [2, 1, 4, 5, 4, 5, 2, 1],  # 1<->2 and 4<->5; 5->5 loop
    })
    got = (reciprocal_pairs(rd.from_pandas(edges).repartition(blocks))
           .to_pandas().sort_values(["lo", "hi"]).reset_index(drop=True))
    assert list(map(tuple, got[["lo", "hi"]].to_numpy())) == [(1, 2), (4, 5)]
