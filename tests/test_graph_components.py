"""Distributed connected components + cluster dedup (stages/graph.py)."""

import numpy as np
import pandas as pd
import pytest

from pdf_extract_ray.stages.graph import connected_components, dedup_by_components


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min node per component
    comp = {}
    for n in list(parent):
        comp[n] = find(n)
    return comp


def _random_pairs(seed, n_nodes=300, n_edges=260):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, n_nodes, n_edges)
    b = rng.randint(0, n_nodes, n_edges)
    keep = a != b
    return list({(min(x, y), max(x, y)) for x, y in zip(a[keep], b[keep])})


@pytest.mark.parametrize("seed", [1])
def test_components_match_union_find(ray_session, seed):
    import ray.data as rd

    pairs = _random_pairs(seed)
    df = pd.DataFrame(pairs, columns=["id_a", "id_b"])
    got = {r["node"]: r["component"]
           for r in connected_components(
               rd.from_pandas(df).repartition(4)).take_all()}
    exp = _union_find(pairs)
    assert got == exp


def test_long_chain_converges(ray_session):
    """A path graph (worst-case diameter) still reaches the fixpoint:
    min-label propagation needs O(diameter) rounds here, bounded by
    max_iters."""
    import ray.data as rd

    n = 10
    df = pd.DataFrame({"id_a": range(n - 1), "id_b": range(1, n)})
    got = {r["node"]: r["component"]
           for r in connected_components(
               rd.from_pandas(df).repartition(3), max_iters=n).take_all()}
    assert got == {i: 0 for i in range(n)}


def test_dedup_by_components_keeps_representatives(ray_session):
    import ray.data as rd

    docs = pd.DataFrame({"doc_id": range(10), "text": [f"t{i}" for i in range(10)]})
    # clusters {0,1,2} (transitively via 0-1, 1-2) and {5,7}; 3,4,6,8,9 free
    pairs = pd.DataFrame({"id_a": [0, 1, 5], "id_b": [1, 2, 7]})
    kept = sorted(
        r["doc_id"] for r in dedup_by_components(
            rd.from_pandas(docs).repartition(3),
            rd.from_pandas(pairs)).take_all())
    assert kept == [0, 3, 4, 5, 6, 8, 9]


def test_large_int64_ids_survive_exactly(ray_session):
    """Regression (round-2 review): node ids above 2^53 must round-trip
    the shuffle as int64 — a nullable-int column would pass through
    float64 and silently merge adjacent ids."""
    import ray.data as rd

    base = 1 << 62
    # two clusters of ids that differ only below float64 precision
    pairs = pd.DataFrame({
        "id_a": [base, base + 1, base + 10],
        "id_b": [base + 1, base + 2, base + 11],
    })
    got = {r["node"]: r["component"]
           for r in connected_components(
               rd.from_pandas(pairs).repartition(2)).take_all()}
    assert got == {base: base, base + 1: base, base + 2: base,
                   base + 10: base + 10, base + 11: base + 10}


def test_empty_pairs_pass_through(ray_session):
    import ray.data as rd

    docs = pd.DataFrame({"doc_id": range(5), "text": list("abcde")})
    pairs = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                          "id_b": pd.Series([], dtype="int64")})
    kept = dedup_by_components(rd.from_pandas(docs),
                               rd.from_pandas(pairs)).take_all()
    assert len(kept) == 5


def test_negative_ids_rejected_loudly(ray_session):
    import ray.data as rd

    pairs = pd.DataFrame({"id_a": [-5, 1], "id_b": [1, 2]})
    with pytest.raises(Exception, match="NON-NEGATIVE"):
        connected_components(rd.from_pandas(pairs)).take_all()


def test_nonconvergence_raise_option(ray_session):
    """on_nonconvergence='raise' turns the silent-warning path into an
    exception so downstream dedup can never consume non-transitive
    labels (ADVICE r2); default still warns and returns."""
    import pytest
    import ray.data as rd

    n = 40  # path graph: needs ~n rounds, give it 2
    df = pd.DataFrame({"id_a": range(n - 1), "id_b": range(1, n)})
    ds = rd.from_pandas(df).repartition(3)
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(ds, max_iters=2, on_nonconvergence="raise"
                             ).take_all()
    # warn mode returns labels (possibly non-transitive) without raising
    out = connected_components(ds, max_iters=2).take_all()
    assert len(out) == n
    with pytest.raises(ValueError):
        connected_components(ds, on_nonconvergence="explode")


# ---------------------------------------------------------------------------
# large-star / small-star mode
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", [1, 2])
def test_star_matches_union_find(ray_session, seed):
    import ray.data as rd

    pairs = _random_pairs(seed)
    df = pd.DataFrame(pairs, columns=["id_a", "id_b"])
    got = {r["node"]: r["component"]
           for r in connected_components(
               rd.from_pandas(df).repartition(4), algorithm="star",
               on_nonconvergence="raise").take_all()}
    assert got == _union_find(pairs)


def test_star_long_path_log_rounds(ray_session):
    """A 300-node path needs ~300 propagation rounds but only O(log^2 n)
    star rounds — max_iters=10 must suffice (and 'raise' proves the
    fixpoint check passed, not just the iteration cap)."""
    import ray.data as rd

    n = 300
    df = pd.DataFrame({"id_a": range(n - 1), "id_b": range(1, n)})
    got = {r["node"]: r["component"]
           for r in connected_components(
               rd.from_pandas(df).repartition(4), algorithm="star",
               max_iters=10, on_nonconvergence="raise").take_all()}
    assert got == {i: 0 for i in range(n)}


def test_star_multi_parent_leaf_not_a_false_fixpoint(ray_session):
    """{(1,5),(2,5)} has disjoint parent/leaf sets but is NOT a star
    fixpoint (5 has two parents); the termination check must keep
    iterating until 1-2-5 fully merge."""
    import ray.data as rd

    df = pd.DataFrame({"id_a": [1, 2], "id_b": [5, 5]})
    got = {r["node"]: r["component"]
           for r in connected_components(
               rd.from_pandas(df), algorithm="star",
               on_nonconvergence="raise").take_all()}
    assert got == {1: 1, 2: 1, 5: 1}


def test_star_rejects_negative_and_bad_algorithm(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"id_a": [-1], "id_b": [2]})
    with pytest.raises(Exception):
        connected_components(rd.from_pandas(df),
                             algorithm="star").take_all()
    with pytest.raises(ValueError):
        connected_components(rd.from_pandas(df), algorithm="bogus")


class TestLabelPropagation:
    def test_parity_with_reference_and_topology(self, ray_session):
        import ray.data as rd

        from pdf_extract_ray.stages.graph import (
            label_propagation,
            label_propagation_reference,
        )

        e = []
        for base in (0, 100):
            for i in range(30):
                e.append((base + i, base + (i + 1) % 30))
                e.append((base + i, base + (i + 7) % 30))
        e.append((0, 100))          # bridge
        e.append((5, 5))            # self loop: dropped
        e.append((0, 1))            # parallel edge: counted once
        df = pd.DataFrame(e, columns=["src", "dst"])
        ref = label_propagation_reference(e)
        want = (pd.DataFrame(sorted(ref.items()),
                             columns=["node", "label"])
                .astype({"node": "int64", "label": "int64"}))
        for parts in (1, 4):
            got = (label_propagation(rd.from_pandas(df).repartition(parts))
                   .to_pandas().sort_values("node").reset_index(drop=True))
            pd.testing.assert_frame_equal(got, want)

    def test_clique_converges_to_min_label(self, ray_session):
        import ray.data as rd

        from pdf_extract_ray.stages.graph import label_propagation

        e = [(i, j) for i in range(8) for j in range(i + 1, 8)]
        got = (label_propagation(
                   rd.from_pandas(pd.DataFrame(e, columns=["src", "dst"])))
               .to_pandas())
        assert (got["label"] == 0).all()


def test_dedup_by_components_best_keeps_top_scorer(ray_session):
    import ray.data as rd

    from pdf_extract_ray.stages.graph import dedup_by_components_best

    # component A = {1, 2, 3} (3 has the top score), component B =
    # {10, 11} tied on score (min id 10 wins), 99 unpaired
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 10, 11, 99],
        "score": [5, 7, 9, 4, 4, 1],
    })
    pairs = pd.DataFrame({"id_a": [1, 2, 10], "id_b": [2, 3, 11]})
    for parts in (1, 3):
        kept = (dedup_by_components_best(
                    rd.from_pandas(docs).repartition(parts),
                    rd.from_pandas(pairs).repartition(parts), "score")
                .to_pandas().sort_values("doc_id"))
        assert kept["doc_id"].tolist() == [3, 10, 99]
    # no pairs at all -> everything passes through
    empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                          "id_b": pd.Series([], dtype="int64")})
    allkept = dedup_by_components_best(
        rd.from_pandas(docs), rd.from_pandas(empty), "score").to_pandas()
    assert sorted(allkept["doc_id"].tolist()) == [1, 2, 3, 10, 11, 99]
