"""Exact-substring dedup (stages/substr.py): window indexing, hash/text
key parity, duplicate detection semantics, span merge + removal."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from pdf_extract_ray.stages.substr import (
    dedup_substrings,
    dup_shingle_positions,
    merge_spans,
    remove_spans,
    shingle_rows,
)

SPAN = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
DOCS = [
    {"doc_id": 1, "text": f"intro words {SPAN} closing one"},
    {"doc_id": 2, "text": f"other opening {SPAN} different tail here"},
    {"doc_id": 3, "text": "completely unrelated text with enough words "
                          "to form several windows of its own"},
    {"doc_id": 4, "text": "short"},
    {"doc_id": 5, "text": None},
]


def test_shingle_rows_positions_and_counts():
    rows = shingle_rows(["a b c d", "x y", ""], k=3, key="text")
    assert rows["pos"].tolist() == [1, 2]  # only doc 0 has >= 3 tokens
    assert rows["__doc"].tolist() == [0, 0]
    assert rows["g"].tolist() == ["a b c", "b c d"]


def test_hash_and_text_keys_agree_on_positions():
    texts = [d["text"] for d in DOCS]
    a = shingle_rows(texts, k=8, key="text")
    b = shingle_rows(texts, k=8, key="hash")
    assert a[["__doc", "pos"]].values.tolist() == \
        b[["__doc", "pos"]].values.tolist()
    # equal text shingles <-> equal hashes (no collisions at this size)
    ga = pd.factorize(a["g"])[0].tolist()
    gb = pd.factorize(b["g"])[0].tolist()
    assert ga == gb
    with pytest.raises(ValueError):
        shingle_rows(texts, k=8, key="nope")


@pytest.mark.parametrize("key", ["text", "hash"])
def test_cross_doc_duplicate_span_found(ray_session, key):
    ds = rd.from_items(DOCS)
    got = dup_shingle_positions(ds, k=8, key=key).to_pandas()
    got = got.sort_values(["doc_id", "pos"]).reset_index(drop=True)
    # the shared 8-token span starts at token 3 in both docs (1-based)
    assert got[["doc_id", "pos"]].values.tolist() == [[1, 3], [2, 3]]


def test_same_doc_internal_repeat_counts(ray_session):
    ds = rd.from_items([
        {"doc_id": 9, "text": f"{SPAN} bridge {SPAN}"},
    ])
    got = dup_shingle_positions(ds, k=8, key="text").to_pandas()
    assert sorted(got["pos"].tolist()) == [1, 10]


def test_merge_spans_and_remove():
    # overlapping windows 1..3 with k=4 -> one interval [1, 7)
    assert merge_spans([1, 2, 3], 4) == [(1, 7)]
    assert merge_spans([1, 10], 4) == [(1, 5), (10, 14)]
    toks = [str(i) for i in range(1, 13)]
    kept = remove_spans(toks, [(2, 5), (9, 11)])
    assert kept == ["1", "5", "6", "7", "8", "11", "12"]


@pytest.mark.parametrize("key", ["text", "hash"])
def test_dedup_substrings_end_to_end(ray_session, key):
    ds = rd.from_items(DOCS)
    out = {r["doc_id"]: r for r in
           dedup_substrings(ds, k=8, key=key).take_all()}
    assert len(out) == 5
    assert out[1]["cleaned_text"] == "intro words closing one"
    assert out[1]["n_removed_tokens"] == 8
    assert out[2]["cleaned_text"] == "other opening different tail here"
    # untouched docs keep all tokens (joined in token space)
    assert out[3]["n_removed_tokens"] == 0
    assert out[4] == {"doc_id": 4, "cleaned_text": "short",
                      "n_tokens": 1, "n_removed_tokens": 0}
    assert out[5]["cleaned_text"] == "" and out[5]["n_tokens"] == 0


def test_dedup_substrings_deterministic_across_parallelism(ray_session):
    rows = [{"doc_id": i,
             "text": (f"{SPAN} filler{i} " * 2 + "tail words here")}
            for i in range(60)]
    a = dedup_substrings(rd.from_items(rows, override_num_blocks=1),
                         k=8).to_pandas()
    b = dedup_substrings(rd.from_items(rows, override_num_blocks=11),
                         k=8).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_min_count_threshold(ray_session):
    ds = rd.from_items(DOCS)
    # raising min_count to 3 silences the pair-duplicate
    got = dup_shingle_positions(ds, k=8, key="text",
                                min_count=3).to_pandas()
    assert len(got) == 0
