"""Corpus-wide duplicated-line removal (stages/boilerplate.py)."""

import pandas as pd
import pytest
import ray.data as rd

from pdf_extract_ray.stages.boilerplate import (
    dedup_lines,
    dup_line_positions,
)

DOCS = pd.DataFrame({
    "doc_id": [0, 1, 2, 3],
    "text": [
        "ACCEPT COOKIES\nunique alpha content\nCopyright Site",
        "ACCEPT COOKIES\nunique beta content\nCopyright Site",
        "  ACCEPT COOKIES  \nunique gamma content",  # strip-matches
        "\n\nonly unique here\n",  # blank lines never count as dups
    ],
})


@pytest.mark.parametrize("key", ["text", "hash"])
def test_dup_positions(ray_session, key):
    got = (dup_line_positions(rd.from_pandas(DOCS).repartition(2), key=key)
           .to_pandas().sort_values(["doc_id", "pos"])
           .reset_index(drop=True))
    # cookie banner in docs 0,1,2 (stripped match); copyright in 0,1
    want = {(0, 1), (0, 3), (1, 1), (1, 3), (2, 1)}
    assert set(zip(got["doc_id"], got["pos"])) == want


@pytest.mark.parametrize("key", ["text", "hash"])
def test_dedup_lines_removal(ray_session, key):
    got = (dedup_lines(rd.from_pandas(DOCS).repartition(2), key=key)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["cleaned_text"].tolist() == [
        "unique alpha content",
        "unique beta content",
        "unique gamma content",
        "\n\nonly unique here\n",  # untouched, blanks kept
    ]
    assert got["n_lines"].tolist() == [3, 3, 2, 4]
    assert got["n_removed_lines"].tolist() == [2, 2, 1, 0]


def test_hash_equals_text_mode(ray_session):
    a = (dedup_lines(rd.from_pandas(DOCS), key="text")
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (dedup_lines(rd.from_pandas(DOCS), key="hash")
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_min_count_threshold(ray_session):
    # min_count=3: only the 3-doc cookie banner qualifies
    got = (dedup_lines(rd.from_pandas(DOCS), key="text", min_count=3)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["n_removed_lines"].tolist() == [1, 1, 1, 0]
    assert "Copyright Site" in got.loc[0, "cleaned_text"]


def test_bad_key(ray_session):
    with pytest.raises(Exception):
        dedup_lines(rd.from_pandas(DOCS), key="bogus").take_all()
