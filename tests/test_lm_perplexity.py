"""CCNet-style LM perplexity bucketing (stages/lm.py)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from pdf_extract_ray.stages.lm import (
    perplexity_buckets,
    train_bigram_lm,
)

TRAIN = pd.DataFrame({
    "doc_id": range(4),
    "text": [
        "the cat sat on the mat and the dog sat on the rug",
        "the cat ran to the dog and the dog ran to the cat",
        "a cat and a dog sat on a mat in the sun",
        "the sun was warm and the cat sat in the sun",
    ],
})


def _model(ray_session, **kw):
    return train_bigram_lm(rd.from_pandas(TRAIN), **kw)


def test_model_shape_and_caps(ray_session):
    m = _model(ray_session)
    assert m["V"] == len(m["uni"]) + 1
    assert m["uni"]["the"] == TRAIN["text"].str.count(r"\bthe\b").sum()
    capped = _model(ray_session, max_vocab=3, max_bigrams=5)
    assert len(capped["uni"]) == 3 and len(capped["bi"]) == 5
    assert capped["V"] == 4
    # cap tie-break: count desc then lexicographic — "the" dominates
    assert capped["uni"].index[0] == "the"


def test_in_domain_beats_gibberish(ray_session):
    m = _model(ray_session)
    docs = pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["the cat sat on the mat",
                 "zyx qwv plk mnb vcd xsw qaz"],
    })
    got = (perplexity_buckets(rd.from_pandas(docs), m)
           .to_pandas().sort_values("doc_id"))
    assert got["perplexity"].iloc[0] < got["perplexity"].iloc[1]


def test_short_docs_bucket(ray_session):
    m = _model(ray_session)
    docs = pd.DataFrame({"doc_id": [0, 1, 2],
                         "text": ["word", "", None]})
    got = (perplexity_buckets(rd.from_pandas(docs), m)
           .to_pandas().sort_values("doc_id"))
    assert (got["bucket"] == "short").all()
    assert got["perplexity"].isna().all()
    assert (got["n_bigrams"] == 0).all()


def test_partitioning_invariant(ray_session):
    m = _model(ray_session)
    docs = pd.DataFrame({
        "doc_id": range(40),
        "text": [f"the cat sat on mat number {i} in the sun"
                 for i in range(40)],
    })
    one = (perplexity_buckets(rd.from_pandas(docs), m)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    many = (perplexity_buckets(rd.from_pandas(docs).repartition(8), m)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(one, many)
