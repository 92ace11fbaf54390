"""Vocabulary-level JS drift (relevance.unigram_js_drift): independent
plain-Python reference, the 0·ln0 = 0 one-sided convention, symmetry,
non-negativity, and min_count trimming (the ``js_drift_words`` driver
query adds the full SQL-oracle check)."""

import math
import re

import numpy as np
import pandas as pd
import pytest

from pdf_extract_ray.stages.relevance import unigram_js_drift


def _ref(df, min_count=5):
    """Plain-loop JS terms over the frozen [a-z0-9]+ tokenization."""
    counts = {}
    totals = {0: 0, 1: 0}
    for s, t in zip(df.snap, df.text):
        for w in re.findall(r"[a-z0-9]+", (t or "").lower()):
            counts.setdefault(w, [0, 0])[int(s)] += 1
            totals[int(s)] += 1
    rows = []
    for w, (na, nb) in sorted(counts.items()):
        if na + nb < min_count:
            continue
        p, q = na / totals[0], nb / totals[1]
        m = (p + q) / 2
        ta = p * math.log(p / m) if na else 0.0
        tb = q * math.log(q / m) if nb else 0.0
        rows.append((w, na, nb, round(0.5 * ta + 0.5 * tb, 6)))
    return pd.DataFrame(rows, columns=["word", "n_a", "n_b", "js_term"])


def _run(df, **kw):
    import ray.data as rd

    got = unigram_js_drift(rd.from_pandas(df).repartition(3), "snap",
                           num_buckets=2, **kw)
    return got.to_pandas().sort_values("word").reset_index(drop=True)


@pytest.fixture()
def corpus():
    return pd.DataFrame({
        "snap": [0, 0, 0, 1, 1, 1],
        "text": ["alpha beta beta gamma", "alpha alpha delta",
                 "beta gamma gamma", "alpha beta epsilon",
                 "epsilon epsilon epsilon gamma", None],
    })


def test_matches_plain_reference(ray_session, corpus):
    got = _run(corpus, min_count=1)
    exp = _ref(corpus, min_count=1)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_one_sided_word_finite(ray_session, corpus):
    got = _run(corpus, min_count=1).set_index("word")
    # 'delta' appears only in slice A: finite, strictly positive term
    assert got.loc["delta", "n_b"] == 0
    assert 0 < got.loc["delta", "js_term"] <= round(0.5 * math.log(2), 6) + 1e-9


def test_nonnegative_and_identical_slices_zero(ray_session):
    same = pd.DataFrame({
        "snap": [0, 1], "text": ["x y z x", "x y z x"]})
    got = _run(same, min_count=1)
    assert (got.js_term == 0.0).all()  # identical distributions
    assert (got.n_a == got.n_b).all()


def test_symmetry(ray_session, corpus):
    flipped = corpus.assign(snap=1 - corpus.snap)
    a = _run(corpus, min_count=1)
    b = _run(flipped, min_count=1)
    assert list(a.js_term) == list(b.js_term)  # JS is symmetric
    assert list(a.n_a) == list(b.n_b)


def test_min_count_trims(ray_session, corpus):
    got = _run(corpus, min_count=4)
    assert set(got.word) == {"alpha", "beta", "epsilon", "gamma"}
