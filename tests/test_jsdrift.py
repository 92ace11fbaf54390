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


# --- collocations (adjacent-bigram PMI) -------------------------------------

def _colloc_ref(texts, min_count=1, top_k=50):
    """Plain-loop reference: adjacent bigram PMI over [a-z0-9]+."""
    uni, big = {}, {}
    for t in texts:
        ws = re.findall(r"[a-z0-9]+", (t or "").lower())
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    n_tot, b_tot = float(sum(uni.values())), float(sum(big.values()))
    rows = []
    for (a, b), n in big.items():
        if n < min_count:
            continue
        pmi = round(math.log(n * n_tot * n_tot
                             / (b_tot * uni[a] * uni[b])), 6)
        rows.append((a, b, n, pmi))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return pd.DataFrame(rows[:top_k], columns=["w1", "w2", "n", "pmi"])


def _colloc_run(texts, **kw):
    import ray.data as rd

    from pdf_extract_ray.stages.relevance import collocations

    ds = rd.from_pandas(pd.DataFrame({"text": texts})).repartition(3)
    return collocations(ds, num_buckets=2, **kw).to_pandas()


def test_collocations_match_plain_reference(ray_session):
    texts = ["new york city hosts new york games",
             "the city of new york", "games in the city",
             None, "york new york new"]
    got = _colloc_run(texts, min_count=1, top_k=50)
    exp = _colloc_ref(texts, min_count=1, top_k=50)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_collocations_mwe_ranks_first(ray_session):
    # a bigram that ALWAYS co-occurs outranks frequent-but-independent
    # pairs; bigrams never crossing doc boundaries
    texts = ["hong kong alpha beta", "beta hong kong alpha",
             "alpha beta hong kong", "beta alpha", "alpha beta"]
    got = _colloc_run(texts, min_count=1, top_k=5)
    assert (got.w1.iloc[0], got.w2.iloc[0]) == ("hong", "kong")
    # 'kong' ends doc 3; 'beta' starts doc 2: no cross-doc bigram
    assert not ((got.w1 == "kong") & (got.w2 == "beta")).any()


def test_collocations_min_count_and_topk(ray_session):
    texts = ["a b a b a b", "c d", "a b"]
    got = _colloc_run(texts, min_count=4, top_k=10)
    assert list(zip(got.w1, got.w2)) == [("a", "b")]
    assert got.n.iloc[0] == 4
    got1 = _colloc_run(texts, min_count=1, top_k=2)
    assert len(got1) == 2
