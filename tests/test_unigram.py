"""Unigram-LM tokenizer (stages/unigram): frozen kernel semantics,
EM/Viterbi behavior, and distributed == single-process bit parity."""

import math

import numpy as np
import pandas as pd

from pdf_extract_ray.stages.unigram import (
    expected_piece_counts,
    logprobs_from_vocab,
    probs_from_vocab,
    seed_substring_counts,
    train_unigram,
    unigram_token_stats,
    viterbi_n_pieces,
)


def test_expected_counts_cover_word_length():
    # sum over pieces of (expected count x piece length) == word length
    # for ANY proper probability assignment — the lattice marginals
    # must tile the word exactly once in expectation
    probs = {"a": 0.3, "b": 0.2, "ab": 0.4, "ba": 0.1}
    for word in ("abab", "aaba", "b", "abba"):
        e = expected_piece_counts(word, probs, 2)
        covered = sum(v * len(p) for p, v in e.items())
        assert abs(covered - len(word)) < 1e-9
    # unsegmentable word (char missing from vocab) -> empty
    assert expected_piece_counts("xyz", probs, 2) == {}


def test_viterbi_prefers_likely_multichar_piece():
    # p(ab) >> p(a)p(b): "abab" should be 2 pieces, not 4
    lp = {"a": math.log(0.05), "b": math.log(0.05), "ab": math.log(0.9)}
    assert viterbi_n_pieces("abab", lp, 2) == 2
    # without the multi-char piece it falls back to singles
    lp2 = {"a": math.log(0.5), "b": math.log(0.5)}
    assert viterbi_n_pieces("abab", lp2, 2) == 4
    # unsegmentable -> 0
    assert viterbi_n_pieces("zz", lp, 2) == 0


def test_seed_substring_counts_positions():
    out = {}
    seed_substring_counts("aaa", 2, 2, out)
    # substrings: a x3 positions, aa x2 positions, each weighted by wc=2
    assert out == {"a": 6, "aa": 4}


def test_train_unigram_topology_independent_and_matches_reference(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    base = ["the quick brown fox jumps over the lazy dog",
            "pack my box with five dozen liquor jugs",
            "the five boxing wizards jump quickly"]
    docs = pd.DataFrame({
        "doc_id": np.arange(90, dtype="int64"),
        "text": [base[i % 3] + f" tail{rng.integers(0, 5)}"
                 for i in range(90)],
    })
    kw = dict(vocab_size=64, seed_size=128, max_piece_len=4, n_iter=2,
              max_words=1000)
    vocabs = [train_unigram(rd.from_pandas(docs).repartition(p), **kw)
              for p in (1, 5)]
    pd.testing.assert_frame_equal(vocabs[0], vocabs[1])

    # independent single-process reference: plain-Counter wordcount +
    # driver loops over the same frozen kernels (the golden pipeline)
    import re
    from collections import Counter

    from pdf_extract_ray.stages.unigram import (
        _quantized_estep,
        _vocab_from_counts,
    )

    word_re = re.compile(r"[a-z0-9]+")
    c = Counter()
    for t in docs["text"]:
        c.update(word_re.findall(t.lower()))
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    counts_df = pd.DataFrame({"word": [w for w, _ in top],
                              "n": [n for _, n in top]})
    chars = sorted({ch for w in counts_df["word"] for ch in w})
    seed_all = {}
    for w, n in zip(counts_df["word"], counts_df["n"]):
        seed_substring_counts(w, int(n), 4, seed_all)
    cut = sorted(seed_all.items(),
                 key=lambda kv: (-kv[1], kv[0]))[:128 + len(chars)]
    seed_counts = dict(cut)
    for ch in chars:
        seed_counts.setdefault(ch, 1)
    multi = {p: q for p, q in seed_counts.items() if len(p) > 1}
    kept = dict(sorted(multi.items(), key=lambda kv: (-kv[1], kv[0]))[:128])
    kept.update({ch: seed_counts[ch] for ch in chars})
    vocab = _vocab_from_counts(kept, chars, len(chars) + 128)
    for _ in range(2):
        probs = probs_from_vocab(vocab)
        vocab = _vocab_from_counts(
            _quantized_estep(counts_df, probs, 4), chars, 64)
    total = int(vocab["count_q"].sum())
    vocab["logprob"] = [round(math.log(int(q) / total), 6)
                        for q in vocab["count_q"]]
    pd.testing.assert_frame_equal(vocabs[0], vocab)

    # every single char kept -> full coverage, and common substrings won
    pieces = set(vocabs[0]["piece"])
    assert set(chars) <= pieces
    assert any(len(p) > 1 for p in pieces)


def test_unigram_token_stats_coverage_and_bounds(ray_session):
    import ray.data as rd

    docs = pd.DataFrame({
        "doc_id": np.arange(40, dtype="int64"),
        "text": (["the cat sat on the mat"] * 20
                 + ["unseenword qqq zz9"] * 19 + [None]),
    })
    vocab = train_unigram(rd.from_pandas(docs), vocab_size=48,
                          seed_size=64, max_piece_len=3, n_iter=1,
                          max_words=100)
    got = (unigram_token_stats(rd.from_pandas(docs).repartition(4), vocab,
                               max_piece_len=3)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # char coverage: every word of the training corpus encodes (>0
    # pieces) and a word can never need more pieces than characters
    n_chars = docs["text"].fillna("").str.replace(r"[^a-z0-9]", "",
                                                  regex=True).str.len()
    assert (got["n_pieces"] <= n_chars.to_numpy()).all()
    assert (got.loc[got["n_words"] > 0, "n_pieces"]
            >= got.loc[got["n_words"] > 0, "n_words"]).all()
    assert got.loc[39, "n_words"] == 0 and got.loc[39, "n_pieces"] == 0
    # deterministic across block layouts
    again = (unigram_token_stats(rd.from_pandas(docs).repartition(2), vocab,
                                 max_piece_len=3)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, again)
    # logprobs are finite and negative
    lp = logprobs_from_vocab(vocab)
    assert all(v < 0 and np.isfinite(v) for v in lp.values())
