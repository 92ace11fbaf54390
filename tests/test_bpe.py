"""BPE training + encoding (stages/bpe.py): hand-computed merges on a
tiny corpus, tie-break rule, encode round-trip property, and the
distributed train path (the `bpe_merges` / `bpe_token_stats` driver
queries add golden determinism freezes)."""

import pandas as pd
import pytest

from pdf_extract_ray.stages.bpe import (bpe_encode_word,
                                        learn_bpe_from_counts)


def test_hand_computed_merges():
    # classic Sennrich example shape: 'low'x5, 'lower'x2, 'newest'x6
    counts = [("low", 5), ("lower", 2), ("newest", 6)]
    merges = learn_bpe_from_counts(counts, n_merges=4)
    # pair frequencies round 1: ('l','o')=7, ('o','w')=7, ('e','s')=6,
    # ('s','t')=6, ('t','</w>')=6, ('n','e')=6, ('e','w')=6, ('w','</w>')=5,
    # ('w','e')=8 -> ('w','e') wins outright
    assert merges[0] == ("w", "e")
    # round 2: ('o','w') dropped to 5 ('lower' is now l o we r), so
    # ('l','o')=7 wins outright
    assert merges[1] == ("l", "o")
    # round 3: three pairs tie at 6 ('e','we'), ('n','e'), ('we','s') ->
    # lexicographically smallest pair wins
    assert merges[2] == ("e", "we")


def test_stops_when_no_repeated_pair():
    merges = learn_bpe_from_counts([("ab", 1), ("cd", 1)], n_merges=50)
    assert merges == []  # every pair occurs once -> frequency < 2 stops


def test_encode_round_trip_property():
    counts = [("banana", 4), ("bandana", 2), ("nab", 3)]
    merges = learn_bpe_from_counts(counts, n_merges=10)
    ranks = {m: i for i, m in enumerate(merges)}
    for w in ("banana", "bandana", "nab", "unseenword", "a"):
        toks = bpe_encode_word(w, ranks)
        assert "".join(toks) == w + "</w>"  # lossless
        assert all(toks)  # no empty symbols


def test_distributed_train_equals_plain_counts(ray_session):
    import ray.data as rd

    from pdf_extract_ray.stages.bpe import bpe_token_stats, train_bpe

    docs = pd.DataFrame({
        "doc_id": range(6),
        "text": ["low low low lower", "newest newest", "Low NEWEST",
                 None, "", "lower newest low"],
    })
    merges = train_bpe(rd.from_pandas(docs).repartition(3), n_merges=8)
    # independent single-process path: plain Counter wordcount -> trainer
    from collections import Counter
    import re
    c = Counter()
    for t in docs["text"]:
        c.update(re.findall(r"[a-z0-9]+", (t or "").lower()))
    ref = learn_bpe_from_counts(
        sorted(c.items(), key=lambda kv: (-kv[1], kv[0])), n_merges=8)
    assert list(zip(merges["left"], merges["right"])) == ref

    stats = (bpe_token_stats(rd.from_pandas(docs).repartition(2), merges)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    ranks = {m: i for i, m in enumerate(ref)}
    from pdf_extract_ray.stages.bpe import _WORD_RE
    expect = [sum(len(bpe_encode_word(w, ranks))
                  for w in _WORD_RE.findall((t or "").lower()))
              for t in docs["text"]]
    assert list(stats["n_bpe_tokens"]) == expect
