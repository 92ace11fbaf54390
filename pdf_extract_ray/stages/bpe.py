"""BPE tokenizer training + encoding over the corpus — the
training-data step that turns a crawl into a vocabulary (Sennrich et
al. 2016, public paper: learn merges from WORD FREQUENCIES, not raw
text, so the distributed part is exactly one corpus wordcount).

Frozen semantics:
* words are ``[a-z0-9]+`` runs over lowercased text (the repetition /
  wordcount rule); each word starts as its characters plus a terminal
  ``</w>`` symbol;
* training considers the TOP ``max_words`` words by (count desc, word
  asc) — a bounded table (the lm.py capped-model precedent: the cap is
  part of the frozen semantics, so distributed == single-process
  exactly);
* each round merges the adjacent symbol pair with the highest total
  frequency, ties broken by the lexicographically smallest (left,
  right) pair; training stops after ``n_merges`` rounds or when no pair
  occurs twice;
* encoding applies merges greedily in rank order (lowest rank first,
  leftmost occurrence first).

Scale shape: the wordcount is map-side pre-combined + one (word, n)
merge (``textquality.word_counts``); the merge loop runs driver-side
over the capped vocab (bounded, deterministic); encoding broadcasts the
merge ranks once and runs as a narrow map with a per-worker LRU of
encoded words.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from ray.data import Dataset

_WORD_RE = re.compile(r"[a-z0-9]+")
_END = "</w>"


def learn_bpe_from_counts(
    word_counts: list[tuple[str, int]],
    n_merges: int = 200,
) -> list[tuple[str, str]]:
    """Frozen BPE trainer over a (word, count) table -> ordered merges."""
    vocab = [(tuple(w) + (_END,), int(n)) for w, n in word_counts]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, n in vocab:
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], _neg_lex(kv[0])))
        if best[1] < 2:
            break
        (a, b), _ = best
        merges.append((a, b))
        ab = a + b
        new_vocab = []
        for syms, n in vocab:
            if a in syms:
                out = []
                i = 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(ab)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = tuple(out)
            new_vocab.append((syms, n))
        vocab = new_vocab
    return merges


class _NegStr(str):
    """Inverts comparison so max() picks the lexicographically SMALLEST
    pair on frequency ties."""

    def __lt__(self, other):  # pragma: no cover - trivial
        return str.__gt__(self, other)

    def __gt__(self, other):  # pragma: no cover - trivial
        return str.__lt__(self, other)


def _neg_lex(pair: tuple[str, str]) -> tuple[_NegStr, _NegStr]:
    return (_NegStr(pair[0]), _NegStr(pair[1]))


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy rank-order merge application to one word (frozen rule:
    lowest rank first, leftmost first)."""
    syms = list(word) + [_END]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def train_bpe(
    ds: Dataset,
    text_col: str = "text",
    *,
    n_merges: int = 200,
    max_words: int = 20_000,
) -> pd.DataFrame:
    """Corpus -> ordered merge table ``(rank, left, right)``.

    The wordcount is fully distributed; the capped (word, n) table is
    bounded driver state (the cap is frozen semantics, not a shortcut).
    """
    from pdf_extract_ray.stages.textquality import word_counts

    top = word_counts(ds, text_col, top_k=max_words).to_pandas()
    merges = learn_bpe_from_counts(
        list(zip(top["word"], top["n"])), n_merges=n_merges)
    return pd.DataFrame({
        "rank": np.arange(len(merges), dtype=np.int64),
        "left": [a for a, _ in merges],
        "right": [b for _, b in merges],
    })


def bpe_token_stats(
    ds: Dataset,
    merges: pd.DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """Per-document BPE token counts under a trained merge table:
    broadcast the ranks once (``ray.put``), narrow map with a
    per-worker cache of encoded words (Zipf makes the hit rate high)."""
    import ray

    ranks = {(l, r): i for i, (l, r) in
             enumerate(zip(merges["left"], merges["right"]))}
    handle = ray.put(ranks)

    def stats(b: pd.DataFrame, h=handle) -> pd.DataFrame:
        rk = ray.get(h)
        cache: dict[str, int] = {}
        counts = []
        for t in b[text_col].fillna(""):
            n = 0
            for w in _WORD_RE.findall(t.lower()):
                c = cache.get(w)
                if c is None:
                    c = len(bpe_encode_word(w, rk))
                    cache[w] = c
                n += c
            counts.append(n)
        return pd.DataFrame({
            "doc_id": b[id_col].to_numpy(),
            "n_bpe_tokens": pd.Series(counts, dtype="int64"),
        })

    return ds.map_batches(stats, batch_format="pandas")
