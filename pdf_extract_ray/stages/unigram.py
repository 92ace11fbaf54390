"""SentencePiece-style unigram-LM tokenizer (Kudo 2018, "Subword
Regularization: Improving Neural Network Translation Models with
Multiple Subword Candidates" — public paper): the other major subword
family next to BPE (`stages/bpe.py`).  Trains a piece vocabulary by EM
over a segmentation lattice, then Viterbi-encodes documents.

Frozen deterministic subset (the repo's exactness discipline):

* words are the corpus rule ``[a-z0-9]+`` over lowercased text, counted
  once corpus-wide; training runs over the top ``max_words`` distinct
  words by (count desc, word asc) — the BPE trainer's cap contract
  (`stages/bpe.py`), which bounds every driver table by construction.
* seed vocabulary = ALL single characters seen in the counted words
  (kept forever — guarantees every word stays encodable, so there is no
  <unk>) + the top ``seed_size`` substrings of length 2..``max_piece_len``
  by total occurrence count (occurrences per word x word count).
* EM: expected piece counts come from the standard forward-backward
  over each word's segmentation lattice.  Per-(word, piece) expectations
  are QUANTIZED to int64 (``floor(e * word_count * 2^20)``) before any
  cross-word summation, so the merged count table is an exact integer
  sum — order- and parallelism-independent, the same trick as the
  floor-quantized k-means (`stages/kmeans.py`).  After each M-step the
  multi-char pieces are pruned to ``vocab_size - n_chars`` by
  (count desc, piece asc); single-char counts floor at 1.
* Viterbi: log-probs are ``math.log(count / total)`` derived from the
  integer table (identical doubles on every worker); ties break to the
  SMALLEST split start per position (strictly-greater updates, start
  index ascending) = the longest final piece.

Scale shape: the heavy pass is the ONE distributed wordcount
(`textquality.word_counts`: per-batch np.unique combine + one grouped
merge).  Seeding and every E-step are map_batches over the bounded
distinct-word table with the current probability table broadcast via
``ray.put``; they emit per-batch pre-summed integer ``(piece, q)``
partials into ONE grouped merge each, and the driver only ever holds
vocab-bounded tables.  Encoding is one narrow map with a per-worker
word -> n_pieces cache (repeated words dominate real corpora).

The committed golden (`tools/gen_goldens.py::gen_unigram`) runs the
same frozen kernels through an independent single-process pipeline
(plain-Counter wordcount, driver loops, no Ray) — the integer
quantization makes distributed == single-process EXACTLY.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd

_WORD_RE = re.compile(r"[a-z0-9]+")
_QUANT = 1 << 20  # 2^20 expectation quantization


# ---------------------------------------------------------------------------
# frozen per-word kernels (shared by the distributed plan, the golden
# generator and the tests)
# ---------------------------------------------------------------------------

def seed_substring_counts(word: str, wc: int, max_piece_len: int,
                          out: dict) -> None:
    """Accumulate ``substring -> occurrences * wc`` for all substrings of
    length 1..max_piece_len of ``word`` into ``out`` (ints)."""
    n = len(word)
    for i in range(n):
        for j in range(i + 1, min(n, i + max_piece_len) + 1):
            s = word[i:j]
            out[s] = out.get(s, 0) + wc


def expected_piece_counts(word: str, probs: dict, max_piece_len: int) -> dict:
    """Forward-backward expected piece counts for ONE word under the
    current unigram probabilities (plain floats; deterministic
    iteration order i asc, j asc — FROZEN, both sides share it)."""
    n = len(word)
    alpha = [0.0] * (n + 1)
    alpha[0] = 1.0
    for j in range(1, n + 1):
        s = 0.0
        for i in range(max(0, j - max_piece_len), j):
            a = alpha[i]
            if a > 0.0:
                p = probs.get(word[i:j])
                if p is not None:
                    s += a * p
        alpha[j] = s
    out: dict = {}
    z = alpha[n]
    if z <= 0.0:
        return out  # unsegmentable (cannot happen with char coverage)
    beta = [0.0] * (n + 1)
    beta[n] = 1.0
    for i in range(n - 1, -1, -1):
        s = 0.0
        for j in range(i + 1, min(n, i + max_piece_len) + 1):
            b = beta[j]
            if b > 0.0:
                p = probs.get(word[i:j])
                if p is not None:
                    s += p * b
        beta[i] = s
    for i in range(n):
        a = alpha[i]
        if a <= 0.0:
            continue
        for j in range(i + 1, min(n, i + max_piece_len) + 1):
            piece = word[i:j]
            p = probs.get(piece)
            if p is not None:
                e = a * p * beta[j] / z
                if e > 0.0:
                    out[piece] = out.get(piece, 0.0) + e
    return out


def viterbi_n_pieces(word: str, logp: dict, max_piece_len: int) -> int:
    """Number of pieces in the Viterbi (max log-prob) segmentation.
    Tie rule: strictly-greater updates with start index ascending —
    the longest final piece wins a tie.  Returns 0 when the word
    cannot be segmented (absent with single-char coverage)."""
    n = len(word)
    neg = float("-inf")
    best = [neg] * (n + 1)
    cnt = [0] * (n + 1)
    best[0] = 0.0
    for j in range(1, n + 1):
        bj, cj = neg, 0
        for i in range(max(0, j - max_piece_len), j):
            bi = best[i]
            if bi == neg:
                continue
            lp = logp.get(word[i:j])
            if lp is not None:
                sc = bi + lp
                if sc > bj:
                    bj, cj = sc, cnt[i] + 1
        best[j], cnt[j] = bj, cj
    return cnt[n] if best[n] != neg else 0


def _quantized_estep(counts: pd.DataFrame, probs: dict,
                     max_piece_len: int) -> dict:
    """E-step over a (word, n) count frame: per-(word, piece) expected
    counts quantized to int64, summed into a dict (frozen kernel,
    shared by the per-batch map and the single-process golden)."""
    acc: dict = {}
    for word, wc in zip(counts["word"], counts["n"]):
        e = expected_piece_counts(word, probs, max_piece_len)
        for piece, v in e.items():
            q = int(v * int(wc) * _QUANT)  # floor for non-negative v
            if q > 0:
                acc[piece] = acc.get(piece, 0) + q
    return acc


def _vocab_from_counts(counts: dict, chars: list, vocab_size: int) -> pd.DataFrame:
    """Prune to the final table: all single chars (count floored at 1)
    + top multi-char pieces by (count desc, piece asc)."""
    char_set = set(chars)
    multi = [(p, c) for p, c in counts.items()
             if len(p) > 1 and c > 0]
    multi.sort(key=lambda kv: (-kv[1], kv[0]))
    keep_multi = multi[: max(vocab_size - len(chars), 0)]
    rows = [(ch, max(int(counts.get(ch, 0)), 1)) for ch in sorted(char_set)]
    rows += keep_multi
    rows.sort(key=lambda kv: (-kv[1], kv[0]))
    return pd.DataFrame({"piece": [p for p, _ in rows],
                         "count_q": pd.Series([c for _, c in rows],
                                              dtype="int64")})


def probs_from_vocab(vocab: pd.DataFrame) -> dict:
    """piece -> probability (single int/int division per piece —
    identical doubles everywhere)."""
    total = int(vocab["count_q"].sum())
    return {p: int(c) / total
            for p, c in zip(vocab["piece"], vocab["count_q"])}


def logprobs_from_vocab(vocab: pd.DataFrame) -> dict:
    """piece -> ``math.log(count/total)`` (frozen on math.log, NOT
    np.log — SIMD log can differ in the last ulp)."""
    total = int(vocab["count_q"].sum())
    return {p: math.log(int(c) / total)
            for p, c in zip(vocab["piece"], vocab["count_q"])}


# ---------------------------------------------------------------------------
# distributed trainer + encoder
# ---------------------------------------------------------------------------

def train_unigram(ds, text_col: str = "text", *, vocab_size: int = 256,
                  seed_size: int = 1024, max_piece_len: int = 5,
                  n_iter: int = 2, max_words: int = 20_000) -> pd.DataFrame:
    """Train the unigram vocabulary over a document Dataset.  Returns
    the bounded vocab frame ``(piece, count_q, logprob)`` with
    ``logprob = round(ln(count_q / total), 6)``.

    Scale: ONE corpus wordcount shuffle; then per-iteration ONE
    ``(piece, q)`` grouped merge over the bounded distinct-word table
    (broadcast probabilities, integer partials — see module doc)."""
    import ray as _ray
    import ray.data as _rd

    from pdf_extract_ray.stages.agg import grouped_aggregate
    from pdf_extract_ray.stages.textquality import word_counts

    counts_df = word_counts(ds, text_col, top_k=max_words).to_pandas()
    if len(counts_df) == 0:
        return pd.DataFrame({"piece": pd.Series([], dtype=object),
                             "count_q": pd.Series([], dtype="int64"),
                             "logprob": pd.Series([], dtype="float64")})
    counts_df = counts_df.rename(columns={"gram": "word"}) \
        if "gram" in counts_df.columns else counts_df
    counts_ds = _rd.from_pandas(
        counts_df[["word", "n"]]).repartition(8).materialize()
    chars = sorted({ch for w in counts_df["word"] for ch in w})

    # ---- seed counts: one distributed substring pass -------------------
    def seed_partial(b: pd.DataFrame) -> pd.DataFrame:
        acc: dict = {}
        for word, wc in zip(b["word"], b["n"]):
            seed_substring_counts(word, int(wc), max_piece_len, acc)
        return pd.DataFrame({"piece": list(acc.keys()),
                             "q": pd.Series(list(acc.values()),
                                            dtype="int64")})

    merged = grouped_aggregate(
        counts_ds.map_batches(seed_partial, batch_format="pandas"),
        ["piece"], {"q": ("q", "sum")})
    seed = (merged.sort(["q", "piece"], descending=[True, False])
            .limit(seed_size + len(chars)).to_pandas())
    seed_counts = dict(zip(seed["piece"], seed["q"].astype("int64")))
    # chars must be present even if they fell off the seed top-k
    for ch in chars:
        seed_counts.setdefault(ch, 1)
    multi = {p: c for p, c in seed_counts.items() if len(p) > 1}
    top_multi = sorted(multi.items(), key=lambda kv: (-kv[1], kv[0]))
    kept = dict(top_multi[:seed_size])
    kept.update({ch: seed_counts[ch] for ch in chars})
    vocab = _vocab_from_counts(kept, chars, len(chars) + seed_size)

    # ---- EM iterations -------------------------------------------------
    for _ in range(n_iter):
        probs_ref = _ray.put(probs_from_vocab(vocab))

        def e_partial(b: pd.DataFrame, ref=probs_ref) -> pd.DataFrame:
            acc = _quantized_estep(b, _ray.get(ref), max_piece_len)
            return pd.DataFrame({"piece": list(acc.keys()),
                                 "q": pd.Series(list(acc.values()),
                                                dtype="int64")})

        em = grouped_aggregate(
            counts_ds.map_batches(e_partial, batch_format="pandas"),
            ["piece"], {"q": ("q", "sum")}).to_pandas()
        new_counts = dict(zip(em["piece"], em["q"].astype("int64")))
        vocab = _vocab_from_counts(new_counts, chars, vocab_size)

    total = int(vocab["count_q"].sum())
    vocab = vocab.copy()
    vocab["logprob"] = [round(math.log(int(c) / total), 6)
                        for c in vocab["count_q"]]
    return vocab


def unigram_token_stats(ds, vocab: pd.DataFrame, *,
                        id_col: str = "doc_id", text_col: str = "text",
                        max_piece_len: int = 5):
    """Viterbi piece counts per document under a trained vocabulary:
    ``(id_col, n_words, n_pieces)``.  One narrow map, zero shuffles;
    the vocab's log-prob table broadcasts once via ``ray.put`` and each
    worker memoizes word -> piece count (words repeat heavily)."""
    import ray as _ray

    payload = _ray.put(
        list(zip(vocab["piece"].tolist(),
                 vocab["count_q"].astype("int64").tolist())))

    def stats(b: pd.DataFrame) -> pd.DataFrame:
        cache = getattr(stats, "_c", None)
        if cache is None or cache[0] is not payload:
            pairs = _ray.get(payload)
            total = sum(c for _, c in pairs)
            logp = {p: math.log(c / total) for p, c in pairs}
            cache = stats._c = (payload, logp, {})
        _, logp, memo = cache
        n_words = np.zeros(len(b), dtype=np.int64)
        n_pieces = np.zeros(len(b), dtype=np.int64)
        for r, t in enumerate(b[text_col].fillna("")):
            tot = wn = 0
            for w in _WORD_RE.findall(t.lower()):
                wn += 1
                k = memo.get(w)
                if k is None:
                    k = memo[w] = viterbi_n_pieces(w, logp, max_piece_len)
                tot += k
            n_words[r] = wn
            n_pieces[r] = tot
        return pd.DataFrame({id_col: b[id_col].to_numpy(),
                             "n_words": n_words, "n_pieces": n_pieces})

    return ds.map_batches(stats, batch_format="pandas")
