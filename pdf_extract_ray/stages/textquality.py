"""Text-analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

These extend the reference's row-level quality analyzers
(reference: euaa_사례/sentences/metadata_generator.py:92-461,
add_metadata.py:155-193) to the single-document web-text setting.  Every
rule here is deliberately expressible in ANSI SQL so the driver's DuckDB
oracle can check it exactly (SURVEY.md §5.2.6); character classes are
explicit ASCII/Hangul ranges, never locale-dependent ``\\w``.

All functions are vectorized map_batches bodies over pyarrow/pandas —
no Python loop over rows in the hot path.
"""

from __future__ import annotations

import re


import numpy as np
import pandas as pd
import pyarrow as pa


from pdf_extract_ray.util import round_half_away

# frozen stopword list (quality scoring; mirror in oracle SQL literally)
STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "that", "for", "on")

# ASCII-word-or-single-symbol tokenizer ("BPE-ish"): matches DuckDB
# regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_ ]')
_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+|[^A-Za-z0-9_ ]")
_HANGUL_RE = re.compile(r"[가-힣ㄱ-ㆎ]")
_LATIN_RE = re.compile(r"[A-Za-z]")
_CJK_RE = re.compile(r"[一-鿿]")
_CYRILLIC_RE = re.compile(r"[Ѐ-ӿ]")
_PUNCT_RE = re.compile(r"[.,!?;:]")
_DIGIT_RE = re.compile(r"[0-9]")


def _count(series: pd.Series, rx: re.Pattern) -> pd.Series:
    return series.str.count(rx)


def lang_id_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Heuristic script-based language ID over character classes.

    Rule (frozen; SQL-mirrored): among {hangul, cjk, cyrillic, latin}
    character counts, the largest non-zero class wins with priority order
    hangul > cjk > cyrillic > latin on ties; all zero -> 'und'.
    Labels: ko / zh / ru / en / und.
    """
    t = batch[text_col].fillna("")
    hangul = _count(t, _HANGUL_RE)
    cjk = _count(t, _CJK_RE)
    cyr = _count(t, _CYRILLIC_RE)
    latin = _count(t, _LATIN_RE)
    best = pd.concat(
        {"ko": hangul, "zh": cjk, "ru": cyr, "en": latin}, axis=1
    )
    lang = best.idxmax(axis=1)  # ties resolve in column order = priority
    lang[best.max(axis=1) == 0] = "und"
    batch["lang_id"] = lang
    return batch


def token_stats_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Whitespace word count + ASCII-regex token count + char length."""
    t = batch[text_col].fillna("")
    batch["n_words"] = t.str.split().str.len().fillna(0).astype("int64")
    batch["n_tokens"] = t.str.count(_TOKEN_RE).astype("int64")
    batch["n_chars_out"] = t.str.len().astype("int64")
    return batch


def quality_score_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Length/punctuation/stopword quality profile (all ratios rounded to 4
    decimals so float math matches the SQL oracle bit-for-bit).

    quality components (reference analogues: word/char stats
    add_metadata.py:155-193, content filters metadata_generator.py:430-461):
      * punct_ratio  = sentence-punct chars / chars
      * digit_ratio  = digit chars / chars
      * stop_ratio   = stopword occurrences / whitespace words
      * mean_word_len = chars-in-words / words
    """
    t = batch[text_col].fillna("")
    n_chars = t.str.len().astype("float64")
    n_words = t.str.split().str.len().fillna(0).astype("float64")
    safe_chars = n_chars.where(n_chars > 0, 1.0)
    safe_words = n_words.where(n_words > 0, 1.0)

    stop_rx = re.compile(r"\b(?:" + "|".join(STOPWORDS) + r")\b")
    punct = _count(t, _PUNCT_RE).astype("float64")
    digits = _count(t, _DIGIT_RE).astype("float64")
    stops = t.str.lower().str.count(stop_rx).astype("float64")
    word_chars = t.str.replace(r"\s+", "", regex=True).str.len().astype("float64")

    batch["punct_ratio"] = round_half_away(punct / safe_chars, 4)
    batch["digit_ratio"] = round_half_away(digits / safe_chars, 4)
    batch["stop_ratio"] = round_half_away(stops / safe_words, 4)
    batch["mean_word_len"] = round_half_away(word_chars / safe_words, 4)
    return batch


def fingerprint_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Normalized-content fingerprint: md5(lower(whitespace-collapsed text)).

    SQL mirror: md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))).
    Used as the exact-dedup key (D1) and for cross-run content lineage.
    """
    import hashlib

    t = (
        batch[text_col]
        .fillna("")
        .str.replace(r"\s+", " ", regex=True)
        .str.strip()
        .str.lower()
    )
    batch["fingerprint"] = [hashlib.md5(x.encode("utf-8")).hexdigest() for x in t]
    return batch


_WORD_ONLY_RE = re.compile(r"[a-z0-9]+")


def repetition_stats_batch(batch: pd.DataFrame,
                           text_col: str = "text") -> pd.DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021,
    "Scaling Language Models", §A1.1 quality filters — public paper):
    ``dup_word_frac`` (1 - distinct/total words), ``top_word_frac`` /
    ``top_bigram_frac`` (share of the most frequent word / adjacent
    bigram) and ``max_word_run`` (longest consecutive same-word run).
    Heavily repeated boilerplate scores high and gets filtered before
    training.

    Batch-local, no corpus state, no shuffle.  Vectorized via one explode
    + grouped counts (no Python loop over rows); every rule mirrors in
    DuckDB SQL (unnest + window functions) for the driver oracle."""
    low = (batch[text_col].fillna("").str.lower()
           .reset_index(drop=True))
    words = low.str.findall(_WORD_ONLY_RE)
    n = words.str.len().to_numpy(dtype=np.int64)
    ex = words.explode().dropna()
    pos = pd.RangeIndex(len(low))

    if len(ex):
        df = pd.DataFrame({"i": ex.index.to_numpy(), "w": ex.to_numpy()})
        counts = df.groupby(["i", "w"], sort=False).size()
        per_doc = counts.groupby(level=0)
        distinct = per_doc.size().reindex(pos, fill_value=0).to_numpy()
        top = per_doc.max().reindex(pos, fill_value=0).to_numpy()
        # adjacent bigrams: shift within doc
        w2 = df.groupby("i", sort=False)["w"].shift(-1)
        bi = df.assign(w2=w2).dropna(subset=["w2"])
        if len(bi):
            btop = (bi.groupby(["i", "w", "w2"], sort=False).size()
                    .groupby(level=0).max()
                    .reindex(pos, fill_value=0).to_numpy())
        else:
            btop = np.zeros(len(low), dtype=np.int64)
        # longest consecutive run: new run where word or doc changes
        new_run = (df["w"].ne(df["w"].shift())
                   | df["i"].ne(df["i"].shift())).cumsum()
        runs = df.groupby(new_run, sort=False).agg(
            i=("i", "first"), L=("w", "size"))
        max_run = (runs.groupby("i")["L"].max()
                   .reindex(pos, fill_value=0).to_numpy())
    else:
        distinct = top = btop = max_run = np.zeros(len(low), dtype=np.int64)

    nf = n.astype(np.float64)
    safe = np.maximum(nf, 1.0)
    safe_bi = np.maximum(nf - 1.0, 1.0)
    out = batch.reset_index(drop=True).copy()
    out["n_words"] = n
    out["dup_word_frac"] = np.where(
        n > 0, round_half_away(1.0 - distinct / safe, 4), 0.0)
    out["top_word_frac"] = np.where(
        n > 0, round_half_away(top / safe, 4), 0.0)
    out["top_bigram_frac"] = np.where(
        n > 1, round_half_away(btop / safe_bi, 4), 0.0)
    out["max_word_run"] = max_run.astype(np.int64)
    return out


REPETITION_ORACLE_SQL = """
WITH s AS (
  SELECT doc_id,
         regexp_extract_all(lower(coalesce(text,'')), '[a-z0-9]+') AS arr
  FROM documents
), w AS (
  SELECT doc_id, unnest(arr) AS word,
         unnest(range(1, len(arr) + 1)) AS pos
  FROM s
), wc AS (
  SELECT doc_id, word, count(*) AS c FROM w GROUP BY doc_id, word
), agg AS (
  SELECT doc_id, count(*) AS n_distinct, max(c) AS top_c
  FROM wc GROUP BY doc_id
), b AS (
  SELECT doc_id, word,
         lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
  FROM w
), bagg AS (
  SELECT doc_id, max(c) AS top_b FROM (
    SELECT doc_id, word, nxt, count(*) AS c FROM b
    WHERE nxt IS NOT NULL GROUP BY doc_id, word, nxt)
  GROUP BY doc_id
), r AS (
  SELECT doc_id,
         pos - row_number() OVER (PARTITION BY doc_id, word ORDER BY pos)
           AS grp, word
  FROM w
), ragg AS (
  SELECT doc_id, max(runlen) AS max_run FROM (
    SELECT doc_id, count(*) AS runlen FROM r GROUP BY doc_id, word, grp)
  GROUP BY doc_id
)
SELECT s.doc_id, len(s.arr) AS n_words,
  CASE WHEN len(s.arr) > 0
       THEN round(1.0 - agg.n_distinct / len(s.arr)::DOUBLE, 4)
       ELSE 0.0 END AS dup_word_frac,
  CASE WHEN len(s.arr) > 0
       THEN round(agg.top_c / len(s.arr)::DOUBLE, 4)
       ELSE 0.0 END AS top_word_frac,
  CASE WHEN len(s.arr) > 1
       THEN round(bagg.top_b / (len(s.arr) - 1)::DOUBLE, 4)
       ELSE 0.0 END AS top_bigram_frac,
  coalesce(ragg.max_run, 0) AS max_word_run
FROM s
LEFT JOIN agg USING (doc_id)
LEFT JOIN bagg USING (doc_id)
LEFT JOIN ragg USING (doc_id)
"""


# winnowing fingerprints live in functions/fingerprint.py (scalar, not
# SQL-mirrorable); re-exported here for discoverability next to the md5
# content fingerprint
from pdf_extract_ray.functions.fingerprint import (  # noqa: E402,F401
    winnow_fingerprints,
    winnow_overlap,
)
