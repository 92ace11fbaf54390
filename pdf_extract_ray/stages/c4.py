"""C4-style heuristic cleaning — the line/page rules of Raffel et al.
2020 ("Exploring the Limits of Transfer Learning with a Unified
Text-to-Text Transformer", §2.2 — public paper), the other canonical
web-crawl cleaning recipe next to CCNet's line-dedup
(``stages/boilerplate.py``).

Frozen deterministic variant (ASCII rules so the DuckDB oracle mirrors
byte-for-byte — the round-4 text_density lesson: Python ``str.strip()``
and ``\\s`` are Unicode-aware, SQL's are not, so every trim/word rule
here is pinned to an explicit ASCII set):

Line rules (a line = a ``\\n``-separated segment; judged on its
``' \\t\\r'``-trimmed form, kept lines keep their ORIGINAL bytes):

* kept only if it ends in terminal punctuation — ``.``, ``!``, ``?``,
  optionally followed by one closing double-quote;
* kept only if it has >= ``min_words`` (default 5) ``[a-z0-9]+`` tokens
  on the lowercased line (the shared tokenizer family);
* dropped if it contains ``javascript`` (case-insensitive) — the C4
  boilerplate tell.

Page rules:

* dropped (``c4_kept = false``) if the RAW page contains
  ``lorem ipsum`` (case-insensitive) or a ``{`` (code tell);
* dropped unless the CLEANED text contains >= ``min_sentences``
  (default 3) sentence marks (``.``, ``!`` or ``?`` occurrences).

(The paper's "bad words" blocklist line is a policy list, not an
algorithm; it is intentionally not reproduced — plug a list into the
existing content filters (``stages/filters.py``) if one is required.)

Scale shape: ONE narrow map — lines explode/filter/re-join INSIDE the
batch with vectorized pandas string kernels (explode -> three boolean
masks -> groupby-doc ``str.cat``), no shuffle, texts move only from the
reader to the map.  Composes with the webtext tiering pipeline as a
pre-filter; the driver query is full-SQL-oracled (DuckDB
``list_filter`` over ``string_split`` mirrors the line sweep exactly).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from ray.data import Dataset

MIN_WORDS = 5
MIN_SENTENCES = 3

_TERMINAL_RE = re.compile(r'[.!?]"?$')
_WORD_RE = re.compile(r"[a-z0-9]+")
_SENT_RE = re.compile(r"[.!?]")
_ASCII_TRIM = " \t\r"


def c4_clean_batch(batch: pd.DataFrame, *, id_col: str = "doc_id",
                   text_col: str = "text", min_words: int = MIN_WORDS,
                   min_sentences: int = MIN_SENTENCES) -> pd.DataFrame:
    """``(id_col, c4_text, n_lines_total, n_lines_kept, n_sentences,
    c4_kept)`` for one batch — pure function, vectorized, shared by the
    distributed stage, the tests and (structurally) the SQL oracle."""
    texts = pd.Series(batch[text_col].to_numpy()).fillna("").astype(str)
    lines = texts.str.split("\n")
    n_total = lines.str.len().to_numpy(np.int64)
    ex = lines.explode()
    doc = ex.index.to_numpy()
    raw = ex.to_numpy(dtype=object)
    trimmed = ex.str.strip(_ASCII_TRIM)
    low = trimmed.str.lower()
    keep = (
        trimmed.str.contains(_TERMINAL_RE, regex=True)
        & (low.str.count(_WORD_RE) >= min_words)
        & ~low.str.contains("javascript", regex=False)
    ).to_numpy()
    kept = pd.Series(raw[keep], index=doc[keep])
    joined = kept.groupby(level=0).agg("\n".join)
    c4_text = np.full(len(texts), "", dtype=object)
    c4_text[joined.index.to_numpy()] = joined.to_numpy()
    n_kept = np.bincount(doc[keep], minlength=len(texts)).astype(np.int64)
    n_sent = pd.Series(c4_text).str.count(_SENT_RE).to_numpy(np.int64)
    low_raw = texts.str.lower()
    kept_page = (
        (n_sent >= min_sentences)
        & ~low_raw.str.contains("lorem ipsum", regex=False).to_numpy()
        & ~texts.str.contains("{", regex=False).to_numpy()
    )
    return pd.DataFrame({
        id_col: batch[id_col].to_numpy(),
        "c4_text": c4_text,
        "n_lines_total": n_total,
        "n_lines_kept": n_kept,
        "n_sentences": n_sent,
        "c4_kept": kept_page,
    })


def c4_clean(ds: Dataset, *, id_col: str = "doc_id",
             text_col: str = "text", min_words: int = MIN_WORDS,
             min_sentences: int = MIN_SENTENCES) -> Dataset:
    """One narrow map; no shuffle.  Filter downstream on ``c4_kept``
    (kept as a column so the rule is auditable and the row count is
    stable for the oracle)."""
    return ds.map_batches(
        lambda b: c4_clean_batch(b, id_col=id_col, text_col=text_col,
                                 min_words=min_words,
                                 min_sentences=min_sentences),
        batch_format="pandas")


def apply_c4_filter(batch: pd.DataFrame, text_col: str = "text", *,
                    min_words: int = MIN_WORDS,
                    min_sentences: int = MIN_SENTENCES) -> pd.DataFrame:
    """Pipeline form for fusing into a streaming plan (webtext_run's
    ``c4_rules`` flag): the ORIGINAL batch filtered to ``c4_kept`` pages
    with ``text_col`` replaced by the cleaned text — every other column
    rides through untouched, so it composes before any tier/signal
    stage."""
    b = batch.reset_index(drop=True)
    tmp = pd.DataFrame({"__id": np.arange(len(b)),
                        text_col: b[text_col].to_numpy()})
    res = c4_clean_batch(tmp, id_col="__id", text_col=text_col,
                         min_words=min_words, min_sentences=min_sentences)
    keep = res["c4_kept"].to_numpy()
    out = b.loc[keep].copy()
    out[text_col] = res["c4_text"].to_numpy()[keep]
    return out.reset_index(drop=True)


def c4_oracle_sql(table: str = "documents", *, id_col: str = "doc_id",
                  text_col: str = "text", min_words: int = MIN_WORDS,
                  min_sentences: int = MIN_SENTENCES) -> str:
    """DuckDB mirror: ``list_filter`` over ``string_split`` applies the
    identical ASCII line rules in order; page rules on the re-joined
    text."""
    # SQL string literals do NOT process backslash escapes — build the
    # ASCII trim set (space, tab, CR) with chr() so it matches Python's
    # strip(' \t\r') character-for-character
    trim_l = "trim(l, ' ' || chr(9) || chr(13))"
    line_ok = (
        f"regexp_matches({trim_l}, '[.!?]\"?$') "
        f"AND len(regexp_extract_all(lower({trim_l}), "
        f"'[a-z0-9]+')) >= {min_words} "
        f"AND NOT contains(lower({trim_l}), 'javascript')"
    )
    return f"""
WITH base AS (
  SELECT {id_col},
         coalesce({text_col}, '') AS t,
         string_split(coalesce({text_col}, ''), chr(10)) AS ls
  FROM {table}
), cleaned AS (
  SELECT {id_col}, t,
         len(ls) AS n_lines_total,
         list_filter(ls, l -> {line_ok}) AS kept_ls
  FROM base
), joined AS (
  SELECT {id_col}, t, n_lines_total,
         CAST(len(kept_ls) AS BIGINT) AS n_lines_kept,
         -- array_to_string returns NULL for the empty list; the engine
         -- emits '' for a doc with no kept lines
         coalesce(array_to_string(kept_ls, chr(10)), '') AS c4_text
  FROM cleaned
)
SELECT {id_col}, c4_text,
       CAST(n_lines_total AS BIGINT) AS n_lines_total,
       n_lines_kept,
       CAST(len(regexp_extract_all(c4_text, '[.!?]')) AS BIGINT)
         AS n_sentences,
       (len(regexp_extract_all(c4_text, '[.!?]')) >= {min_sentences}
        AND NOT contains(lower(t), 'lorem ipsum')
        AND NOT contains(t, '{{')) AS c4_kept
FROM joined
"""
