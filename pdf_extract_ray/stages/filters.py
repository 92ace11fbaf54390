"""Content filters (M19) — re-implementation of
euaa_사례/sentences/metadata_generator.py:430-461 (applied at :554-561):

drop a pair row when BOTH sides are numbers-only (digits/space/comma/dot),
or EITHER side is a single symbol or a single alphabet letter.
Vectorized regex masks, usable as ``ds.map_batches`` body or standalone.
"""

from __future__ import annotations

import re

import pandas as pd

_NUMBERS_ONLY_STRIP_RE = re.compile(r"[\d\s,.]")
_SINGLE_ALNUM_RE = re.compile(r"^[a-zA-Z0-9ㄱ-ㅎㅏ-ㅣ가-힣]$")
_SINGLE_ALPHA_RE = re.compile(r"^[a-zA-Z]$")


def is_numbers_only(text) -> bool:
    if not isinstance(text, str) or not text.strip():
        return False
    return not _NUMBERS_ONLY_STRIP_RE.sub("", text)


def is_symbol_or_single_alpha(text) -> bool:
    if not isinstance(text, str):
        return False
    # deletes the SUBSTRING "nan" anywhere ("nano" -> "o"): reference-
    # faithful wart (metadata_generator.py:444 does exactly this to scrub
    # stringified NaN); kept for parity and mirrored in the SQL oracle
    t = text.strip().replace("nan", "")
    if len(t) != 1:
        return False
    ch = t[0]
    return (not _SINGLE_ALNUM_RE.match(ch)) or bool(_SINGLE_ALPHA_RE.match(ch))


def content_filter_mask(batch: pd.DataFrame, kor_col: str, eng_col: str) -> pd.Series:
    """True = KEEP the row."""
    k = batch[kor_col]
    e = batch[eng_col]
    both_numbers = k.map(is_numbers_only) & e.map(is_numbers_only)
    single = k.map(is_symbol_or_single_alpha) | e.map(is_symbol_or_single_alpha)
    return ~(both_numbers | single)


def apply_content_filters(batch: pd.DataFrame, kor_col: str, eng_col: str) -> pd.DataFrame:
    return batch[content_filter_mask(batch, kor_col, eng_col)]
