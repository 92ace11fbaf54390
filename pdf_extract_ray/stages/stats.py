"""Pair statistics columns (M20) — re-implementation of
euaa_사례/sentences/add_metadata.py:155-193.

word/char counts and ratios (rounded to 2, matching the reference), and
the ``potential_split`` flag: a matched pair whose Korean side is long but
English side short (1:N match suspect).  Fully vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pdf_extract_ray.util import round_half_away


def pair_stats_batch(
    batch: pd.DataFrame,
    kor_col: str = "kr_text_normalized",
    eng_col: str = "en_text_normalized",
    match_col: str = "match_type",
) -> pd.DataFrame:
    k = batch[kor_col].fillna("").astype(str)
    e = batch[eng_col].fillna("").astype(str)
    wk = k.str.split().str.len().fillna(0).astype("int64")
    we = e.str.split().str.len().fillna(0).astype("int64")
    ck = k.str.len().astype("int64")
    ce = e.str.len().astype("int64")

    batch["word_count_kr"] = wk
    batch["word_count_en"] = we
    batch["word_ratio"] = np.where(wk > 0, round_half_away(we / wk.replace(0, 1), 2), 0.0)
    batch["chr_len_kr"] = ck
    batch["chr_len_en"] = ce
    batch["chr_len_ratio"] = np.where(ck > 0, round_half_away(ce / ck.replace(0, 1), 2), 0.0)

    matched = (
        batch[match_col].fillna("unmatched") != "unmatched"
        if match_col in batch.columns
        else pd.Series(True, index=batch.index)
    )
    batch["potential_split"] = (
        matched & (wk > 4) & (we > 0)
        & (batch["word_ratio"] < 0.7) & (batch["chr_len_ratio"] < 1.2)
    )
    return batch
