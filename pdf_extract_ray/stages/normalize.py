"""Normalization stage (M13): the reference's pre-analysis cleaning chain
as a vectorized ``map_batches`` body.

Chain re-implemented from euaa_사례/sentences/metadata_generator.py:510-543
(reused in add_metadata.py:59-106): leading-bullet strip -> ``*``-run to
space -> IGC/IBC code-tag drop -> quote normalization -> hyphen-run drop ->
``:;* `` edge strip -> (separately) NFKC.

Emits two derived columns per input column: ``{col}_cleaned`` (the chain,
SQL-mirrorable) and ``{col}_normalized`` (cleaned + NFKC; NFKC has no
DuckDB equivalent so oracle checks cover the cleaned column and pytest
covers NFKC).
"""

from __future__ import annotations

import pandas as pd

from pdf_extract_ray.functions.text import clean_pair_text, nfkc


def normalize_batch(batch: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    for col in cols:
        cleaned = batch[col].fillna("").astype(str).map(clean_pair_text)
        batch[f"{col}_cleaned"] = cleaned
        batch[f"{col}_normalized"] = cleaned.map(nfkc)
    return batch
