"""Benchmark decontamination: flag training documents sharing n-token
spans with an evaluation set (the n-gram-collision check of Brown et al.
2020, "Language Models are Few-Shot Learners", appendix C — public
paper).  A corpus shipped to training must drop (or at least mark) docs
that contain eval-set text verbatim, else benchmark numbers are
meaningless.

Scale shape:

* The benchmark side is SMALL by definition (eval sets are 10^3-10^5
  grams) — its n-gram set builds on the driver from an in-memory list or
  a bounded Dataset materialization, then broadcasts ONCE via
  ``ray.put``; every map task reads the same object-store copy.
* The corpus side is one narrow ``map_batches``: shingle windows per
  batch (the vectorized kernel shared with exact-substring dedup,
  ``stages/substr.shingle_rows``), an ``isin`` membership probe, and a
  ``bincount`` rollup to per-doc counts.  Zero shuffles; texts never
  leave their block.
* ``key="hash"`` (scale mode) probes uint64 rolling hashes — the
  broadcast is 8 bytes/gram and membership is a sorted-array
  ``np.isin``.  ``key="text"`` probes literal shingle strings:
  collision-free and byte-parity with the DuckDB oracle (the
  driver-checked mode).

Per-doc output: ``n_grams`` (window count), ``n_hits`` (windows whose
gram is in the benchmark set), ``hit_frac = round(n_hits /
max(n_grams, 1), 4)``, ``contaminated = n_hits > 0``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset

from pdf_extract_ray.stages.substr import shingle_rows


def benchmark_gram_set(bench_texts, n: int, key: str = "hash"):
    """The benchmark's distinct n-gram keys.  ``key="hash"`` -> sorted
    uint64 array (compact broadcast); ``key="text"`` -> frozenset of
    literal shingle strings."""
    rows = shingle_rows(list(bench_texts), n, key)
    if key == "hash":
        return np.unique(rows["g"].to_numpy(dtype=np.uint64))
    return frozenset(rows["g"])


def contamination_stats(
    ds: Dataset,
    bench_texts,
    *,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    key: str = "hash",
) -> Dataset:
    """Per-document contamination counts vs the benchmark gram set.

    ``bench_texts``: in-memory list/Series of eval texts (small side).
    Returns ``(id_col, n_grams, n_hits, hit_frac, contaminated)``.
    """
    import ray

    gram_set = benchmark_gram_set(bench_texts, n, key)
    set_ref = ray.put(gram_set)

    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        grams = ray.get(set_ref)
        texts = batch[text_col].tolist()
        rows = shingle_rows(texts, n, key)
        if key == "hash":
            hit = np.isin(rows["g"].to_numpy(dtype=np.uint64), grams)
        else:
            hit = rows["g"].isin(grams).to_numpy()
        doc_idx = rows["__doc"].to_numpy()
        n_grams = np.bincount(doc_idx, minlength=len(texts))
        n_hits = np.bincount(doc_idx, weights=hit.astype(np.float64),
                             minlength=len(texts)).astype(np.int64)
        from pdf_extract_ray.util import round_half_away

        frac = round_half_away(
            n_hits / np.maximum(n_grams, 1).astype(np.float64), 4)
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(),
            "n_grams": n_grams.astype(np.int64),
            "n_hits": n_hits,
            "hit_frac": frac,
            "contaminated": n_hits > 0,
        })

    return ds.map_batches(probe, batch_format="pandas")


def contamination_oracle_sql(
    table: str = "documents",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    bench_pred: str = "doc_id % 20 = 0",
) -> str:
    """DuckDB SQL equal to :func:`contamination_stats` with
    ``key="text"`` and the benchmark drawn from the same table by
    ``bench_pred`` (how the driver query synthesizes an eval set with no
    external data)."""
    return f"""
WITH s AS (
  SELECT {id_col},
         regexp_extract_all(lower(coalesce({text_col}, '')), '[a-z0-9]+')
           AS arr
  FROM {table}
), p AS (
  SELECT {id_col}, unnest(range(1, len(arr) - {n} + 2)) AS pos, arr
  FROM s WHERE len(arr) >= {n}
), sh AS (
  SELECT {id_col}, pos,
         array_to_string(arr[pos : pos + {n} - 1], ' ') AS g
  FROM p
), bench AS (
  SELECT DISTINCT g FROM sh WHERE {bench_pred}
), hits AS (
  SELECT {id_col}, count(*) AS n_hits
  FROM sh JOIN bench USING (g) GROUP BY {id_col}
), tot AS (
  SELECT {id_col}, greatest(len(arr) - {n} + 1, 0) AS n_grams FROM s
)
SELECT t.{id_col}, t.n_grams,
       coalesce(h.n_hits, 0) AS n_hits,
       round(coalesce(h.n_hits, 0) * 1.0
             / greatest(t.n_grams, 1), 4) AS hit_frac,
       coalesce(h.n_hits, 0) > 0 AS contaminated
FROM tot t LEFT JOIN hits h USING ({id_col})
"""
