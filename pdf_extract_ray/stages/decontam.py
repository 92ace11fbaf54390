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


def benchmark_gram_table(bench_texts, n: int,
                         key: str = "hash") -> tuple[pd.DataFrame, np.ndarray]:
    """Distinct-gram rows for the benchmark side of fuzzy decontam:
    ``(gram table with columns g / __bid, per-bench distinct-gram
    counts)``.  One row per (bench doc, distinct gram)."""
    rows = shingle_rows(list(bench_texts), n, key)
    dd = rows.drop_duplicates(["__doc", "g"])
    tbl = pd.DataFrame({"g": dd["g"].to_numpy(),
                        "__bid": dd["__doc"].to_numpy(np.int64)})
    sizes = np.bincount(tbl["__bid"], minlength=len(list(bench_texts)))
    return tbl, sizes.astype(np.int64)


def fuzzy_contamination_stats(
    ds: Dataset,
    bench_texts,
    *,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    key: str = "hash",
    threshold: float = 0.5,
    bench_ids=None,
) -> Dataset:
    """Fuzzy benchmark decontamination: per-document MAX n-gram-set
    Jaccard similarity against any eval-set document (the near-duplicate
    analogue of :func:`contamination_stats` — catches lightly edited /
    reformatted eval text that exact 13-gram collision misses; the
    fuzzy-match step of Brown et al. 2020 appendix C and the
    dedup-based decontamination of Lee et al. 2022 — public papers).

    Scale shape: the benchmark side is SMALL by definition — its
    distinct (bench doc, gram) table broadcasts ONCE via ``ray.put``
    (``key="hash"`` = 16 bytes/row).  The corpus side is one narrow
    ``map_batches``: per-batch distinct doc grams, ONE hash join
    against the broadcast table (no loop over bench docs), a grouped
    intersection count, and a scatter-max.  Zero shuffles; texts never
    leave their block.  For eval sets too large to broadcast, compose
    the MinHash band machinery instead (``stages/dedup.py`` +
    ``stages/sigstore.py`` delta mode).

    ``key="text"`` probes literal shingle strings — collision-free and
    byte-parity with :func:`fuzzy_contamination_oracle_sql`.

    Returns ``(id_col, n_distinct_grams, max_jaccard,
    fuzzy_contaminated)`` where ``max_jaccard`` is rounded half-away to
    4 places and ``fuzzy_contaminated = max_jaccard >= threshold``.

    With ``bench_ids`` (the eval docs' real ids, index-aligned with
    ``bench_texts``) the output adds ``best_bench_id`` — WHICH eval
    document matched best (argmax of the rounded Jaccard, ties to the
    smallest bench id; ``-1`` when the doc shares no gram with any
    bench doc) — the evidence column a decontamination report needs.
    """
    import ray

    from pdf_extract_ray.util import round_half_away

    bench_tbl, bench_sizes = benchmark_gram_table(bench_texts, n, key)
    bid_map = (None if bench_ids is None
               else np.asarray(list(bench_ids), dtype=np.int64))
    if bid_map is not None and len(bid_map) != len(bench_sizes):
        raise ValueError("bench_ids must align with bench_texts")
    ref = ray.put((bench_tbl, bench_sizes, bid_map))

    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        btbl, bsizes, bids = ray.get(ref)
        texts = batch[text_col].tolist()
        rows = shingle_rows(texts, n, key).drop_duplicates(["__doc", "g"])
        na = np.bincount(rows["__doc"], minlength=len(texts)).astype(
            np.int64)
        mx = np.zeros(len(texts), dtype=np.float64)
        best = np.full(len(texts), -1, dtype=np.int64)
        m = rows.merge(btbl, on="g")
        if len(m):
            pairs = (m.groupby(["__doc", "__bid"], sort=False)
                     .size().reset_index(name="i"))
            inter = pairs["i"].to_numpy(np.int64)
            union = (na[pairs["__doc"].to_numpy()]
                     + bsizes[pairs["__bid"].to_numpy()] - inter)
            j = round_half_away(inter / np.maximum(union, 1), 4)
            np.maximum.at(mx, pairs["__doc"].to_numpy(), j)
            if bids is not None:
                ev = pairs.assign(__j=j, __real=bids[pairs["__bid"]])
                ev = ev.sort_values(["__doc", "__j", "__real"],
                                    ascending=[True, False, True],
                                    kind="mergesort")
                ev = ev.drop_duplicates("__doc")
                best[ev["__doc"].to_numpy()] = ev["__real"].to_numpy()
        out = pd.DataFrame({
            id_col: batch[id_col].to_numpy(),
            "n_distinct_grams": na,
            "max_jaccard": mx,
            "fuzzy_contaminated": mx >= threshold,
        })
        if bids is not None:
            out["best_bench_id"] = best
        return out

    return ds.map_batches(probe, batch_format="pandas")


def fuzzy_contamination_oracle_sql(
    table: str = "documents",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.5,
    bench_pred: str = "doc_id % 20 = 0",
    evidence: bool = False,
) -> str:
    """DuckDB SQL equal to :func:`fuzzy_contamination_stats` with
    ``key="text"`` and the benchmark drawn from the same table by
    ``bench_pred`` (the driver-query convention: synthesize the eval
    set from the corpus itself, no external data).  Rounding before the
    max is safe: round is monotone, so max(round(j)) = round(max(j)).
    ``evidence=True`` adds the ``best_bench_id`` argmax column."""
    ev_col = (",\n       coalesce(ev.best_bench_id, -1) AS best_bench_id"
              if evidence else "")
    ev_join = f"LEFT JOIN ev USING ({id_col})" if evidence else ""
    return f"""
WITH s AS (
  SELECT {id_col},
         regexp_extract_all(lower(coalesce({text_col}, '')), '[a-z0-9]+')
           AS arr
  FROM {table}
), p AS (
  SELECT {id_col}, unnest(range(1, len(arr) - {n} + 2)) AS pos, arr
  FROM s WHERE len(arr) >= {n}
), dg AS (
  SELECT {id_col},
         array_to_string(arr[pos : pos + {n} - 1], ' ') AS g
  FROM p GROUP BY {id_col}, g
), sz AS (
  SELECT {id_col}, count(*) AS na FROM dg GROUP BY {id_col}
), bench AS (
  SELECT {id_col} AS bid, g FROM dg WHERE {bench_pred}
), bsz AS (
  SELECT bid, count(*) AS nb FROM bench GROUP BY bid
), inter AS (
  SELECT d.{id_col}, b.bid, count(*) AS i
  FROM dg d JOIN bench b USING (g)
  GROUP BY d.{id_col}, b.bid
), mx AS (
  SELECT i.{id_col},
         max(round(i.i * 1.0 / (sz.na + bsz.nb - i.i), 4)) AS max_jaccard
  FROM inter i
  JOIN sz USING ({id_col})
  JOIN bsz USING (bid)
  GROUP BY i.{id_col}
), ev AS (
  SELECT {id_col}, bid AS best_bench_id FROM (
    SELECT i.{id_col}, i.bid,
           row_number() OVER (
             PARTITION BY i.{id_col}
             ORDER BY round(i.i * 1.0 / (sz.na + bsz.nb - i.i), 4) DESC,
                      i.bid) AS rn
    FROM inter i
    JOIN sz USING ({id_col})
    JOIN bsz USING (bid)
  ) WHERE rn = 1
)
SELECT t.{id_col},
       coalesce(sz.na, 0) AS n_distinct_grams,
       coalesce(mx.max_jaccard, 0.0) AS max_jaccard,
       coalesce(mx.max_jaccard, 0.0) >= {threshold} AS fuzzy_contaminated{ev_col}
FROM (SELECT {id_col} FROM {table}) t
LEFT JOIN sz USING ({id_col})
LEFT JOIN mx USING ({id_col})
{ev_join}
"""
