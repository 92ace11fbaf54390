"""Corpus-relative outlier trimming — drop documents whose word count
falls outside exact corpus percentiles (the corpus-relative analogue of
the fixed Gopher length gates: C4/Gopher drop absurdly short or long
pages, CCNet buckets by corpus-relative perplexity; here the thresholds
are DERIVED from the corpus itself, so the same rule adapts to any
snapshot).

Mechanism — two passes, both scale-safe:

1. **Bounded count pass**: per-batch ``np.unique`` partials of the word
   count (map-side shrink), merged by the bucketed grouped aggregate.
   The merged table has one row per DISTINCT word count — bounded by
   the longest document in the corpus (≤ ~10^6 rows at web scale, a
   driver-safe materialization independent of corpus row count).
2. **Exact percentile thresholds** from the count table: the k-th
   smallest value with ``k = ceil(N * pct / 100)`` (1-indexed, pure
   integer arithmetic — bit-parity with the SQL oracle's
   ``(N * pct + 99) // 100`` window scan), then ONE narrow
   ``map_batches`` filter keeping ``lo <= n_words <= hi``.  Zero
   shuffles on the wide pass; thresholds travel in the task closure.

Word count = Python ``len(s.split())`` (the engine-wide convention
mirrored by ``__ray_entry__._word_count_sql``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset


def _n_words(t: pd.Series) -> np.ndarray:
    return (t.fillna("").astype(str).str.split().str.len()
            .fillna(0).to_numpy(np.int64))


def percentile_thresholds(
    counts: dict[int, int], lower_pct: int, upper_pct: int,
) -> tuple[int, int]:
    """Exact (lo, hi) word-count bounds from a value->count table: the
    k-th smallest corpus value with ``k = max(ceil(N*pct/100), 1)``."""
    if not counts:
        raise ValueError("counts must be non-empty")
    if not (0 <= lower_pct <= upper_pct <= 100):
        raise ValueError(
            f"need 0 <= lower_pct <= upper_pct <= 100, got "
            f"({lower_pct}, {upper_pct})")
    vs = sorted(counts)
    cum = np.cumsum([counts[v] for v in vs])
    n = int(cum[-1])
    k_lo = max(-(-n * lower_pct // 100), 1)
    k_hi = max(-(-n * upper_pct // 100), 1)
    lo = vs[int(np.searchsorted(cum, k_lo))]
    hi = vs[int(np.searchsorted(cum, k_hi))]
    return int(lo), int(hi)


def length_outlier_trim(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lower_pct: int = 5,
    upper_pct: int = 95,
) -> Dataset:
    """Keep documents whose word count lies within the corpus's exact
    [lower_pct, upper_pct] percentile band (inclusive).  Returns
    ``(id_col, n_words)`` for the survivors."""
    from pdf_extract_ray.stages.agg import grouped_aggregate

    def counts_batch(b: pd.DataFrame) -> pd.DataFrame:
        v, c = np.unique(_n_words(b[text_col]), return_counts=True)
        return pd.DataFrame({"v": v.astype(np.int64),
                             "c": c.astype(np.int64)})

    cnt = grouped_aggregate(
        ds.select_columns([text_col]).map_batches(
            counts_batch, batch_format="pandas"),
        ["v"], {"c": ("c", "sum")})
    # bounded driver materialization: one row per distinct word count
    table = {int(r["v"]): int(r["c"]) for r in cnt.take_all()}
    lo, hi = percentile_thresholds(table, lower_pct, upper_pct)

    def filt(b: pd.DataFrame) -> pd.DataFrame:
        n = _n_words(b[text_col])
        keep = (n >= lo) & (n <= hi)
        return pd.DataFrame({
            id_col: b[id_col].to_numpy()[keep],
            "n_words": n[keep],
        })

    return ds.map_batches(filt, batch_format="pandas")


def score_percentile(
    ds: Dataset,
    *,
    score_col: str,
    id_col: str = "doc_id",
    out_col: str = "pct_rank",
) -> Dataset:
    """Corpus-relative percentile rank of a quantized score column —
    the calibration step that turns a raw classifier score into "this
    document is in the top X% of the corpus" (the FineWeb-Edu /
    DCLM-style selection knob) WITHOUT a global sort.

    Rule (exactly SQL ``percent_rank()``): ``rank_below / (N - 1)``
    where ``rank_below`` counts rows with a strictly smaller score;
    ``0.0`` when N == 1; rounded to 4 decimals (the engine float
    convention).

    Scale shape: one bounded distinct-count pass (map-side ``np.unique``
    partials -> grouped merge; the driver table has one row per DISTINCT
    score, bounded by the quantized score codomain), then ONE narrow
    ``searchsorted`` map.  Zero shuffles on the wide data.
    ``score_col`` must be quantized (ints / 4-decimal rounds).
    """
    from pdf_extract_ray.stages.agg import grouped_aggregate

    def counts_batch(b: pd.DataFrame) -> pd.DataFrame:
        v, c = np.unique(b[score_col].to_numpy(), return_counts=True)
        return pd.DataFrame({"v": v, "c": c.astype(np.int64)})

    cnt = grouped_aggregate(
        ds.select_columns([score_col]).map_batches(
            counts_batch, batch_format="pandas"),
        ["v"], {"c": ("c", "sum")})
    # bounded driver materialization: one row per distinct score
    rows = sorted((r["v"], int(r["c"])) for r in cnt.take_all())
    vs = np.array([v for v, _ in rows])
    below = np.concatenate(
        [[0], np.cumsum([c for _, c in rows])[:-1]]).astype(np.int64)
    n = int(below[-1] + rows[-1][1]) if rows else 0

    def rank(b: pd.DataFrame) -> pd.DataFrame:
        s = b[score_col].to_numpy()
        idx = np.searchsorted(vs, s, side="left")
        pct = (np.round(below[idx] / (n - 1), 4) if n > 1
               else np.zeros(len(b)))
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(),
            score_col: s,
            out_col: pct,
        })

    return ds.map_batches(rank, batch_format="pandas")


def score_percentile_oracle_sql(
    table_sql: str,
    *,
    score_col: str,
    id_col: str = "doc_id",
    out_col: str = "pct_rank",
) -> str:
    """DuckDB mirror of :func:`score_percentile`."""
    return (
        f"SELECT {id_col}, {score_col}, "
        f"round(percent_rank() OVER (ORDER BY {score_col}), 4) "
        f"AS {out_col} FROM ({table_sql})")


def length_outlier_oracle_sql(
    table: str = "documents",
    *,
    id_col: str = "doc_id",
    lower_pct: int = 5,
    upper_pct: int = 95,
    word_count_sql=None,
) -> str:
    """DuckDB mirror of :func:`length_outlier_trim` — same integer
    ceil-rank percentile rule via a cumulative window over the distinct
    word-count table.  ``word_count_sql`` renders Python
    ``len(s.split())`` for a SQL expression (the engine-wide
    convention, ``__ray_entry__._word_count_sql``)."""
    wc = (word_count_sql("coalesce(text, '')") if word_count_sql
          else "len(regexp_split_to_array(trim(coalesce(text, '')),"
               " '\\s+'))")
    return f"""
WITH w AS (
  SELECT {id_col}, {wc} AS n_words FROM {table}
), c AS (
  SELECT n_words AS v, count(*) AS c FROM w GROUP BY 1
), t AS (
  SELECT v, sum(c) OVER (ORDER BY v) AS cum, sum(c) OVER () AS n
  FROM c
), lo AS (
  SELECT min(v) AS lo FROM t
  WHERE cum >= greatest((n * {lower_pct} + 99) // 100, 1)
), hi AS (
  SELECT min(v) AS hi FROM t
  WHERE cum >= greatest((n * {upper_pct} + 99) // 100, 1)
)
SELECT {id_col}, n_words FROM w, lo, hi
WHERE n_words >= lo AND n_words <= hi
"""


def winsorize_values(
    ds: Dataset,
    *,
    value_col: str,
    id_col: str = "doc_id",
    lower_pct: int = 5,
    upper_pct: int = 95,
) -> Dataset:
    """Winsorize an integer-valued column at the corpus's EXACT
    [lower_pct, upper_pct] percentiles — the clipping twin of
    :func:`length_outlier_trim` (trimming drops the tails; winsorizing
    keeps the rows but caps the values, the standard pre-step before
    means/regressions that heavy web-scale tails would otherwise own).

    Same scale shape: one bounded distinct-count pass (the driver table
    has one row per DISTINCT value), the same integer ceil-rank
    thresholds (:func:`percentile_thresholds`), then ONE narrow clip
    map.  Output: ``(id_col, value_col, clipped, was_clipped)``."""
    from pdf_extract_ray.stages.agg import grouped_aggregate

    def counts_batch(b: pd.DataFrame) -> pd.DataFrame:
        v, c = np.unique(b[value_col].to_numpy(np.int64),
                         return_counts=True)
        return pd.DataFrame({"v": v.astype(np.int64),
                             "c": c.astype(np.int64)})

    cnt = grouped_aggregate(
        ds.select_columns([value_col]).map_batches(
            counts_batch, batch_format="pandas"),
        ["v"], {"c": ("c", "sum")})
    table = {int(r["v"]): int(r["c"]) for r in cnt.take_all()}
    lo, hi = percentile_thresholds(table, lower_pct, upper_pct)

    def clip(b: pd.DataFrame) -> pd.DataFrame:
        v = b[value_col].to_numpy(np.int64)
        cl = np.clip(v, lo, hi)
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(),
            value_col: v,
            "clipped": cl,
            "was_clipped": cl != v,
        })

    return ds.map_batches(clip, batch_format="pandas")


def winsorize_oracle_sql(
    table_sql: str,
    *,
    value_col: str,
    id_col: str = "doc_id",
    lower_pct: int = 5,
    upper_pct: int = 95,
) -> str:
    """DuckDB mirror of :func:`winsorize_values` — the same ceil-rank
    thresholds via a cumulative window, then least/greatest clipping."""
    return f"""
WITH __wz_s AS (SELECT * FROM ({table_sql})),
__wz_c AS (SELECT {value_col} AS v, count(*) AS c FROM __wz_s GROUP BY 1),
__wz_t AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum,
                  sum(c) OVER () AS n
           FROM __wz_c),
__wz_lo AS (SELECT min(v) AS lo FROM __wz_t
            WHERE cum >= greatest((n * {lower_pct} + 99) // 100, 1)),
__wz_hi AS (SELECT min(v) AS hi FROM __wz_t
            WHERE cum >= greatest((n * {upper_pct} + 99) // 100, 1))
SELECT {id_col}, {value_col},
       CAST(least(greatest({value_col}, lo), hi) AS BIGINT) AS clipped,
       least(greatest({value_col}, lo), hi) != {value_col}
         AS was_clipped
FROM __wz_s, __wz_lo, __wz_hi
"""
