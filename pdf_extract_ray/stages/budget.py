"""Greedy data selection under a token budget — keep the highest-scored
documents, in a deterministic order, until the corpus-wide token budget
is exhausted (the selection step of DCLM / FineWeb-Edu style pipelines:
"take the top documents by classifier score up to N training tokens" —
Li et al. 2024, Penedo et al. 2024; public papers).

Semantics (exactly the SQL window rule)::

    kept = { doc : running_total(doc) <= budget }
    running_total = sum of weight over docs ordered by
                    (score DESC, id ASC) up to and including this doc

Weights are non-negative, so the kept set is the maximal prefix of that
ordering whose weight sum fits the budget — a GLOBAL prefix rule, which
naively needs a full sort plus a running sum.  Neither happens here:

1. **Per-score totals** (one bounded pass): map-side ``np.unique``
   partials of (score -> total weight), merged by the bucketed grouped
   aggregate.  The driver table has one row per DISTINCT score — the
   engine-wide convention quantizes scores (4-decimal rounds /
   integers), so this is bounded by the score codomain, not corpus
   rows.  A descending scan finds the boundary score ``s*``: every doc
   scoring above ``s*`` is kept outright.
2. **Per-id-bucket totals within the boundary score group** (one
   bounded pass over that group only): buckets are ``id >> bits`` —
   id-RANGE prefixes, so bucket order equals id order and the scan
   finds the boundary bucket.
3. **The boundary bucket materializes to the driver** (bounded by the
   bucket width, ``2**bits`` ids), where the exact within-bucket prefix
   yields a single global cutoff id.

The final filter is then one narrow map: ``score > s* OR (score == s*
AND id <= id_cut)`` — zero shuffles on the wide data, three bounded
driver tables, deterministic and parallelism-independent.

Integer weights (token counts) keep every comparison exact — bit-parity
with the DuckDB window oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset


def take_token_budget(
    ds: Dataset,
    budget: int,
    *,
    score_col: str,
    weight_col: str,
    id_col: str = "doc_id",
    id_bucket_bits: int = 10,
) -> Dataset:
    """Keep rows in (score DESC, id ASC) order while the running weight
    total stays within ``budget``.  Returns the kept rows with their
    input columns.  ``weight_col`` must be a non-negative integer column
    (token/word counts); ``score_col`` must be quantized (ints or the
    engine's 4-decimal rounds) so the per-score table stays bounded."""
    from pdf_extract_ray.stages.agg import grouped_aggregate

    per_score = grouped_aggregate(
        ds.select_columns([score_col, weight_col]),
        [score_col], {"tw": (weight_col, "sum")})
    # bounded driver materialization: one row per distinct score
    table = sorted(
        ((r[score_col], int(r["tw"])) for r in per_score.take_all()),
        key=lambda t: -t[0])
    if not table:
        return ds.map_batches(lambda b: b.iloc[:0], batch_format="pandas")

    cum = 0
    s_star = None
    for s, tw in table:
        if cum + tw > budget:
            s_star = s
            break
        cum += tw
    if s_star is None:  # whole corpus fits
        return ds
    remaining = budget - cum

    def _grp(b: pd.DataFrame) -> pd.DataFrame:
        return b[b[score_col] == s_star]

    grp = ds.map_batches(_grp, batch_format="pandas")

    def bucket_partial(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "__b": b[id_col].to_numpy(np.int64) >> id_bucket_bits,
            "tw": b[weight_col].to_numpy(np.int64)})
        return out

    per_bucket = grouped_aggregate(
        grp.map_batches(bucket_partial, batch_format="pandas"),
        ["__b"], {"tw": ("tw", "sum")})
    # bounded: one row per id-range bucket of ONE score group
    buckets = sorted(
        ((int(r["__b"]), int(r["tw"])) for r in per_bucket.take_all()))
    b_star = None
    for bk, tw in buckets:
        if remaining - tw < 0:
            b_star = bk
            break
        remaining -= tw
    # the scan always breaks: the boundary group's total exceeds
    # `remaining` by construction of s_star, and weights are >= 0
    assert b_star is not None, "boundary group unexpectedly fits budget"
    # bounded: one id-range bucket (<= 2**bits ids) of one group
    tail = grp.map_batches(
        lambda b: b.loc[
            (b[id_col].to_numpy(np.int64) >> id_bucket_bits)
            == b_star, [id_col, weight_col]],
        batch_format="pandas").take_all()
    tail.sort(key=lambda r: r[id_col])
    # ids below the boundary bucket belong to fully-fitting buckets
    # (already subtracted from `remaining`): the cutoff starts at the
    # last id strictly below bucket b_star and only advances from there.
    id_cut = (b_star << id_bucket_bits) - 1
    for r in tail:
        if remaining - int(r[weight_col]) < 0:
            break
        remaining -= int(r[weight_col])
        id_cut = int(r[id_col])

    def filt(b: pd.DataFrame) -> pd.DataFrame:
        sc = b[score_col]
        keep = (sc > s_star) | (
            (sc == s_star)
            & (b[id_col].to_numpy(np.int64) <= id_cut))
        return b[np.asarray(keep)]

    return ds.map_batches(filt, batch_format="pandas")


def take_token_budget_oracle_sql(
    table_sql: str,
    budget: int,
    *,
    score_col: str,
    weight_col: str,
    id_col: str = "doc_id",
) -> str:
    """DuckDB window-rule mirror of :func:`take_token_budget`."""
    return (
        f"SELECT * EXCLUDE (__cum) FROM ("
        f"SELECT *, sum({weight_col}) OVER ("
        f"ORDER BY {score_col} DESC, {id_col} "
        f"ROWS UNBOUNDED PRECEDING) AS __cum FROM ({table_sql})) "
        f"WHERE __cum <= {budget}")


def crawl_budget(
    ds,
    key_cols,
    *,
    budget: int,
    num_buckets: int | None = None,
):
    """Proportional crawl-budget apportionment by the LARGEST-REMAINDER
    method (Hamilton apportionment — the classic integer-fair-share
    rule): split a global request budget across hosts proportionally to
    their row counts, in whole integers that sum EXACTLY to the budget
    — the politeness scheduler's per-host quota table.

    Frozen rules (pure int64 arithmetic, mirrored by
    :func:`crawl_budget_oracle_sql`): per key ``base = budget·n // N``
    and ``rem = budget·n % N``; the ``budget − Σ base`` leftover units
    go to the keys with the largest remainders (ties: key order
    ascending).  ``budget·n`` must fit int64 — budgets ≤ 2^31 against
    corpora ≤ 2^31 rows are safe; shard the budget first beyond that.

    Output: ``(keys..., n, quota)`` with ``Σ quota == budget`` exactly.

    Scale shape: ONE grouped integer count with map-side partials; the
    apportionment runs on the bounded per-key table (hosts — the
    operator's intended granularity)."""
    import numpy as np
    import pandas as pd

    from pdf_extract_ray.stages.agg import grouped_aggregate

    if budget < 0:
        raise ValueError("budget must be >= 0")
    key_cols = list(key_cols)
    cnt = grouped_aggregate(
        ds.select_columns(key_cols), key_cols,
        {"n": (key_cols[0], "count")}, num_buckets=num_buckets,
    ).to_pandas().sort_values(key_cols).reset_index(drop=True)

    n = cnt["n"].to_numpy(np.int64)
    total = np.int64(n.sum())
    b = np.int64(budget)
    base = b * n // total
    rem = b * n % total
    leftover = int(b - base.sum())
    # largest remainder first, ties by key order (cnt is key-sorted, so
    # a stable argsort on -rem realizes the tie rule)
    order = np.argsort(-rem, kind="mergesort")
    quota = base.copy()
    quota[order[:leftover]] += 1
    out = cnt.copy()
    out["quota"] = quota
    return out


def crawl_budget_oracle_sql(table_sql: str, key_cols, *, budget: int) -> str:
    """DuckDB mirror of :func:`crawl_budget` (same integer expressions;
    the rank window realizes the largest-remainder tie rule)."""
    ks = ", ".join(key_cols)
    b = int(budget)
    return f"""
WITH __cb_c AS (
  SELECT {ks}, CAST(count(*) AS BIGINT) AS n
  FROM ({table_sql}) GROUP BY {ks}
),
__cb_t AS (SELECT sum(n) AS total FROM __cb_c),
__cb_q AS (
  SELECT {ks}, n, ({b} * n) // total AS base, ({b} * n) % total AS rem
  FROM __cb_c, __cb_t
),
__cb_l AS (SELECT {b} - sum(base) AS leftover FROM __cb_q),
__cb_r AS (
  SELECT *, row_number() OVER (ORDER BY rem DESC, {ks}) AS rk
  FROM __cb_q
)
SELECT {ks}, n,
       CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
         AS quota
FROM __cb_r, __cb_l
"""
