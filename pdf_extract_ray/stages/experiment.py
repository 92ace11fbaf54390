"""Time-decay scoring and grouped A/B testing (Welch's t) — the
freshness-weighting and experiment-readout aggregates of a crawl/event
pipeline.

Both operators follow the repo's exact-parity discipline: every shuffled
partial is an INTEGER (bit-shift dyadic decay weights; floored integer
values for the t-test moments), so map-side partial sums are
order-independent and merge exactly, and the only floating-point math is
a final frozen expression evaluated once per output row — mirrored
verbatim in the SQL oracle builders.

Scale shape (both): narrow derive map -> :func:`grouped_aggregate`
(map-side partials shrink the shuffle to O(groups x blocks) rows) ->
arithmetic finish on the bounded per-group table.  Raw rows never move;
bodies never shuffle.

Reference analogue: pdf_extract's report stage computes corpus-level
score rollups per batch (see reference main.py's summary pass); these
are the time-aware and experiment-aware generalizations.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from ray.data import Dataset

from pdf_extract_ray.stages.agg import grouped_aggregate

_US_PER_DAY = 86_400_000_000  # exact int64 microseconds


def _ts_us(s: pd.Series) -> np.ndarray:
    """Timestamp column -> int64 microseconds (explicit unit: pandas may
    hold ns or us depending on the parquet reader)."""
    return s.to_numpy(dtype="datetime64[us]").astype(np.int64)


def decayed_group_scores(
    ds: Dataset,
    keys: Sequence[str],
    ts_col: str,
    *,
    half_life_days: int = 1,
    cap_shifts: int = 20,
    num_buckets: int | None = None,
) -> Dataset:
    """Per-key exponentially-decayed event count (freshness score).

    Each row contributes ``weight_ppm = 1_000_000 >> shifts`` where
    ``shifts = min(age // half_life, cap_shifts)`` and ``age`` is whole
    half-lives between the row's timestamp and the corpus max timestamp.
    The weight is a pure INTEGER (dyadic 2^-k truncated to ppm), so the
    decayed sum is exact and order/parallelism-independent — no float
    summation anywhere.  ``cap_shifts=20`` already truncates to 0
    (1e6 >> 20 == 0), so the cap loses nothing and bounds the shift.

    Two passes: a scalar max-timestamp reduce (narrow ts column only),
    then derive + grouped integer sum.  Output per key: ``n_events``,
    ``decayed_ppm`` (int64), ``decayed_score`` (the single division
    ``decayed_ppm / 1e6``).
    """
    keys = list(keys)
    hl_us = int(half_life_days) * _US_PER_DAY

    def to_us(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"__us": _ts_us(b[ts_col])})

    ref_us = int(ds.map_batches(to_us, batch_format="pandas").max("__us"))

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        age = ref_us - _ts_us(b[ts_col])
        shifts = np.minimum(age // hl_us, cap_shifts).astype(np.int64)
        out = b[keys].copy()
        out["__w"] = np.int64(1_000_000) >> shifts
        return out

    agg = grouped_aggregate(
        ds.map_batches(derive, batch_format="pandas"),
        keys,
        {"n_events": ("__w", "count"), "decayed_ppm": ("__w", "sum")},
        num_buckets=num_buckets,
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b["decayed_score"] = b["decayed_ppm"].to_numpy(np.float64) / 1e6
        return b

    return agg.map_batches(finish, batch_format="pandas")


def decayed_group_scores_oracle_sql(
    table_sql: str,
    keys: Sequence[str],
    ts_col: str,
    *,
    half_life_days: int = 1,
    cap_shifts: int = 20,
) -> str:
    """DuckDB mirror of :func:`decayed_group_scores` (integer-exact)."""
    part = ", ".join(keys)
    hl_us = int(half_life_days) * _US_PER_DAY
    return f"""
WITH __dk_t AS ({table_sql}),
__dk_ref AS (SELECT max(epoch_us({ts_col})) AS r FROM __dk_t),
__dk_w AS (SELECT {part},
                  1000000 >> LEAST((r - epoch_us({ts_col})) // {hl_us},
                                   {cap_shifts}) AS w
           FROM __dk_t, __dk_ref)
SELECT {part}, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(w) AS BIGINT) AS decayed_ppm,
       CAST(sum(w) AS BIGINT) / 1e6 AS decayed_score
FROM __dk_w GROUP BY {part}
"""


def welch_ab_test(
    ds: Dataset,
    keys: Sequence[str],
    arm_col: str,
    value_col: str,
    *,
    num_buckets: int | None = None,
) -> "pd.DataFrame":
    """Per-key Welch two-sample t statistic between arms 0 and 1.

    ``value_col`` must hold INTEGER-VALUED numbers (floor upstream):
    the shuffled moments (n, sum v, sum v^2) are then exact int64
    partial sums, and the mean/variance/t/df math is one frozen float
    expression per key, evaluated identically here and in
    :func:`welch_ab_test_oracle_sql` (same operation order)::

        mean  = s / n
        var   = (ss - s * s / n) / (n - 1)     (sample variance)
        se2   = var_a / n_a + var_b / n_b
        t     = (mean_a - mean_b) / sqrt(se2)
        df    = se2^2 / ((var_a/n_a)^2/(n_a-1) + (var_b/n_b)^2/(n_b-1))

    Keys where either arm has < 2 rows (or zero se) get NULL t/df.
    Returns a pandas frame: the per-(key, arm) moment table is bounded
    by O(#groups x 2) BY CONSTRUCTION, so the pivot+finish runs on the
    driver — raw event rows never leave their blocks.
    """
    keys = list(keys)

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        v = b[value_col].to_numpy(np.float64).astype(np.int64)
        out = b[keys].copy()
        out["__arm"] = b[arm_col].to_numpy(np.int64)
        out["__v"] = v
        out["__v2"] = v * v
        return out

    mom = grouped_aggregate(
        ds.map_batches(derive, batch_format="pandas"),
        keys + ["__arm"],
        {"n": ("__v", "count"), "s": ("__v", "sum"),
         "ss": ("__v2", "sum")},
        num_buckets=num_buckets,
    ).to_pandas()

    wide = mom.pivot_table(index=keys, columns="__arm",
                           values=["n", "s", "ss"], aggfunc="first",
                           fill_value=0)
    out = pd.DataFrame(index=wide.index).reset_index()
    na = wide.get(("n", 0), pd.Series(0, index=wide.index)).to_numpy(np.float64)
    nb = wide.get(("n", 1), pd.Series(0, index=wide.index)).to_numpy(np.float64)
    sa = wide.get(("s", 0), pd.Series(0, index=wide.index)).to_numpy(np.float64)
    sb = wide.get(("s", 1), pd.Series(0, index=wide.index)).to_numpy(np.float64)
    ssa = wide.get(("ss", 0), pd.Series(0, index=wide.index)).to_numpy(np.float64)
    ssb = wide.get(("ss", 1), pd.Series(0, index=wide.index)).to_numpy(np.float64)

    with np.errstate(divide="ignore", invalid="ignore"):
        mean_a = sa / na
        mean_b = sb / nb
        var_a = (ssa - sa * sa / na) / (na - 1.0)
        var_b = (ssb - sb * sb / nb) / (nb - 1.0)
        se2 = var_a / na + var_b / nb
        t = (mean_a - mean_b) / np.sqrt(se2)
        df = (se2 * se2) / ((var_a / na) ** 2 / (na - 1.0)
                            + (var_b / nb) ** 2 / (nb - 1.0))
    ok = (na > 1) & (nb > 1) & (se2 > 0)
    out["n_a"] = na.astype(np.int64)
    out["n_b"] = nb.astype(np.int64)
    out["mean_a"] = np.where(na > 0, mean_a, np.nan)
    out["mean_b"] = np.where(nb > 0, mean_b, np.nan)
    out["t_stat"] = np.where(ok, t, np.nan)
    out["welch_df"] = np.where(ok, df, np.nan)
    return out


def welch_ab_test_oracle_sql(
    table_sql: str,
    keys: Sequence[str],
    arm_expr: str,
    value_expr: str,
) -> str:
    """DuckDB mirror of :func:`welch_ab_test`; ``value_expr`` must be an
    integer SQL expression (same floor rule as the engine derive)."""
    part = ", ".join(keys)
    return f"""
WITH __ab_t AS ({table_sql}),
__ab_m AS (SELECT {part}, {arm_expr} AS arm,
                  CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(v) AS BIGINT) AS s,
                  CAST(sum(v * v) AS BIGINT) AS ss
           FROM (SELECT *, {value_expr} AS v FROM __ab_t)
           GROUP BY {part}, {arm_expr}),
__ab_p AS (SELECT {part},
       CAST(coalesce(max(CASE WHEN arm = 0 THEN n END), 0) AS DOUBLE) AS na,
       CAST(coalesce(max(CASE WHEN arm = 1 THEN n END), 0) AS DOUBLE) AS nb,
       CAST(coalesce(max(CASE WHEN arm = 0 THEN s END), 0) AS DOUBLE) AS sa,
       CAST(coalesce(max(CASE WHEN arm = 1 THEN s END), 0) AS DOUBLE) AS sb,
       CAST(coalesce(max(CASE WHEN arm = 0 THEN ss END), 0) AS DOUBLE) AS ssa,
       CAST(coalesce(max(CASE WHEN arm = 1 THEN ss END), 0) AS DOUBLE) AS ssb
       FROM __ab_m GROUP BY {part}),
__ab_v AS (SELECT *,
       (ssa - sa * sa / na) / (na - 1) / na AS van,
       (ssb - sb * sb / nb) / (nb - 1) / nb AS vbn
       FROM __ab_p),
__ab_e AS (SELECT *, van + vbn AS se2 FROM __ab_v)
SELECT {part},
       CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       CASE WHEN na > 0 THEN sa / na END AS mean_a,
       CASE WHEN nb > 0 THEN sb / nb END AS mean_b,
       CASE WHEN na > 1 AND nb > 1 AND se2 > 0
       THEN (sa / na - sb / nb) / sqrt(se2) END AS t_stat,
       CASE WHEN na > 1 AND nb > 1 AND se2 > 0
       THEN (se2 * se2) / ((van * van) / (na - 1)
                           + (vbn * vbn) / (nb - 1)) END AS welch_df
FROM __ab_e
"""


def rank_auc(
    ds: Dataset,
    keys: Sequence[str],
    score_col: str,
    label_col: str,
    *,
    num_buckets: int | None = None,
) -> Dataset:
    """Per-key ROC AUC of a score against a binary label — the
    tie-aware Mann-Whitney rank statistic, the standard readout for "is
    this quality/classifier score actually separating good from bad
    documents" at corpus scale.

    Rule (exactly the rank formulation): with ``avgrank(v)`` the
    average 1-based rank of score value ``v`` under ascending order,
    ``AUC = (Σ_pos avgrank − n_pos·(n_pos+1)/2) / (n_pos·n_neg)``.
    Doubling the ranks keeps every shuffled quantity an INTEGER:
    ``2·avgrank(v) = 2·(#strictly-below) + count(v) + 1``, so
    ``AUC = (Σ_v n_pos(v)·r2(v) − n_pos·(n_pos+1)) / (2·n_pos·n_neg)``
    is one exact int64 numerator and ONE final division — bit-identical
    to the SQL window mirror (:func:`rank_auc_oracle_sql`).

    Scale shape: ``score_col`` must be quantized (ints / coarse
    rounds); the shuffle then sees one row per DISTINCT ``(keys,
    score)`` with integer ``(n, n_pos)`` partial counts — raw rows
    never move.  ``label_col`` must be 0/1 integers.  Keys where either
    class is empty get NULL auc.  Output: ``keys + (n_pos, n_neg,
    auc)``.
    """
    from pdf_extract_ray.stages.agg import bucketed_group_apply, grouped_aggregate

    keys = list(keys)

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        out = b[keys].copy()
        out["__v"] = b[score_col].to_numpy(np.int64)
        out["__pos"] = b[label_col].to_numpy(np.int64)
        return out

    cnt = grouped_aggregate(
        ds.map_batches(derive, batch_format="pandas"),
        keys + ["__v"],
        {"__n": ("__pos", "count"), "__np": ("__pos", "sum")},
        num_buckets=num_buckets,
    )

    def body(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(keys + ["__v"], kind="mergesort")
        n = g["__n"].to_numpy(np.int64)
        below = g.groupby(keys, sort=False)["__n"].cumsum().to_numpy(
            np.int64) - n
        r2 = 2 * below + n + 1
        g = g.assign(__r2pos=g["__np"].to_numpy(np.int64) * r2)
        m = g.groupby(keys, as_index=False).agg(
            __r2pos=("__r2pos", "sum"), __np=("__np", "sum"),
            __n=("__n", "sum"))
        npos = m["__np"].to_numpy(np.int64)
        nneg = (m["__n"] - m["__np"]).to_numpy(np.int64)
        num = (m["__r2pos"].to_numpy(np.int64)
               - npos * (npos + 1)).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            auc = num / (2 * npos * nneg)
        out = m[keys].copy()
        out["n_pos"] = npos
        out["n_neg"] = nneg
        out["auc"] = np.where((npos > 0) & (nneg > 0), auc, np.nan)
        return out

    return bucketed_group_apply(cnt, keys, body, num_buckets=num_buckets)


def rank_auc_oracle_sql(
    table_sql: str,
    keys: Sequence[str],
    score_expr: str,
    label_expr: str,
) -> str:
    """DuckDB mirror of :func:`rank_auc` via window ranks:
    ``2·avgrank = 2·rank() + count(v over ties) − 1`` (``rank()`` is
    1 + #strictly-below), then the same single-division finish."""
    part = ", ".join(keys)
    return f"""
WITH __auc_t AS (SELECT {part}, {score_expr} AS v, {label_expr} AS pos
                 FROM ({table_sql})),
__auc_r AS (SELECT {part}, pos,
       2 * (rank() OVER (PARTITION BY {part} ORDER BY v))
         + (count(*) OVER (PARTITION BY {part}, v)) - 1 AS r2
       FROM __auc_t),
__auc_a AS (SELECT {part},
       CAST(sum(pos * r2) AS BIGINT) AS r2pos,
       CAST(sum(pos) AS BIGINT) AS np,
       CAST(count(*) - sum(pos) AS BIGINT) AS nn
       FROM __auc_r GROUP BY {part})
SELECT {part}, np AS n_pos, nn AS n_neg,
       CASE WHEN np > 0 AND nn > 0 THEN
         CAST(r2pos - np * (np + 1) AS DOUBLE) / (2 * np * nn) END AS auc
FROM __auc_a
"""


def psi_drift(
    ds: Dataset,
    cat_col: str,
    snap_col: str,
    *,
    num_buckets: int | None = None,
) -> "pd.DataFrame":
    """Per-category Population Stability Index terms between two
    snapshots — the standard ML-monitoring drift readout ("did the
    language/source/score-bucket mix shift between crawl A and crawl
    B").  ``snap_col`` must be 0/1 integers (A = 0, B = 1).

    Per category: ``psi_term = (p_a − p_b) · ln(p_a / p_b)`` with
    ``p = n / N_snapshot``, rounded to 6 decimals (the repo's libm-ulp
    convention, same as PMI); categories absent from either snapshot
    get NULL (their PSI term is infinite).  Total PSI = sum of terms,
    left to the reader (a float sum over categories is
    order-sensitive).

    Scale shape: ONE grouped integer count on ``(cat, snap)`` with
    map-side partials; the result table is bounded by
    O(#categories × 2) BY CONSTRUCTION, so the pivot + finish runs on
    the driver — raw rows never move.
    """
    from pdf_extract_ray.stages.agg import grouped_aggregate
    from pdf_extract_ray.util import round_half_away

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "__cat": b[cat_col].to_numpy(),
            "__snap": b[snap_col].to_numpy(np.int64),
        })

    cnt = grouped_aggregate(
        ds.map_batches(derive, batch_format="pandas"),
        ["__cat", "__snap"], {"n": ("__snap", "count")},
        num_buckets=num_buckets,
    ).to_pandas()

    wide = cnt.pivot_table(index="__cat", columns="__snap", values="n",
                           aggfunc="first", fill_value=0)
    na = wide.get(0, pd.Series(0, index=wide.index)).to_numpy(np.int64)
    nb = wide.get(1, pd.Series(0, index=wide.index)).to_numpy(np.int64)
    na_tot, nb_tot = int(na.sum()), int(nb.sum())
    with np.errstate(divide="ignore", invalid="ignore"):
        pa_ = na / np.float64(na_tot)
        pb_ = nb / np.float64(nb_tot)
        term = round_half_away((pa_ - pb_) * np.log(pa_ / pb_), 6)
    out = pd.DataFrame({cat_col: wide.index.to_numpy()})
    out["n_a"] = na
    out["n_b"] = nb
    out["psi_term"] = np.where((na > 0) & (nb > 0), term, np.nan)
    return out


def psi_drift_oracle_sql(
    table_sql: str,
    cat_col: str,
    snap_expr: str,
) -> str:
    """DuckDB mirror of :func:`psi_drift` (same expression tree; the
    round-to-6 absorbs libm ``ln`` last-ulp differences)."""
    return f"""
WITH __psi_t AS (SELECT {cat_col} AS cat, {snap_expr} AS snap
                 FROM ({table_sql})),
__psi_c AS (SELECT cat, snap, count(*) AS n FROM __psi_t GROUP BY 1, 2),
__psi_p AS (SELECT cat,
       coalesce(max(CASE WHEN snap = 0 THEN n END), 0) AS n_a,
       coalesce(max(CASE WHEN snap = 1 THEN n END), 0) AS n_b
       FROM __psi_c GROUP BY cat),
__psi_tot AS (SELECT sum(n_a) AS na_tot, sum(n_b) AS nb_tot FROM __psi_p)
SELECT cat AS {cat_col},
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CASE WHEN n_a > 0 AND n_b > 0 THEN
         round((CAST(n_a AS DOUBLE) / na_tot - CAST(n_b AS DOUBLE) / nb_tot)
               * ln((CAST(n_a AS DOUBLE) / na_tot)
                    / (CAST(n_b AS DOUBLE) / nb_tot)), 6) END AS psi_term
FROM __psi_p, __psi_tot
"""


def grouped_entropy_terms(
    ds: Dataset,
    keys: Sequence[str],
    cat_col: str,
    *,
    num_buckets: int | None = None,
) -> Dataset:
    """Per-(group, category) Shannon-entropy terms — the
    distribution-diversity readout ("is this user/host a one-note bot or
    a diverse browser"; low event-type entropy per user is a classic
    automation cue).

    Emits one row per ``(keys..., cat)``: the integer count ``n``, the
    group total ``n_group``, and ``entropy_term =
    round(-(n/N)·ln(n/N), 6)``; the group's entropy is the SUM of its
    terms — left to the reader, exactly like :func:`psi_drift`'s total,
    because a float sum over categories is order-sensitive and every
    emitted value here must be a SINGLE frozen IEEE expression over
    exact integers (the repo's round-6 libm-ulp convention).

    Scale shape: ONE grouped integer count on ``(keys, cat)`` with
    map-side partials, then one bucketed regroup of the already
    -aggregated count rows (narrow ints + the key strings) to attach
    each group's total — raw rows never move twice."""
    from pdf_extract_ray.stages.agg import bucketed_group_apply, grouped_aggregate
    from pdf_extract_ray.util import round_half_away

    keys = list(keys)

    cnt = grouped_aggregate(
        ds, keys + [cat_col], {"n": (cat_col, "count")},
        num_buckets=num_buckets)

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        out = g.copy()
        tot = g.groupby(keys)["n"].transform("sum").to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        p = n / tot.astype(np.float64)
        out["n_group"] = tot
        out["entropy_term"] = round_half_away(-p * np.log(p), 6)
        return out

    return bucketed_group_apply(cnt, keys, attach, num_buckets=num_buckets)


def grouped_entropy_terms_oracle_sql(
    table_sql: str,
    keys: Sequence[str],
    cat_col: str,
) -> str:
    """DuckDB mirror of :func:`grouped_entropy_terms` (identical
    expression tree; round-6 absorbs libm ln ulps)."""
    keys = list(keys)
    ksel = ", ".join(keys)
    return f"""
WITH __ent_c AS (
  SELECT {ksel}, {cat_col}, count(*) AS n
  FROM ({table_sql}) GROUP BY {ksel}, {cat_col}
),
__ent_g AS (
  SELECT {ksel}, sum(n) AS n_group FROM __ent_c GROUP BY {ksel}
)
SELECT c.{', c.'.join(keys)}, c.{cat_col},
       CAST(c.n AS BIGINT) AS n,
       CAST(g.n_group AS BIGINT) AS n_group,
       round(-(CAST(c.n AS DOUBLE) / CAST(g.n_group AS DOUBLE))
             * ln(CAST(c.n AS DOUBLE) / CAST(g.n_group AS DOUBLE)), 6)
         AS entropy_term
FROM __ent_c c JOIN __ent_g g USING ({ksel})
"""


def calibration_bins(
    ds: Dataset,
    score_col: str,
    label_col: str,
    *,
    lo: int,
    hi: int,
    n_bins: int,
    num_buckets: int | None = None,
) -> "pd.DataFrame":
    """Reliability-diagram bins for a classifier score — "when the model
    says 0.8, is it right 80% of the time" — the standard calibration
    readout for quality/toxicity classifiers gating a training corpus.

    ``score_col`` and ``label_col`` must be integers (label 0/1).  Rows
    with ``score < lo`` or ``score >= hi`` are DROPPED (frozen
    out-of-range rule); ``bin = (score − lo) · n_bins // (hi − lo)`` is
    pure integer arithmetic, so binning is exact and
    parallelism-independent.  Per bin: ``n``, ``mean_score = Σs / n``
    and ``frac_pos = Σlabel / n`` — integer sums shuffled, ONE division
    each at the end (single frozen IEEE expressions).

    Scale shape: narrow derive map -> ONE grouped integer aggregate with
    map-side partials; the driver finish sees O(n_bins) rows."""
    from pdf_extract_ray.stages.agg import grouped_aggregate

    if hi <= lo or n_bins < 1:
        raise ValueError("need hi > lo and n_bins >= 1")
    span = int(hi) - int(lo)

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        s = b[score_col].to_numpy(np.int64)
        y = b[label_col].to_numpy(np.int64)
        keep = (s >= lo) & (s < hi)
        s, y = s[keep], y[keep]
        return pd.DataFrame({
            "bin": (s - lo) * n_bins // span,
            "__s": s, "__y": y})

    agg = grouped_aggregate(
        ds.map_batches(derive, batch_format="pandas"),
        ["bin"], {"n": ("__s", "count"), "sum_score": ("__s", "sum"),
                  "n_pos": ("__y", "sum")},
        num_buckets=num_buckets,
    ).to_pandas().sort_values("bin").reset_index(drop=True)

    n = agg["n"].to_numpy(np.int64)
    agg["mean_score"] = agg["sum_score"].to_numpy(np.int64) / n.astype(np.float64)
    agg["frac_pos"] = agg["n_pos"].to_numpy(np.int64) / n.astype(np.float64)
    return agg


def calibration_bins_oracle_sql(
    table_sql: str,
    score_expr: str,
    label_expr: str,
    *,
    lo: int,
    hi: int,
    n_bins: int,
) -> str:
    """DuckDB mirror of :func:`calibration_bins` (integer binning and
    sums; the two divisions are the only float ops on both sides)."""
    span = int(hi) - int(lo)
    return f"""
WITH __cal_t AS (
  SELECT {score_expr} AS s, {label_expr} AS y FROM ({table_sql})
),
__cal_b AS (
  SELECT (s - {int(lo)}) * {int(n_bins)} // {span} AS bin, s, y
  FROM __cal_t WHERE s >= {int(lo)} AND s < {int(hi)}
)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(s) AS BIGINT) AS sum_score,
       CAST(sum(y) AS BIGINT) AS n_pos,
       CAST(sum(s) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_score,
       CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS frac_pos
FROM __cal_b GROUP BY bin
"""


def chisq_terms(
    ds: Dataset,
    keys: Sequence[str],
    arm_col: str,
    cat_col: str,
    *,
    num_buckets: int | None = None,
) -> Dataset:
    """Per-(group, arm, category) chi-squared contingency terms — the
    independence readout behind "did the variant change the outcome
    mix" (categorical A/B) and "is this feature independent of the
    label" (feature screening over a candidate quality signal).

    Emits one row per observed ``(keys..., arm, cat)`` cell: the exact
    integer observed count ``n``, the arm/category/grand totals
    (``n_arm``, ``n_cat``, ``n_key``), and ``chisq_term =
    round((n − e)²/e, 6)`` with ``e = n_arm·n_cat/n_key`` the expected
    count under independence.  The group's chi-squared statistic is the
    SUM of its terms PLUS the expected counts of unobserved cells —
    left to the reader, exactly like :func:`psi_drift`'s total, because
    a float sum over cells is order-sensitive and every emitted value
    must be a single frozen IEEE expression over exact integers (the
    repo's round-6 convention).

    Scale shape: ONE grouped integer count on ``(keys, arm, cat)``
    with map-side partials, then one bucketed regroup of the already
    -aggregated rows to attach the three marginal totals (pandas
    ``transform`` sums inside the bucket) — raw rows never move twice.
    """
    keys = list(keys)

    cnt = grouped_aggregate(
        ds, keys + [arm_col, cat_col], {"n": (arm_col, "count")},
        num_buckets=num_buckets)

    from pdf_extract_ray.stages.agg import bucketed_group_apply
    from pdf_extract_ray.util import round_half_away

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        out = g.copy()
        out["n_arm"] = g.groupby(keys + [arm_col])["n"].transform(
            "sum").to_numpy(np.int64)
        out["n_cat"] = g.groupby(keys + [cat_col])["n"].transform(
            "sum").to_numpy(np.int64)
        out["n_key"] = g.groupby(keys)["n"].transform("sum").to_numpy(
            np.int64)
        o = out["n"].to_numpy(np.int64)
        e = (out["n_arm"].to_numpy(np.int64).astype(np.float64)
             * out["n_cat"].to_numpy(np.int64)
             / out["n_key"].to_numpy(np.int64))
        d = o - e
        out["chisq_term"] = round_half_away(d * d / e, 6)
        return out

    return bucketed_group_apply(cnt, keys, attach, num_buckets=num_buckets)


def chisq_terms_oracle_sql(
    table_sql: str,
    keys: Sequence[str],
    arm_expr: str,
    cat_expr: str,
) -> str:
    """DuckDB mirror of :func:`chisq_terms` (identical expression tree
    over the same exact integer marginals; round-6 convention)."""
    keys = list(keys)
    ksel = ", ".join(keys)
    return f"""
WITH __cs_t AS (SELECT {ksel}, {arm_expr} AS arm, {cat_expr} AS cat
                FROM ({table_sql})),
__cs_c AS (SELECT {ksel}, arm, cat, count(*) AS n
           FROM __cs_t GROUP BY {ksel}, arm, cat)
SELECT {ksel}, arm, cat, CAST(n AS BIGINT) AS n,
       CAST(sum(n) OVER (PARTITION BY {ksel}, arm) AS BIGINT) AS n_arm,
       CAST(sum(n) OVER (PARTITION BY {ksel}, cat) AS BIGINT) AS n_cat,
       CAST(sum(n) OVER (PARTITION BY {ksel}) AS BIGINT) AS n_key,
       round((n - CAST(sum(n) OVER (PARTITION BY {ksel}, arm) AS DOUBLE)
                  * sum(n) OVER (PARTITION BY {ksel}, cat)
                  / sum(n) OVER (PARTITION BY {ksel}))
             * (n - CAST(sum(n) OVER (PARTITION BY {ksel}, arm) AS DOUBLE)
                    * sum(n) OVER (PARTITION BY {ksel}, cat)
                    / sum(n) OVER (PARTITION BY {ksel}))
             / (CAST(sum(n) OVER (PARTITION BY {ksel}, arm) AS DOUBLE)
                * sum(n) OVER (PARTITION BY {ksel}, cat)
                / sum(n) OVER (PARTITION BY {ksel})), 6) AS chisq_term
FROM __cs_c
"""


def ks_test(
    ds: Dataset,
    keys: Sequence[str],
    arm_col: str,
    value_col: str,
    *,
    num_buckets: int | None = None,
) -> Dataset:
    """Per-key two-sample Kolmogorov–Smirnov statistic between arms 0
    and 1 — "did the variant shift the whole DISTRIBUTION" (not just the
    mean, Welch's blind spot): the max absolute gap between the two
    empirical CDFs.

    ``value_col`` must hold INTEGER-VALUED numbers (quantize/floor
    upstream): the per-(key, value) arm counts are then exact int64
    partials, the cumulative gap maximization runs entirely in integers
    — ``d_num = max_v |cum_a(v)·n_b − cum_b(v)·n_a|`` — and
    ``ks_d = d_num / (n_a·n_b)`` is ONE final IEEE division, so the
    result is bit-identical to the SQL window mirror
    (:func:`ks_test_oracle_sql`).  Rows whose arm is neither 0 nor 1
    are ignored.  Keys where either arm is empty get NULL ``ks_d``.

    Scale shape: narrow derive + ONE grouped integer count on
    ``(keys, value)`` with map-side partials (the shuffle sees one row
    per DISTINCT quantized value per key, never raw rows), then a
    bucketed per-key sort+cumsum over the bounded count table.
    """
    keys = list(keys)

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        arm = b[arm_col].to_numpy(np.int64)
        keep = (arm == 0) | (arm == 1)
        out = b.loc[keep, keys].copy()
        out["__v"] = b.loc[keep, value_col].to_numpy(
            np.float64).astype(np.int64)
        out["__a"] = (arm[keep] == 0).astype(np.int64)
        out["__b"] = (arm[keep] == 1).astype(np.int64)
        return out

    cnt = grouped_aggregate(
        ds.map_batches(derive, batch_format="pandas"),
        keys + ["__v"],
        {"__na": ("__a", "sum"), "__nb": ("__b", "sum")},
        num_buckets=num_buckets)

    from pdf_extract_ray.stages.agg import bucketed_group_apply

    def body(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(keys + ["__v"], kind="mergesort")
        grp = g.groupby(keys, sort=False)
        ca = grp["__na"].cumsum().to_numpy(np.int64)
        cb = grp["__nb"].cumsum().to_numpy(np.int64)
        na = grp["__na"].transform("sum").to_numpy(np.int64)
        nb = grp["__nb"].transform("sum").to_numpy(np.int64)
        gap = np.abs(ca * nb - cb * na)
        m = (g.assign(__gap=gap, __na_t=na, __nb_t=nb)
             .groupby(keys, as_index=False)
             .agg(n_a=("__na_t", "first"), n_b=("__nb_t", "first"),
                  d_num=("__gap", "max")))
        n_a = m["n_a"].to_numpy(np.int64)
        n_b = m["n_b"].to_numpy(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            d = m["d_num"].to_numpy(np.int64).astype(np.float64) / (
                n_a * n_b).astype(np.float64)
        m["ks_d"] = np.where((n_a > 0) & (n_b > 0), d, np.nan)
        return m

    return bucketed_group_apply(cnt, keys, body, num_buckets=num_buckets)


def ks_test_oracle_sql(
    table_sql: str,
    keys: Sequence[str],
    arm_expr: str,
    value_expr: str,
) -> str:
    """DuckDB mirror of :func:`ks_test` via window cumsums — the gap
    maximization is all-integer, the single division is the only float
    op on both sides (bit parity)."""
    keys = list(keys)
    ksel = ", ".join(keys)
    return f"""
WITH __ks_t AS (SELECT {ksel}, {arm_expr} AS arm, {value_expr} AS v
                FROM ({table_sql})),
__ks_c AS (SELECT {ksel}, v,
                  sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS na,
                  sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS nb
           FROM __ks_t WHERE arm IN (0, 1) GROUP BY {ksel}, v),
__ks_w AS (SELECT {ksel},
                  sum(na) OVER (PARTITION BY {ksel} ORDER BY v) AS ca,
                  sum(nb) OVER (PARTITION BY {ksel} ORDER BY v) AS cb,
                  sum(na) OVER (PARTITION BY {ksel}) AS nat,
                  sum(nb) OVER (PARTITION BY {ksel}) AS nbt
           FROM __ks_c)
SELECT {ksel},
       CAST(max(nat) AS BIGINT) AS n_a,
       CAST(max(nbt) AS BIGINT) AS n_b,
       CAST(max(abs(ca * nbt - cb * nat)) AS BIGINT) AS d_num,
       CASE WHEN max(nat) > 0 AND max(nbt) > 0 THEN
         CAST(max(abs(ca * nbt - cb * nat)) AS DOUBLE)
         / CAST(max(nat) * max(nbt) AS DOUBLE) END AS ks_d
FROM __ks_w GROUP BY {ksel}
"""


def wilson_bounds(
    ds: Dataset,
    keys: Sequence[str],
    label_col: str,
    *,
    z: float = 1.96,
    num_buckets: int | None = None,
) -> Dataset:
    """Per-key positive-rate Wilson score interval — the standard
    small-sample-safe way to RANK groups by a binary rate (host quality
    pass-rate, classifier agreement rate): the lower bound penalizes
    tiny samples, so a 2/2 host doesn't outrank a 980/1000 one.

    ``label_col`` must be 0/1 integers.  The shuffled partials are the
    exact integer ``(n, k)``; the interval is ONE frozen float
    expression evaluated identically here and in
    :func:`wilson_bounds_oracle_sql` (same operation order, round-6
    convention; IEEE sqrt is correctly rounded so the mirror agrees)::

        p      = k / n
        lb, ub = ((p + z²/(2n)) ∓ z·sqrt((p(1−p) + z²/(4n))/n)) / (1 + z²/n)

    Output per key: ``n``, ``k``, ``p_hat``, ``wilson_lb``,
    ``wilson_ub``.
    """
    keys = list(keys)

    agg = grouped_aggregate(
        ds, keys, {"n": (label_col, "count"), "k": (label_col, "sum")},
        num_buckets=num_buckets)

    from pdf_extract_ray.util import round_half_away

    z = float(z)
    z2 = z * z

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        n = b["n"].to_numpy(np.int64)
        k = b["k"].to_numpy(np.int64)
        p = k / n.astype(np.float64)
        center = p + z2 / (2 * n)
        rad = z * np.sqrt((p * (1 - p) + z2 / (4 * n)) / n)
        denom = 1 + z2 / n
        b["p_hat"] = p
        b["wilson_lb"] = round_half_away((center - rad) / denom, 6)
        b["wilson_ub"] = round_half_away((center + rad) / denom, 6)
        return b

    return agg.map_batches(finish, batch_format="pandas")


def wilson_bounds_oracle_sql(
    table_sql: str,
    keys: Sequence[str],
    label_expr: str,
    *,
    z: float = 1.96,
) -> str:
    """DuckDB mirror of :func:`wilson_bounds` — the z and z² literals
    are the repr of the exact Python doubles, and the expression tree
    matches the engine's operation order."""
    keys = list(keys)
    ksel = ", ".join(keys)
    z = float(z)
    zs, z2s = repr(z), repr(z * z)
    return f"""
WITH __wb_c AS (SELECT {ksel},
                       CAST(count(*) AS BIGINT) AS n,
                       CAST(sum({label_expr}) AS BIGINT) AS k
                FROM ({table_sql}) GROUP BY {ksel}),
__wb_p AS (SELECT *, CAST(k AS DOUBLE) / n AS p FROM __wb_c)
SELECT {ksel}, n, k, p AS p_hat,
       round(((p + {z2s} / (2 * n))
              - {zs} * sqrt((p * (1 - p) + {z2s} / (4 * n)) / n))
             / (1 + {z2s} / n), 6) AS wilson_lb,
       round(((p + {z2s} / (2 * n))
              + {zs} * sqrt((p * (1 - p) + {z2s} / (4 * n)) / n))
             / (1 + {z2s} / n), 6) AS wilson_ub
FROM __wb_p
"""
