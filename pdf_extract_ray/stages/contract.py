"""Data-contract validation — the schema/content gate a production
ingest runs before a table enters the pipeline: null checks, value
ranges, regex shapes, enums and key uniqueness, reported as one tiny
``(rule, n_violations)`` table instead of a crash on row one.

Frozen rule semantics (the SQL oracle mirrors each exactly):
- ``not_null:col``      — count of NULL values;
- ``range:col``         — non-null values outside ``lo <= v <= hi``
                          (nulls are not_null's job, counted nowhere
                          else);
- ``pattern:col``       — non-null values not FULLY matching the
                          anchored regex (RE2-safe patterns only);
- ``allowed:col``       — non-null values outside the enum;
- ``unique:col``        — duplicate non-null values, counted as
                          ``n_nonnull - n_distinct``.

Scale shape: every rule except ``unique`` is an additive per-batch
count — ONE narrow pass emits a <=R-row partial per batch and a tiny
grouped merge sums them.  ``unique`` is the one rule that genuinely
needs a shuffle; it moves per-batch DISTINCT (col, count) partials
(map-side shrink) through one grouped merge and sums ``count - 1``
over duplicated keys — ids-only, bodies never move.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from ray.data import Dataset


def validate_table(
    ds: Dataset,
    *,
    not_null: list[str] | None = None,
    ranges: dict[str, tuple[float, float]] | None = None,
    patterns: dict[str, str] | None = None,
    allowed: dict[str, list] | None = None,
    unique: list[str] | None = None,
) -> Dataset:
    """``(rule, n_violations)`` — one row per declared rule (zero rows
    are reported too: a rule that found nothing proves it ran)."""
    from pdf_extract_ray.stages.agg import grouped_aggregate

    not_null = list(not_null or [])
    ranges = dict(ranges or {})
    patterns = {c: re.compile(p) for c, p in (patterns or {}).items()}
    allowed = {c: set(v) for c, v in (allowed or {}).items()}
    unique = list(unique or [])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows: dict[str, int] = {}
        for c in not_null:
            rows[f"not_null:{c}"] = int(b[c].isna().sum())
        for c, (lo, hi) in ranges.items():
            v = b[c].dropna()
            rows[f"range:{c}"] = int(((v < lo) | (v > hi)).sum())
        for c, rx in patterns.items():
            v = b[c].dropna().astype(str)
            rows[f"pattern:{c}"] = int((~v.str.fullmatch(rx)).sum())
        for c, vals in allowed.items():
            v = b[c].dropna()
            rows[f"allowed:{c}"] = int((~v.isin(vals)).sum())
        return pd.DataFrame({
            "rule": list(rows),
            "n_violations": np.array(list(rows.values()), np.int64),
        })

    parts = [grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        ["rule"], {"n_violations": ("n_violations", "sum")})]

    for c in unique:
        def key_counts(b: pd.DataFrame, c=c) -> pd.DataFrame:
            v = b[c].dropna()
            k, n = np.unique(v.to_numpy(), return_counts=True)
            return pd.DataFrame({"__k": k, "__n": n.astype(np.int64)})

        merged = grouped_aggregate(
            ds.map_batches(key_counts, batch_format="pandas"),
            ["__k"], {"__n": ("__n", "sum")})

        def dup_total(b: pd.DataFrame, c=c) -> pd.DataFrame:
            n = b["__n"].to_numpy(np.int64)
            return pd.DataFrame({
                "rule": [f"unique:{c}"],
                "n_violations": np.array([int((n - 1).sum())], np.int64),
            })

        parts.append(grouped_aggregate(
            merged.map_batches(dup_total, batch_format="pandas"),
            ["rule"], {"n_violations": ("n_violations", "sum")}))

    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def validate_table_oracle_sql(
    table_sql: str,
    *,
    not_null: list[str] | None = None,
    ranges: dict[str, tuple[float, float]] | None = None,
    patterns: dict[str, str] | None = None,
    allowed: dict[str, list] | None = None,
    unique: list[str] | None = None,
) -> str:
    """DuckDB mirror of :func:`validate_table` (UNION ALL of one
    aggregate per rule)."""
    sel = []
    for c in (not_null or []):
        sel.append(f"SELECT 'not_null:{c}' AS rule, "
                   f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) "
                   f"AS BIGINT) AS n_violations FROM t")
    for c, (lo, hi) in (ranges or {}).items():
        sel.append(f"SELECT 'range:{c}', "
                   f"CAST(sum(CASE WHEN {c} IS NOT NULL AND "
                   f"({c} < {lo!r} OR {c} > {hi!r}) THEN 1 ELSE 0 END) "
                   f"AS BIGINT) FROM t")
    for c, p in (patterns or {}).items():
        sel.append(f"SELECT 'pattern:{c}', "
                   f"CAST(sum(CASE WHEN {c} IS NOT NULL AND NOT "
                   f"regexp_matches(CAST({c} AS VARCHAR), '^({p})$') "
                   f"THEN 1 ELSE 0 END) AS BIGINT) FROM t")
    for c, vals in (allowed or {}).items():
        lit = ", ".join(
            f"'{v}'" if isinstance(v, str) else repr(v) for v in vals)
        sel.append(f"SELECT 'allowed:{c}', "
                   f"CAST(sum(CASE WHEN {c} IS NOT NULL AND {c} NOT IN "
                   f"({lit}) THEN 1 ELSE 0 END) AS BIGINT) FROM t")
    for c in (unique or []):
        sel.append(f"SELECT 'unique:{c}', "
                   f"CAST(count({c}) - count(DISTINCT {c}) AS BIGINT) "
                   f"FROM t")
    body = "\nUNION ALL\n".join(sel)
    return f"WITH t AS ({table_sql})\n{body}"


def analyze_columns(
    ds,
    cols,
    *,
    num_buckets: int | None = None,
):
    """ANALYZE-style column profile — ``(col, n_rows, n_nulls,
    n_distinct)`` per requested column, the stats pass a planner (or a
    data-quality dashboard) runs before anything else.  Distinct counts
    are EXACT (each engine counts distinct over its own native values,
    so no cross-engine value casting is involved in the compare).

    Scale shape: ONE narrow pass emits per-batch pre-deduplicated
    ``(col, repr(value))`` rows plus per-batch null/row partials; one
    grouped dedup + count per column bounds the shuffle by the number
    of DISTINCT values per column (the quantity being measured), never
    the corpus.  ``repr`` keys the distinct shuffle only — Python repr
    is round-trip faithful, hence injective on the value set."""
    import numpy as np
    import pandas as pd

    from pdf_extract_ray.stages.agg import grouped_aggregate

    cols = list(cols)

    def vals(b: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for c in cols:
            s = b[c].dropna()
            parts.append(pd.DataFrame({
                "col": c, "v": s.map(repr).drop_duplicates()}))
        return pd.concat(parts, ignore_index=True)

    distinct = grouped_aggregate(
        ds.map_batches(vals, batch_format="pandas"), ["col", "v"],
        {"__n": ("v", "count")}, num_buckets=num_buckets)
    ndv = grouped_aggregate(
        distinct, ["col"], {"n_distinct": ("__n", "count")},
        num_buckets=num_buckets).to_pandas()

    def null_partials(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "col": cols,
            "n_rows": np.int64(len(b)),
            "n_nulls": [np.int64(b[c].isna().sum()) for c in cols]})

    nulls = grouped_aggregate(
        ds.map_batches(null_partials, batch_format="pandas"), ["col"],
        {"n_rows": ("n_rows", "sum"), "n_nulls": ("n_nulls", "sum")},
        num_buckets=num_buckets).to_pandas()

    out = nulls.merge(ndv, on="col", how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0).astype(np.int64)
    return out.sort_values("col").reset_index(drop=True)


def analyze_columns_oracle_sql(table_sql: str, cols) -> str:
    """DuckDB mirror of :func:`analyze_columns`."""
    parts = [
        f"SELECT '{c}' AS col, CAST(count(*) AS BIGINT) AS n_rows, "
        f"CAST(count(*) - count({c}) AS BIGINT) AS n_nulls, "
        f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct "
        f"FROM ({table_sql})"
        for c in cols
    ]
    return " UNION ALL ".join(parts)


def benford_digit_stats(
    ds: Dataset,
    keys,
    value_col: str,
    *,
    num_buckets: int | None = None,
) -> Dataset:
    """Per-group Benford's-law leading-digit audit — the classic
    fabricated-numbers / scraping-corruption screen for a numeric
    column: naturally-occurring magnitudes follow
    ``P(d) = log10(1 + 1/d)``, while templated or synthesized values
    don't.

    Frozen rule: ``v = floor(value)`` as int64; rows with ``v < 1`` are
    DROPPED (no leading digit); the digit is the first character of the
    decimal representation.  Per ``(keys..., digit)``: the exact
    integer count ``n``, the group total ``n_group``, the observed
    frequency ``p_obs = n/n_group`` (one division), the Benford
    expectation ``benford_p = round(log10(1+1/d), 6)`` and
    ``dev_term = round(n/n_group − log10(1+1/d), 6)`` (round-6 absorbs
    libm log ulps, the repo's convention).

    Scale shape: narrow derive map -> ONE grouped integer count with
    map-side partials (≤ 9 digit rows per group) -> one bucketed
    regroup to attach the group totals."""
    from pdf_extract_ray.stages.agg import (
        bucketed_group_apply, grouped_aggregate)
    from pdf_extract_ray.util import round_half_away

    keys = list(keys)

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        v = np.floor(b[value_col].to_numpy(np.float64)).astype(np.int64)
        keep = v >= 1
        out = b.loc[keep, keys].copy()
        out["digit"] = (pd.Series(v[keep]).astype(str).str[0]
                        .astype(np.int64).to_numpy())
        return out

    cnt = grouped_aggregate(
        ds.map_batches(derive, batch_format="pandas"),
        keys + ["digit"], {"n": ("digit", "count")},
        num_buckets=num_buckets)

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        out = g.copy()
        tot = g.groupby(keys)["n"].transform("sum").to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        d = g["digit"].to_numpy(np.int64)
        p = n / tot.astype(np.float64)
        bp = np.log10(1.0 + 1.0 / d)
        out["n_group"] = tot
        out["p_obs"] = p
        out["benford_p"] = round_half_away(bp, 6)
        out["dev_term"] = round_half_away(p - bp, 6)
        return out

    return bucketed_group_apply(cnt, keys, attach, num_buckets=num_buckets)


def benford_digit_stats_oracle_sql(
    table_sql: str,
    keys,
    value_expr: str,
) -> str:
    """DuckDB mirror of :func:`benford_digit_stats` (same frozen
    floor/first-char rule; round-6 absorbs log10 ulps)."""
    keys = list(keys)
    ksel = ", ".join(keys)
    return f"""
WITH __bf_t AS (SELECT {ksel},
                       CAST(floor({value_expr}) AS BIGINT) AS v
                FROM ({table_sql})),
__bf_d AS (SELECT {ksel},
                  CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit
           FROM __bf_t WHERE v >= 1),
__bf_c AS (SELECT {ksel}, digit, count(*) AS n
           FROM __bf_d GROUP BY {ksel}, digit)
SELECT {ksel}, digit, CAST(n AS BIGINT) AS n,
       CAST(sum(n) OVER (PARTITION BY {ksel}) AS BIGINT) AS n_group,
       CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY {ksel}) AS p_obs,
       round(log10(1 + 1.0 / digit), 6) AS benford_p,
       round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY {ksel})
             - log10(1 + 1.0 / digit), 6) AS dev_term
FROM __bf_c
"""
