"""Warehouse-style OLAP operators: GROUPING SETS / ROLLUP / CUBE,
pivot-to-wide, and per-group rank / ntile.

Reference parity: the reference's report layer re-aggregates the same
grouped stats at several granularities (per-file, per-language, grand
total — report assembly in its database/report modules) by running one
SQL pass per level.  Here every level derives from ONE scan:

- ``grouping_sets`` computes the FINEST grouped partials once
  (map-side combine inside ``map_batches`` -> one bucketed shuffle of
  partial rows, the ``grouped_aggregate`` shape), then derives every
  coarser level by re-aggregating the already-tiny finest result —
  re-aggregation is valid because the supported ops (sum / count /
  min / max) are decomposable.  A ROLLUP over 100 TB costs one full
  scan + one shuffle of partials, not one scan per level.
- ``pivot_wide`` turns a categorical column into fixed wide columns
  with map-side conditional partials: the shuffle ships <=
  ``len(index_keys) + len(categories)`` columns x (distinct index
  keys per batch) rows.  The category vocabulary is an explicit
  argument — at 10^12 rows you know (or pre-compute once) the
  vocabulary; inferring it per-run would be a second full scan.
- ``grouped_rank`` assigns dense_rank / row_number / ntile within
  each key group via ONE bucketed cogroup (rows of a key always land
  in one bucket) + a vectorized in-bucket sort.  Partitioning
  assumption: one key group's rows fit in a bucket worker's heap —
  the same contract as every grouped op in this engine.

All rolled-out key slots are REAL Arrow nulls typed from the input
schema (not NaN), so results hash-match the SQL ``ROLLUP`` output.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from pdf_extract_ray.stages.agg import bucketed_group_apply

_OPS = ("sum", "count", "min", "max")


def _merge_op(op: str) -> str:
    # partial counts re-aggregate as sums; sum/min/max are idempotent
    return "sum" if op in ("sum", "count") else op


def grouping_sets(
    ds: Dataset,
    keys: Sequence[str],
    agg_spec: dict[str, tuple[str, str]],
    sets: Sequence[Sequence[str]],
    *,
    num_buckets: int | None = None,
) -> Dataset:
    """Grouped aggregate at several granularities from ONE scan.

    ``agg_spec``: out_col -> (input_col, op), op in {sum,count,min,max}.
    ``sets``: the grouping sets; every set must be a subset of ``keys``.
    Output columns are the keys used by AT LEAST ONE set (the SQL rule:
    a column in no grouping set cannot be selected) + the aggregates;
    key columns absent from a given set come back as typed Arrow nulls.
    Key values themselves must be non-null (a null key would be
    indistinguishable from a rolled-out slot — same caveat as SQL
    without ``GROUPING()``).
    """
    keys = list(keys)
    spec = dict(agg_spec)
    for out, (_col, op) in spec.items():
        if op not in _OPS:
            raise ValueError(f"unsupported op {op!r} for {out!r}")
    for s in sets:
        extra = set(s) - set(keys)
        if extra:
            raise ValueError(f"grouping set {list(s)} not a subset of keys: "
                             f"{sorted(extra)}")

    # typed nulls for rolled-out slots come from the INPUT schema
    # (parquet metadata — no execution triggered).  Pandas-backed
    # datasets report numpy dtypes here; map them to Arrow (object
    # dtype means strings in this engine's tables).
    in_schema = ds.schema()
    key_type = {}
    for name, typ in zip(in_schema.names, in_schema.types):
        if name not in keys:
            continue
        if not isinstance(typ, pa.DataType):
            dt = np.dtype(typ) if typ is not object else np.dtype("O")
            typ = (pa.string() if dt.kind in ("O", "U")
                   else pa.from_numpy_dtype(dt))
        key_type[name] = typ

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        named = {}
        for out, (col, op) in spec.items():
            if op == "count":
                b = b.assign(__one=1)
                named[out] = ("__one", "sum")
            else:
                named[out] = (col, op)
        return b.groupby(keys, as_index=False).agg(**named)

    merge = {out: (out, _merge_op(spec[out][1])) for out in spec}
    finest = bucketed_group_apply(
        ds.map_batches(partial, batch_format="pandas"),
        keys,
        lambda g: g.groupby(keys, as_index=False).agg(**merge),
        num_buckets=num_buckets,
    )

    used_keys = [k for k in keys if any(k in s for s in sets)]
    out_cols = used_keys + list(spec)

    def level_of(sub: list[str]) -> Dataset:
        if sorted(sub) == sorted(keys):
            lvl = finest
        elif sub:
            lvl = bucketed_group_apply(
                finest, sub,
                lambda g: g.groupby(sub, as_index=False).agg(**merge),
                num_buckets=num_buckets)
        else:
            # grand total: constant-key merge (a single tiny group)
            def total(g: pd.DataFrame) -> pd.DataFrame:
                return (g.drop(columns=["__g"]).assign(__g=0)
                        .groupby("__g", as_index=False).agg(**merge)
                        .drop(columns=["__g"]))

            lvl = bucketed_group_apply(
                finest.map_batches(lambda b: b.assign(__g=0),
                                   batch_format="pandas"),
                ["__g"], total, drop_bucket=True, num_buckets=1)

        rolled = [k for k in used_keys if k not in sub]

        def widen(t: pa.Table) -> pa.Table:
            for k in rolled:
                t = t.append_column(k, pa.nulls(t.num_rows, key_type[k]))
            return t.select(out_cols)

        return lvl.map_batches(widen, batch_format="pyarrow")

    levels = [level_of(list(s)) for s in sets]
    return levels[0].union(*levels[1:]) if len(levels) > 1 else levels[0]


def rollup_aggregate(
    ds: Dataset,
    keys: Sequence[str],
    agg_spec: dict[str, tuple[str, str]],
    *,
    num_buckets: int | None = None,
) -> Dataset:
    """``GROUP BY ROLLUP(keys)``: every key prefix + the grand total."""
    keys = list(keys)
    sets = [keys[:i] for i in range(len(keys), -1, -1)]
    return grouping_sets(ds, keys, agg_spec, sets, num_buckets=num_buckets)


def cube_aggregate(
    ds: Dataset,
    keys: Sequence[str],
    agg_spec: dict[str, tuple[str, str]],
    *,
    num_buckets: int | None = None,
) -> Dataset:
    """``GROUP BY CUBE(keys)``: every subset of ``keys``."""
    keys = list(keys)
    sets: list[list[str]] = []
    for mask in range(1 << len(keys)):
        sets.append([k for i, k in enumerate(keys) if mask >> i & 1])
    sets.sort(key=lambda s: -len(s))
    return grouping_sets(ds, keys, agg_spec, sets, num_buckets=num_buckets)


def _sets_sql(sets: Sequence[Sequence[str]]) -> str:
    return ", ".join("(" + ", ".join(s) + ")" for s in sets)


def grouping_sets_oracle_sql(
    table_sql: str,
    keys: Sequence[str],
    agg_spec: dict[str, tuple[str, str]],
    sets: Sequence[Sequence[str]],
) -> str:
    """DuckDB mirror of ``grouping_sets`` (same column names)."""
    aggs = []
    for out, (col, op) in agg_spec.items():
        expr = "count(*)" if op == "count" else f"{op}({col})"
        aggs.append(f"{expr} AS {out}")
    used = [k for k in keys if any(k in s for s in sets)]
    return (f"SELECT {', '.join(used + aggs)} FROM {table_sql} "
            f"GROUP BY GROUPING SETS ({_sets_sql(sets)})")


def rollup_oracle_sql(table_sql: str, keys: Sequence[str],
                      agg_spec: dict[str, tuple[str, str]]) -> str:
    keys = list(keys)
    sets = [keys[:i] for i in range(len(keys), -1, -1)]
    return grouping_sets_oracle_sql(table_sql, keys, agg_spec, sets)


def cube_oracle_sql(table_sql: str, keys: Sequence[str],
                    agg_spec: dict[str, tuple[str, str]]) -> str:
    keys = list(keys)
    sets = [[k for i, k in enumerate(keys) if mask >> i & 1]
            for mask in range(1 << len(keys))]
    return grouping_sets_oracle_sql(table_sql, keys, agg_spec, sets)


def pivot_wide(
    ds: Dataset,
    index_keys: Sequence[str],
    pivot_col: str,
    categories: Sequence[str],
    *,
    value_col: str | None = None,
    op: str = "count",
    prefix: str = "",
    num_buckets: int | None = None,
) -> Dataset:
    """Pivot a categorical column into fixed wide columns.

    One row per distinct ``index_keys``; for each category ``c`` a
    column ``{prefix}{c}`` holding ``count`` of rows (or ``sum`` of
    ``value_col``) where ``pivot_col == c``.  Missing combinations are
    0 (the ``ELSE 0`` conditional-aggregation convention, so the wide
    frame is dense and join-ready).  Rows whose pivot value is outside
    ``categories`` count toward no column (they still create the index
    row if no in-vocabulary row exists — filter upstream if unwanted).
    """
    if op not in ("count", "sum"):
        raise ValueError("pivot op must be count or sum")
    if op == "sum" and value_col is None:
        raise ValueError("op='sum' needs value_col")
    index_keys = list(index_keys)
    cats = list(categories)
    out_of = {c: f"{prefix}{c}" for c in cats}

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        pv = b[pivot_col].to_numpy()
        base = (b[index_keys].copy() if op == "count"
                else b[index_keys].copy())
        if op == "count":
            for c in cats:
                base[out_of[c]] = (pv == c).astype(np.int64)
        else:
            val = b[value_col].to_numpy()
            for c in cats:
                base[out_of[c]] = np.where(pv == c, val, 0.0)
        return base.groupby(index_keys, as_index=False).sum()

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(index_keys, as_index=False).sum()

    return bucketed_group_apply(
        ds.map_batches(partial, batch_format="pandas"),
        index_keys, final, num_buckets=num_buckets)


def pivot_wide_oracle_sql(
    table_sql: str,
    index_keys: Sequence[str],
    pivot_col: str,
    categories: Sequence[str],
    *,
    value_col: str | None = None,
    op: str = "count",
    prefix: str = "",
) -> str:
    """DuckDB conditional-aggregation mirror of ``pivot_wide``."""
    cols = []
    for c in categories:
        lit = "'" + c.replace("'", "''") + "'"
        if op == "count":
            # DuckDB sums integers into HUGEINT (-> float in pandas);
            # pin BIGINT so the oracle dtype matches the engine's int64
            cols.append(f"CAST(sum(CASE WHEN {pivot_col} = {lit} THEN 1 "
                        f"ELSE 0 END) AS BIGINT) AS {prefix}{c}")
        else:
            cols.append(f"sum(CASE WHEN {pivot_col} = {lit} THEN "
                        f"{value_col} ELSE 0 END) AS {prefix}{c}")
    idx = ", ".join(index_keys)
    return (f"SELECT {idx}, {', '.join(cols)} FROM {table_sql} "
            f"GROUP BY {idx}")


def grouped_rank(
    ds: Dataset,
    keys: Sequence[str],
    order_col: str,
    *,
    descending: bool = True,
    tie_col: str | None = None,
    out_col: str = "rank",
    method: str = "dense",
    ntile: int | None = None,
    ntile_col: str = "ntile",
    num_buckets: int | None = None,
) -> Dataset:
    """Per-group ``dense_rank`` / ``row_number`` (+ optional ``ntile``).

    ``method='dense'`` ranks by ``order_col`` alone (ties share a
    rank — deterministic without a tie-break).  ``method='row_number'``
    REQUIRES ``tie_col`` so the numbering is unique and reproducible
    across shuffles.  ``ntile=k`` adds SQL ``NTILE(k)`` buckets over
    the (order_col, tie_col) ordering: first ``n % k`` buckets get
    ``ceil(n/k)`` rows — which also needs ``tie_col`` to be stable.
    """
    if method not in ("dense", "row_number"):
        raise ValueError("method must be dense or row_number")
    if (method == "row_number" or ntile) and not tie_col:
        raise ValueError("row_number / ntile need tie_col for determinism")
    keys = list(keys)
    sort_cols = keys + [order_col] + ([tie_col] if tie_col else [])
    asc = [True] * len(keys) + [not descending] + ([True] if tie_col else [])

    def body(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols, ascending=asc, kind="mergesort")
        grp = g.groupby(keys, sort=False)[order_col]
        if method == "dense":
            r = grp.rank(method="dense",
                         ascending=not descending).astype(np.int64)
        else:
            r = grp.cumcount().astype(np.int64) + 1
        g[out_col] = r
        if ntile:
            rn = grp.cumcount().to_numpy()
            n = grp.transform("size").to_numpy()
            big, rem = n // ntile + 1, n % ntile
            in_big = rn < big * rem
            g[ntile_col] = np.where(
                in_big, rn // np.maximum(big, 1),
                np.where(n >= ntile,
                         rem + (rn - big * rem) // np.maximum(n // ntile, 1),
                         rn),
            ).astype(np.int64) + 1
        return g

    return bucketed_group_apply(ds, keys, body, num_buckets=num_buckets)


def grouped_rank_oracle_sql(
    table_sql: str,
    keys: Sequence[str],
    order_col: str,
    *,
    descending: bool = True,
    tie_col: str | None = None,
    out_col: str = "rank",
    method: str = "dense",
    ntile: int | None = None,
    ntile_col: str = "ntile",
) -> str:
    """DuckDB window-function mirror of ``grouped_rank``."""
    direction = "DESC" if descending else "ASC"
    order = f"{order_col} {direction}"
    if tie_col:
        order += f", {tie_col}"
    part = ", ".join(keys)
    fn = "dense_rank()" if method == "dense" else "row_number()"
    dense_order = f"{order_col} {direction}" if method == "dense" else order
    cols = [f"{fn} OVER (PARTITION BY {part} ORDER BY {dense_order}) "
            f"AS {out_col}"]
    if ntile:
        cols.append(f"ntile({ntile}) OVER (PARTITION BY {part} "
                    f"ORDER BY {order}) AS {ntile_col}")
    return f"SELECT *, {', '.join(cols)} FROM {table_sql}"


def unpivot(
    ds: Dataset,
    id_cols: list[str],
    value_cols: list[str],
    *,
    var_col: str = "variable",
    value_col: str = "value",
) -> Dataset:
    """Wide -> long melt (the inverse of :func:`pivot_wide`): one output
    row per (input row, value column), value cast to float64 so the long
    column has one type.  Pure narrow map — zero shuffle, streams.
    """
    id_cols, value_cols = list(id_cols), list(value_cols)

    def m(b: pd.DataFrame) -> pd.DataFrame:
        w = b[id_cols + value_cols].copy()
        for c in value_cols:
            w[c] = w[c].astype(np.float64)
        return w.melt(id_vars=id_cols, value_vars=value_cols,
                      var_name=var_col, value_name=value_col)

    return ds.map_batches(m, batch_format="pandas")


def unpivot_oracle_sql(
    table_sql: str,
    id_cols: list[str],
    value_cols: list[str],
    *,
    var_col: str = "variable",
    value_col: str = "value",
) -> str:
    """DuckDB UNION-ALL mirror of :func:`unpivot`."""
    ids = ", ".join(id_cols)
    arms = [
        f"SELECT {ids}, '{c}' AS {var_col}, "
        f"CAST({c} AS DOUBLE) AS {value_col} FROM __t"
        for c in value_cols
    ]
    return (f"WITH __t AS (SELECT * FROM {table_sql}) "
            + " UNION ALL ".join(arms))
