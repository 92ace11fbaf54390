"""Event-sequence analytics: funnel progression and cohort retention.

The reference is a batch document pipeline with no event semantics; these
are engine extensions for the event-log side of a crawl/product corpus
(the `events` table shape: (key, ts, event_type, value)).  Both operators
follow the engine-wide grouped contract: ONE bucketed shuffle co-locates
a key's rows, bodies are vectorized pandas over whole key groups, results
are order/parallelism independent because every per-key reduction is a
``min`` / set-distinct (commutative).

- ``funnel``: ordered multi-step conversion — for each key, the earliest
  timestamp of step 1, then the earliest step-2 event STRICTLY AFTER it,
  and so on; optionally every later step must land within ``within`` of
  the step-1 time (the funnel window).  One row per key that reached
  step 1, with per-step timestamps (NaT once the chain breaks) and a
  ``steps_completed`` count.
- ``cohort_retention``: classic cohort × period-offset retention counts.
  A key's cohort is the first fixed-width period (``period_days``-day
  buckets anchored at 1970-01-01) it appears in; output is one row per
  (cohort, period_offset) with the distinct-key count.  The shuffle
  ships per-batch-deduplicated (key, period) pairs — bodies never move.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from ray.data import Dataset

from pdf_extract_ray.stages.agg import bucketed_group_apply, grouped_aggregate


def funnel(
    ds: Dataset,
    steps: Sequence[str],
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    within: pd.Timedelta | str | None = None,
    num_buckets: int | None = None,
) -> Dataset:
    """Funnel progression per key (see module docstring).

    Output columns: ``key_col``, ``t1..tn`` (timestamp of the earliest
    valid event of each step; NaT from the first unreached step on) and
    ``steps_completed`` (int64, >= 1 — keys that never did step 1 emit
    no row).  Step semantics: ``t_{i}`` is the minimum event time of
    ``steps[i-1]`` strictly after ``t_{i-1}`` (and, with ``within``, at
    most ``t1 + within``) — each per-key reduction is a filtered min,
    so the result is independent of row order and parallelism.
    """
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    win = pd.Timedelta(within) if within is not None else None
    tcols = [f"t{i}" for i in range(1, len(steps) + 1)]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        first = g.loc[g[event_col] == steps[0]].groupby(key_col)[ts_col].min()
        res = first.rename("t1").reset_index()
        prev = first
        for i, step in enumerate(steps[1:], start=2):
            m = g.loc[g[event_col] == step]
            pt = m[key_col].map(prev)
            ok = pt.notna() & (m[ts_col] > pt)
            if win is not None:
                t1 = m[key_col].map(first)
                ok &= m[ts_col] <= t1 + win
            cur = m.loc[ok].groupby(key_col)[ts_col].min()
            res[f"t{i}"] = pd.to_datetime(
                res[key_col].map(cur)).astype("datetime64[us]")
            prev = cur
        res["t1"] = res["t1"].astype("datetime64[us]")
        res["steps_completed"] = res[tcols].notna().sum(axis=1).astype(
            np.int64)
        return res

    return bucketed_group_apply(ds, [key_col], per_bucket,
                                num_buckets=num_buckets)


def funnel_oracle_sql(
    table_sql: str,
    steps: Sequence[str],
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    within_sql: str | None = None,
) -> str:
    """DuckDB mirror of :func:`funnel` (chained filtered-min CTEs;
    ``within_sql`` e.g. ``"INTERVAL 7 DAY"``)."""
    steps = list(steps)
    k, t, e = key_col, ts_col, event_col
    ctes = [f"__e AS (SELECT * FROM {table_sql})",
            f"s1 AS (SELECT {k}, min({t}) AS t1 FROM __e "
            f"WHERE {e} = '{steps[0]}' GROUP BY {k})"]
    for i in range(2, len(steps) + 1):
        joins = f"JOIN s{i - 1} USING ({k})"
        cond = f"e.{e} = '{steps[i - 1]}' AND e.{t} > s{i - 1}.t{i - 1}"
        if within_sql is not None:
            if i > 2:
                joins += f" JOIN s1 USING ({k})"
            cond += f" AND e.{t} <= s1.t1 + {within_sql}"
        ctes.append(
            f"s{i} AS (SELECT e.{k}, min(e.{t}) AS t{i} FROM __e e "
            f"{joins} WHERE {cond} GROUP BY e.{k})")
    tcols = [f"t{i}" for i in range(1, len(steps) + 1)]
    done = " + ".join(
        f"CASE WHEN {c} IS NOT NULL THEN 1 ELSE 0 END" for c in tcols)
    left = " ".join(
        f"LEFT JOIN s{i} USING ({k})" for i in range(2, len(steps) + 1))
    return (
        f"WITH {', '.join(ctes)} "
        f"SELECT {k}, {', '.join(tcols)}, "
        f"CAST({done} AS BIGINT) AS steps_completed "
        f"FROM s1 {left}")


def cohort_retention(
    ds: Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
    num_buckets: int | None = None,
) -> Dataset:
    """Cohort retention counts (see module docstring).

    Output: ``(cohort, period_offset, n_users)`` — ``cohort`` is the
    key's first period index (``floor(days_since_epoch / period_days)``,
    int64), ``period_offset`` >= 0, ``n_users`` the distinct-key count.
    Scale shape: the shuffle sees per-batch-DEDUPLICATED (key, period)
    pairs (bounded by keys × active periods, not row count); the final
    (cohort, offset) aggregate is a tiny second groupby.
    """
    if period_days < 1:
        raise ValueError("period_days must be >= 1")

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        days = b[ts_col].to_numpy().astype("datetime64[D]").astype(np.int64)
        return pd.DataFrame({
            key_col: b[key_col].to_numpy(),
            "__p": days // period_days,
        }).drop_duplicates()

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates([key_col, "__p"])
        cohort = g.groupby(key_col)["__p"].transform("min")
        pairs = pd.DataFrame({"cohort": cohort.to_numpy(),
                              "period_offset": (g["__p"] - cohort).to_numpy()})
        out = pairs.groupby(["cohort", "period_offset"],
                            as_index=False).size()
        return out.rename(columns={"size": "n_users"})

    partial = bucketed_group_apply(
        ds.map_batches(derive, batch_format="pandas"), [key_col],
        per_bucket, num_buckets=num_buckets)
    return grouped_aggregate(partial, ["cohort", "period_offset"],
                             {"n_users": ("n_users", "sum")},
                             num_buckets=num_buckets)


def cohort_retention_oracle_sql(
    table_sql: str,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> str:
    """DuckDB mirror of :func:`cohort_retention`."""
    k = key_col
    p = (f"datediff('day', DATE '1970-01-01', CAST({ts_col} AS DATE)) "
         f"// {period_days}")
    return (
        f"WITH up AS (SELECT DISTINCT {k}, {p} AS p FROM {table_sql}), "
        f"c AS (SELECT {k}, min(p) AS cohort FROM up GROUP BY {k}) "
        f"SELECT cohort, p - cohort AS period_offset, "
        f"CAST(count(*) AS BIGINT) AS n_users "
        f"FROM up JOIN c USING ({k}) GROUP BY 1, 2")


def cumulative_users(
    ds: Dataset,
    user_col: str,
    ts_col: str,
    *,
    num_buckets: int | None = None,
) -> "pd.DataFrame":
    """Daily new-vs-cumulative distinct users — the audience-growth
    readout (and, for a crawl, the hosts-discovered-over-time curve):
    each user counts once, on the day of their FIRST event.

    Output per day (int days since epoch, so both engines agree on the
    dtype): ``(day, n_new, cum_users)`` with ``cum_users`` the exact
    running total — integer arithmetic end to end.

    Scale shape: ONE grouped min (first day per user, map-side
    partials), ONE grouped count over the bounded (user -> day) table,
    then a driver cumsum over the O(#days) day table."""
    from pdf_extract_ray.stages.agg import grouped_aggregate

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        days = b[ts_col].to_numpy().astype("datetime64[D]").astype(np.int64)
        return pd.DataFrame({"__u": b[user_col].to_numpy(np.int64),
                             "__d": days})

    first = grouped_aggregate(
        ds.map_batches(derive, batch_format="pandas"),
        ["__u"], {"d0": ("__d", "min")}, num_buckets=num_buckets)
    per_day = grouped_aggregate(
        first, ["d0"], {"n_new": ("d0", "count")},
        num_buckets=num_buckets,
    ).to_pandas().sort_values("d0").reset_index(drop=True)
    out = pd.DataFrame({
        "day": per_day["d0"].to_numpy(np.int64),
        "n_new": per_day["n_new"].to_numpy(np.int64)})
    out["cum_users"] = np.cumsum(out["n_new"].to_numpy(np.int64))
    return out


def cumulative_users_oracle_sql(
    table_sql: str,
    user_col: str,
    ts_col: str,
) -> str:
    """DuckDB mirror of :func:`cumulative_users`."""
    return f"""
WITH __cu_f AS (
  SELECT {user_col} AS u,
         min(datediff('day', DATE '1970-01-01', CAST({ts_col} AS DATE)))
           AS d0
  FROM ({table_sql}) GROUP BY {user_col}
),
__cu_n AS (SELECT d0 AS day, count(*) AS n_new FROM __cu_f GROUP BY d0)
SELECT CAST(day AS BIGINT) AS day,
       CAST(n_new AS BIGINT) AS n_new,
       CAST(sum(n_new) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum_users
FROM __cu_n
"""


def item_cooccurrence(
    ds: Dataset,
    key_col: str,
    item_col: str,
    *,
    min_both: int = 1,
    num_buckets: int | None = None,
) -> Dataset:
    """Market-basket co-occurrence with lift (the association-rule
    support/lift readout, public formulas): for every unordered item
    pair, how many keys (users, hosts, sessions) carry BOTH, and
    ``lift = n_both * n_keys / (n_a * n_b)`` — lift > 1 = the items
    attract, < 1 = they repel.  The per-item-pair affinity report
    behind "users who trigger X also trigger Y" and topic-cohesion
    checks.

    Scale shape: the global distinct ``(key, item)`` set comes from ONE
    grouped merge (map-side per-batch dedup); per-key item sets then
    pair up inside ONE bucketed cogroup keyed on the key — the
    quadratic is per key and bounded by the item-category count, never
    by corpus size — with per-bucket pre-counted ``(a, b, n)`` partials
    into a final tiny grouped merge.  Per-item key counts reduce from
    the same distinct set; the bounded item-count table broadcasts
    into the finish map.  All counts are integers; ``lift`` is one
    int-product division, rounded to 6.

    Output: ``(item_a, item_b, n_both, n_a, n_b, lift)`` with
    ``item_a < item_b``, filtered to ``n_both >= min_both``."""
    import ray

    from pdf_extract_ray.util import round_half_away

    def dedup_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b[[key_col, item_col]].drop_duplicates()

    distinct = grouped_aggregate(
        ds.map_batches(dedup_partial, batch_format="pandas"),
        [key_col, item_col], {"__n": (item_col, "count")},
        num_buckets=num_buckets)

    # bounded per-item key counts + the key universe size
    item_counts = grouped_aggregate(
        distinct, [item_col], {"n_keys": (item_col, "count")},
        num_buckets=num_buckets).to_pandas()
    n_keys_total = int(grouped_aggregate(
        distinct, [key_col], {"__n": (key_col, "count")},
        num_buckets=num_buckets).count())
    counts_ref = ray.put(dict(zip(item_counts[item_col],
                                  item_counts["n_keys"].astype("int64"))))

    def pair_rows(g: pd.DataFrame) -> pd.DataFrame:
        a_l, b_l = [], []
        for _, grp in g.groupby(key_col, sort=False):
            items = sorted(set(grp[item_col]))
            for i in range(len(items)):
                for j in range(i + 1, len(items)):
                    a_l.append(items[i])
                    b_l.append(items[j])
        if not a_l:
            return pd.DataFrame({"item_a": pd.Series([], dtype=object),
                                 "item_b": pd.Series([], dtype=object),
                                 "n_both": pd.Series([], dtype="int64")})
        f = pd.DataFrame({"item_a": a_l, "item_b": b_l})
        f["n_both"] = np.int64(1)
        return f.groupby(["item_a", "item_b"], as_index=False).sum()

    pairs = grouped_aggregate(
        bucketed_group_apply(distinct, [key_col], pair_rows,
                             num_buckets=num_buckets),
        ["item_a", "item_b"], {"n_both": ("n_both", "sum")},
        num_buckets=num_buckets)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        cmap = ray.get(counts_ref)
        b = b[b["n_both"].to_numpy(np.int64) >= min_both].copy()
        na = b["item_a"].map(cmap).to_numpy(np.int64)
        nb = b["item_b"].map(cmap).to_numpy(np.int64)
        both = b["n_both"].to_numpy(np.int64)
        b["n_a"], b["n_b"] = na, nb
        b["lift"] = round_half_away(
            both.astype(np.float64) * np.float64(n_keys_total)
            / (na.astype(np.float64) * nb.astype(np.float64)), 6)
        return b

    return pairs.map_batches(finish, batch_format="pandas")


def item_cooccurrence_oracle_sql(
    table_sql: str,
    key_col: str,
    item_col: str,
    *,
    min_both: int = 1,
) -> str:
    """DuckDB mirror of :func:`item_cooccurrence` — distinct pairs via
    a self-join, integer counts, one rounded division."""
    return f"""
WITH __co_d AS (SELECT DISTINCT {key_col} AS k, {item_col} AS it
                FROM ({table_sql})),
__co_i AS (SELECT it, CAST(count(*) AS BIGINT) AS n_keys
           FROM __co_d GROUP BY it),
__co_n AS (SELECT CAST(count(DISTINCT k) AS BIGINT) AS total FROM __co_d),
__co_p AS (SELECT a.it AS item_a, b.it AS item_b,
                  CAST(count(*) AS BIGINT) AS n_both
           FROM __co_d a JOIN __co_d b ON a.k = b.k AND a.it < b.it
           GROUP BY 1, 2)
SELECT item_a, item_b, n_both, ia.n_keys AS n_a, ib.n_keys AS n_b,
       round(CAST(n_both AS DOUBLE) * CAST(total AS DOUBLE)
             / (CAST(ia.n_keys AS DOUBLE) * CAST(ib.n_keys AS DOUBLE)),
             6) AS lift
FROM __co_p JOIN __co_i ia ON ia.it = item_a
JOIN __co_i ib ON ib.it = item_b, __co_n
WHERE n_both >= {int(min_both)}
"""
