"""Stream-shaped windowing over an ordered, partitioned log (guide pattern;
the reference is strictly batch — SURVEY.md §2.9 — so these are the
engine's streaming-analogue extensions).

Windows are computed per key over ts-sorted groups inside the bucketed
grouped shuffle (stages/agg.py): tumbling windows reduce to a derived
key + grouped aggregate; session windows need the sorted scan below.
"""

from __future__ import annotations

import pandas as pd

from ray.data import Dataset

from pdf_extract_ray.util import round_half_away


def sessionize(
    events: Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap: pd.Timedelta = pd.Timedelta(minutes=30),
    num_buckets: int | None = None,
) -> Dataset:
    """Session windows: a new session starts when the gap to the previous
    event of the same key exceeds ``gap``.  Output: one row per
    (key, session_id) with start/end/count/sum; session_id is 1-based in
    ts order (deterministic at any parallelism — the per-key scan happens
    after an explicit in-bucket sort)."""
    from pdf_extract_ray.stages.agg import bucketed_group_apply

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values([key_col, ts_col], kind="mergesort")
        new_key = b[key_col] != b[key_col].shift()
        gap_break = (b[ts_col] - b[ts_col].shift()) > gap
        b = b.assign(__s=(new_key | gap_break).cumsum())
        # session_id restarts per key: rank the per-key session groups
        first = b.groupby(key_col)["__s"].transform("min")
        b["session_id"] = b["__s"] - first + 1
        out = b.groupby([key_col, "session_id"], as_index=False).agg(
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
            n_events=(ts_col, "count"),
            sum_value=(value_col, "sum"),
        )
        out["sum_value"] = round_half_away(out["sum_value"], 2)
        return out

    return bucketed_group_apply(events, [key_col], per_bucket,
                                num_buckets=num_buckets)


def hopping_window(
    events: Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    size: pd.Timedelta = pd.Timedelta(hours=1),
    hop: pd.Timedelta = pd.Timedelta(minutes=30),
    num_buckets: int | None = None,
) -> Dataset:
    """Hopping (sliding) windows: every event belongs to the ``size/hop``
    windows covering it; per-(key, window_start) count/sum rollup.

    Scale shape: window assignment is a map-side EXPLODE (each row emits
    size/hop copies tagged with its window starts — small constant), then
    the standard map-side-partial + bucketed grouped aggregate; no sort,
    no per-window state."""
    if size % hop != pd.Timedelta(0):
        raise ValueError("size must be a multiple of hop")
    n_hops = size // hop
    hop_us = hop.value // 1000

    from pdf_extract_ray.stages.agg import grouped_aggregate

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        # normalize to us epoch regardless of the column's datetime unit
        ts_us = b[ts_col].astype("datetime64[us]").astype("int64")
        base = (ts_us // hop_us) * hop_us          # latest window start
        parts = []
        for k in range(n_hops):
            w = base - k * hop_us
            parts.append(pd.DataFrame({
                key_col: b[key_col].to_numpy(),
                "window_start": w.to_numpy(),
                value_col: b[value_col].to_numpy(),
            }))
        return pd.concat(parts, ignore_index=True)

    out = grouped_aggregate(
        events.map_batches(explode, batch_format="pandas"),
        [key_col, "window_start"],
        {"n_events": (key_col, "count"), "sum_value": (value_col, "sum")},
        num_buckets=num_buckets,
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b["window_start"] = pd.to_datetime(b["window_start"], unit="us")
        b["sum_value"] = round_half_away(b["sum_value"], 2)
        return b

    return out.map_batches(finish, batch_format="pandas")


def grouped_lag(
    ds: Dataset,
    keys: list[str],
    order_cols: list[str],
    value_col: str,
    *,
    out_col: str = "prev_value",
    periods: int = 1,
    num_buckets: int | None = None,
) -> Dataset:
    """LAG(value) OVER (PARTITION BY keys ORDER BY order_cols): one
    bucketed shuffle co-locates each key's rows, then a vectorized sorted
    shift per bucket.  ``order_cols`` must order rows uniquely within a
    key or the lag target is ambiguous (same contract as SQL)."""
    from pdf_extract_ray.stages.agg import bucketed_group_apply

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(list(keys) + list(order_cols), kind="mergesort")
        b[out_col] = b.groupby(list(keys), sort=False)[value_col].shift(periods)
        return b

    return bucketed_group_apply(ds, keys, per_bucket, num_buckets=num_buckets)


def adjacent_pairs(
    ds: Dataset,
    order_col: str,
    value_col: str,
    *,
    out_left: str = "kr_text",
    out_right: str = "en_text",
    block: int = 4096,
    num_buckets: int | None = None,
    pre_batch_size: int | None = None,
) -> Dataset:
    """Self-pair each row ``i`` with row ``i+1`` on an integer order column
    WITHOUT a hash join: range-bucket rows by ``order_col // block`` and
    send ONE ghost copy of each block's first row to the previous block,
    so every (i, i+1) pair is complete inside exactly one range bucket.
    The range buckets are then coarsened through the bucketed shuffle so
    block count never appears in the task count.

    Output: (order_col, out_left=value[i], out_right=value[i+1]) for every
    i where i+1 exists — identical to an inner self-join on
    ``right.order_col == left.order_col + 1``, at one shuffle of the data
    with no join build side.  Contract: ``order_col`` values are unique."""
    import numpy as np

    from pdf_extract_ray.stages.agg import bucketed_group_apply

    def route(b: pd.DataFrame) -> pd.DataFrame:
        k = b[order_col].to_numpy()
        rb = k // block
        main = pd.DataFrame({order_col: k, value_col: b[value_col].to_numpy(),
                             "__rb": rb, "__ghost": False})
        # no `rb > 0` guard: order values may be negative (the contract
        # only requires unique ints), and a ghost routed to a negative
        # range-block is harmless — it just keeps the (-1, 0) boundary pair
        gmask = k % block == 0
        if gmask.any():
            ghosts = pd.DataFrame({
                order_col: k[gmask], value_col: b[value_col].to_numpy()[gmask],
                "__rb": rb[gmask] - 1, "__ghost": True})
            return pd.concat([main, ghosts], ignore_index=True)
        return main

    def pair(bucket: pd.DataFrame) -> pd.DataFrame:
        # a row and its ghost can share a coarse bucket when adjacent range
        # blocks hash together: keep the main copy (sorts first)
        g = bucket.sort_values([order_col, "__ghost"], kind="mergesort")
        g = g.drop_duplicates(order_col, keep="first")
        k = g[order_col].to_numpy()
        v = g[value_col].to_numpy()
        ghost = g["__ghost"].to_numpy()
        if len(k) < 2:
            return pd.DataFrame({order_col: [], out_left: [], out_right: []})
        ok = (k[1:] == k[:-1] + 1) & ~ghost[:-1]
        return pd.DataFrame({
            order_col: k[:-1][ok],
            out_left: v[:-1][ok],
            out_right: v[1:][ok],
        })

    return bucketed_group_apply(
        ds.map_batches(route, batch_format="pandas"), ["__rb"], pair,
        num_buckets=num_buckets, pre_batch_size=pre_batch_size,
    )
