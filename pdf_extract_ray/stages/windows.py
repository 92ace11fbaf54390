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
