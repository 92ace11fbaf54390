"""Bucketed grouped execution: the high-cardinality groupby pattern.

``Dataset.groupby(keys).map_groups(fn)`` and ``.aggregate(...)`` pay
per-group Python overhead inside Ray Data (~0.1-0.2 ms per group), which
dominates when there are 10^4+ groups of a few rows each — exactly the
shape of per-url reassembly, per-(user,window) rollups and dedup keys at
crawl scale.

The pattern here: hash rows into a bounded number of COARSE buckets (one
shuffle, same data movement as the naive groupby), then run ONE task per
bucket whose body is vectorized pandas/pyarrow over all of that bucket's
groups.  Group count no longer appears in the task count.

The bucket hash is deterministic (pandas.util.hash_pandas_object with the
default hash key), so the same key always lands in the same bucket at any
parallelism level — outputs stay byte-identical.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pandas as pd

from ray.data import Dataset


def _bucket_of(frame: pd.DataFrame, keys: Sequence[str], num_buckets: int) -> np.ndarray:
    h = pd.util.hash_pandas_object(
        frame[list(keys)] if len(keys) > 1 else frame[keys[0]], index=False
    )
    return (h % np.uint64(num_buckets)).astype(np.int64).to_numpy()


def default_num_buckets() -> int:
    try:
        import ray

        if ray.is_initialized():
            return max(32, 2 * int(ray.cluster_resources().get("CPU", 16)))
    except Exception:
        pass
    return 32


def bucketed_group_apply(
    ds: Dataset,
    keys: Sequence[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    *,
    num_buckets: int | None = None,
    drop_bucket: bool = True,
    pre_batch_size: int | None = None,
) -> Dataset:
    """Co-locate rows by ``keys`` into coarse hash buckets, then apply ``fn``
    once per bucket.  ``fn`` receives ALL rows of the bucket (a superset of
    whole key-groups, never a partial group) and should use vectorized
    pandas (``g.groupby(keys)...``) internally.

    ``pre_batch_size``: batch size for the bucket-tagging map.  Small
    upstream blocks (Ray's 2x-CPU read floor fragments small inputs into
    ~80-row blocks) multiply both the map task count and the sort
    operator's input-block count; a larger pre-batch coalesces them,
    cutting the all-to-all's fixed cost.  Set it for narrow-row streams
    (ids/hashes); leave None when rows are wide (documents)."""
    nb = num_buckets or default_num_buckets()
    keys = list(keys)

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__bucket"] = _bucket_of(b, keys, nb)
        return b

    def apply(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop(columns=["__bucket"]) if drop_bucket else group
        return fn(g)

    return (
        ds.map_batches(
            add_bucket, batch_format="pandas",
            batch_size=pre_batch_size if pre_batch_size else "default",
        )
        .groupby("__bucket")
        .map_groups(apply, batch_format="pandas")
    )


def stratified_sample(
    ds: Dataset,
    keys: Sequence[str],
    id_col: str,
    k: int,
    *,
    num_buckets: int | None = None,
) -> Dataset:
    """Deterministic per-key sample: the k rows with the smallest
    ``md5(id)`` within each key group — a seedless, order-independent,
    SQL-mirrorable "random" sample (md5 of the id is uniform but fixed,
    so every run and every parallelism picks the same rows; balanced
    per-domain/per-language corpus sampling at crawl scale).

    One bucketed shuffle; rank computed vectorized per bucket."""
    import hashlib

    keys = list(keys)

    def pick(bucket: pd.DataFrame) -> pd.DataFrame:
        h = bucket[id_col].map(lambda v: hashlib.md5(str(v).encode()).hexdigest())
        b = bucket.assign(__h=h).sort_values(
            keys + ["__h"], kind="mergesort")
        out = b.groupby(keys, as_index=False, sort=False).head(k)
        return out.drop(columns=["__h"])

    return bucketed_group_apply(ds, keys, pick, num_buckets=num_buckets)


def grouped_aggregate(
    ds: Dataset,
    keys: Sequence[str],
    agg_spec: dict[str, tuple[str, str]],
    *,
    num_buckets: int | None = None,
) -> Dataset:
    """High-cardinality grouped aggregate with map-side partials.

    ``agg_spec``: output_col -> (input_col, op) with op in
    {sum, count, min, max}.  Two-phase: vectorized per-batch partials
    (shrinks the shuffle), then bucketed vectorized final merge.
    count partials re-aggregate as sums.
    """
    keys = list(keys)
    spec = dict(agg_spec)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        named = {}
        for out, (col, op) in spec.items():
            if op == "count":
                b = b.assign(__one=1)
                named[out] = ("__one", "sum")
            else:
                named[out] = (col, op)
        return b.groupby(keys, as_index=False).agg(**named)

    merge_ops = {
        out: (out, "sum" if spec[out][1] in ("sum", "count") else spec[out][1])
        for out in spec
    }

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(keys, as_index=False).agg(**merge_ops)

    partials = ds.map_batches(partial, batch_format="pandas")
    return bucketed_group_apply(partials, keys, final, num_buckets=num_buckets)
