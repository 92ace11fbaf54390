"""Join operators Ray Data lacks natively: as-of (temporal) join, broadcast
range/interval join, and broadcast hash join.

The reference joins its per-document tables with pandas merges inside one
process (`euaa_사례/sentences/aligner.py` LEFT joins, J6-J8 in SURVEY §2);
at crawl scale the interesting joins are temporal ("most recent state row
as of this event") and dimensional ("enrich a 10^12-row fact stream with a
small lookup").  Three shapes, each with an explicit scale contract:

- ``asof_join``: key-bucketed cogroup (ONE shuffle of only the projected
  columns, tagged Arrow-native with ``pa.nulls`` padding so no pandas
  round-trip happens on the map side), then a vectorized
  ``pd.merge_asof`` per bucket.  Hot keys concentrate in a bucket like
  any keyed shuffle — size ``num_buckets`` to the cluster; a single key
  hotter than one worker's memory needs the range-bucket variant of
  ``windows.adjacent_pairs`` instead (document ordering, not identity).
- ``broadcast_range_join``: the small interval table is validated,
  sorted, and ``ray.put`` ONCE; every batch does a ``searchsorted``
  against it.  Zero shuffle — the 100 TB side streams.
- ``broadcast_hash_join``: small dimension ``ray.put`` once, per-batch
  vectorized ``DataFrame.merge``.  Zero shuffle.  The replacement for a
  shuffle join whenever one side fits in a worker heap.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from pdf_extract_ray.stages.agg import bucketed_group_apply


def _schema_of(ds: Dataset) -> pa.Schema:
    s = ds.schema()
    return pa.schema(list(zip(s.names, s.types)))


def asof_join(
    left: Dataset,
    right: Dataset,
    *,
    on: str,
    by: str,
    right_on: str | None = None,
    right_by: str | None = None,
    right_cols: Sequence[str] | None = None,
    suffix: str = "_r",
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tie_break: str | None = None,
    how: str = "left",
    num_buckets: int | None = None,
    tolerance=None,
) -> Dataset:
    """As-of join: for each left row, attach the single right row with the
    same key whose ``right_on`` is the latest value <= the left row's
    ``on`` (direction="backward"; "forward" = earliest >=;
    "nearest" = smallest absolute distance, equidistant ties resolved
    BACKWARD — the earlier right row — matching pandas ``merge_asof``,
    frozen by pytest and the SQL-oracle tie rule ``ORDER BY abs(delta),
    right_ts``).

    ``tolerance``: optional maximum INCLUSIVE distance between ``on``
    and the matched ``right_on`` (a ``pd.Timedelta`` for timestamp
    keys, a number for numeric keys); rows with no right match inside
    the tolerance stay unmatched.

    Matches DuckDB ``ASOF [LEFT] JOIN`` / pandas ``merge_asof`` semantics.
    Output = every left column + ``right_cols`` (renamed with ``suffix``
    on collision).  Unmatched left rows survive with nulls when
    ``how="left"`` and are dropped when ``how="inner"``; right integer
    payload columns stay int64 (nullable) rather than decaying to float.

    Determinism under ties: when several right rows share (by, on), the
    row with the lexicographically greatest ``tie_break`` column (or, if
    None, greatest payload tuple) wins — the whole key-group sits in one
    bucket, so the winner is identical at any parallelism.

    Scale shape: both sides project to only the needed columns, are
    tagged with an Arrow-native side/bucket column (``pa.nulls`` padding,
    no pandas conversion, no copy of real columns), and take ONE hash
    shuffle together; each bucket runs one vectorized ``merge_asof`` over
    all of its keys.
    """
    right_on = right_on or on
    right_by = right_by or by
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "direction must be 'backward', 'forward' or 'nearest'")
    if how not in ("left", "inner"):
        raise ValueError("how must be 'left' or 'inner'")

    lschema = _schema_of(left)
    rschema = _schema_of(right)
    left_cols = list(lschema.names)
    if right_cols is None:
        right_cols = [c for c in rschema.names if c not in (right_on, right_by)]
    right_cols = list(right_cols)
    if tie_break is not None and tie_break not in right_cols:
        right_cols.append(tie_break)

    # output names for the right payload (suffix on collision with left)
    out_names = {
        c: (c + suffix if c in left_cols else c) for c in right_cols
    }
    rtypes = {c: rschema.field(c).type for c in right_cols}
    ktype = lschema.field(by).type
    ttype = lschema.field(on).type
    if rschema.field(right_by).type != ktype:
        raise TypeError(
            f"key dtype mismatch: {by}:{ktype} vs {right_by}:{rschema.field(right_by).type}")
    if rschema.field(right_on).type != ttype:
        raise TypeError(
            f"on dtype mismatch: {on}:{ttype} vs {right_on}:{rschema.field(right_on).type}")

    # unified wire schema: __k, __t, __side, left cols, right payload cols
    pay_left = [c for c in left_cols if c not in (by, on)]
    wire = ([("__k", ktype), ("__t", ttype), ("__side", pa.int8())]
            + [(c, lschema.field(c).type) for c in pay_left]
            + [(out_names[c], rtypes[c]) for c in right_cols])
    wire_names = [n for n, _ in wire]
    wire_schema = pa.schema(wire)

    def tag_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = [t.column(by), t.column(on),
                pa.nulls(n, pa.int8()).fill_null(0)]
        cols += [t.column(c) for c in pay_left]
        cols += [pa.nulls(n, rtypes[c]) for c in right_cols]
        return pa.Table.from_arrays(
            [c.cast(f.type) if c.type != f.type else c
             for c, f in zip(cols, wire_schema)], schema=wire_schema)

    def tag_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = [t.column(right_by), t.column(right_on),
                pa.nulls(n, pa.int8()).fill_null(1)]
        cols += [pa.nulls(n, lschema.field(c).type) for c in pay_left]
        cols += [t.column(c) for c in right_cols]
        return pa.Table.from_arrays(
            [c.cast(f.type) if c.type != f.type else c
             for c, f in zip(cols, wire_schema)], schema=wire_schema)

    unioned = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))

    r_out = [out_names[c] for c in right_cols]
    tb_out = out_names[tie_break] if tie_break is not None else None
    int_like = {out_names[c] for c in right_cols
                if pa.types.is_integer(rtypes[c])}

    def body(t: pa.Table) -> pa.Table:
        side = t.column("__side").to_numpy(zero_copy_only=False)
        # split in Arrow, convert each side separately so the pad nulls
        # never poison the real side's dtypes (int64 stays int64)
        lt = t.filter(pa.array(side == 0)).select(["__k", "__t"] + pay_left)
        rt = t.filter(pa.array(side == 1)).select(["__k", "__t"] + r_out)
        ldf = lt.to_pandas()
        rdf = rt.to_pandas()
        if len(rdf):
            # deterministic tie winner within (key, time)
            order = [tb_out] if tb_out else [c for c in r_out]
            rdf = (rdf.sort_values(["__k", "__t"] + order, kind="mergesort")
                      .drop_duplicates(["__k", "__t"], keep="last"))
        ldf = ldf.sort_values("__t", kind="mergesort")
        rdf = rdf.sort_values("__t", kind="mergesort")
        rdf = rdf.assign(__m=np.int8(1))
        if len(ldf) == 0:
            merged = ldf.assign(**{c: pd.Series([], dtype="object")
                                   for c in r_out + ["__m"]})
        elif len(rdf) == 0:
            merged = ldf.assign(**{c: None for c in r_out + ["__m"]})
        else:
            merged = pd.merge_asof(
                ldf, rdf, on="__t", by="__k", direction=direction,
                allow_exact_matches=allow_exact_matches,
                tolerance=tolerance)
        if how == "inner":
            merged = merged[merged["__m"].notna()]
        merged = merged.rename(columns={"__k": by, "__t": on})
        merged = merged[[by, on] + pay_left + r_out]
        # rebuild with the declared output schema: nullable int64 instead
        # of float-decayed NaN columns
        arrs = []
        out_schema = pa.schema(
            [(by, ktype), (on, ttype)]
            + [(c, lschema.field(c).type) for c in pay_left]
            + [(out_names[c], rtypes[c]) for c in right_cols])
        for f in out_schema:
            col = merged[f.name]
            if f.name in int_like and col.dtype.kind == "f":
                col = col.astype("Int64")
            arrs.append(pa.Array.from_pandas(col, type=f.type))
        return pa.Table.from_arrays(arrs, schema=out_schema)

    return bucketed_group_apply(
        unioned, ["__k"], body, num_buckets=num_buckets,
        body_format="pyarrow")


def broadcast_range_join(
    ds: Dataset,
    intervals: pd.DataFrame,
    *,
    value_col: str,
    lo_col: str,
    hi_col: str,
    payload_cols: Sequence[str] | None = None,
    how: str = "inner",
) -> Dataset:
    """Join a streaming fact table to a SMALL table of non-overlapping
    half-open intervals [lo, hi): each fact row gains the payload of the
    interval containing ``value_col``.

    The interval table is validated (sorted, non-overlapping) and shipped
    to the object store ONCE via ``ray.put``; every batch binary-searches
    it (two ``np.searchsorted``-style ops) — zero shuffle, the big side
    streams.  ``how="left"`` keeps non-matching rows with null payload;
    ``"inner"`` drops them.
    """
    if how not in ("left", "inner"):
        raise ValueError("how must be 'left' or 'inner'")
    if payload_cols is None:
        payload_cols = [c for c in intervals.columns if c not in (lo_col, hi_col)]
    payload_cols = list(payload_cols)

    iv = intervals.sort_values(lo_col, kind="mergesort").reset_index(drop=True)
    lo = iv[lo_col].to_numpy(dtype="float64")
    hi = iv[hi_col].to_numpy(dtype="float64")
    if np.any(hi <= lo):
        raise ValueError("empty or inverted interval in interval table")
    if np.any(lo[1:] < hi[:-1]):
        raise ValueError("intervals overlap; broadcast_range_join requires "
                         "disjoint [lo, hi) intervals")
    payload = {c: pa.Array.from_pandas(iv[c]) for c in payload_cols}
    handle = ray.put((lo, hi, payload))

    def apply(t: pa.Table) -> pa.Table:
        blo, bhi, bpay = ray.get(handle)
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype("float64")
        idx = np.searchsorted(blo, v, side="right") - 1
        ok = idx >= 0
        ok[ok] &= v[ok] < bhi[idx[ok]]
        idx_safe = np.where(ok, idx, 0)
        out = t
        for c in payload_cols:
            col = bpay[c].take(pa.array(idx_safe))
            if not ok.all():
                col = pa.compute.if_else(pa.array(ok), col,
                                         pa.nulls(len(v), col.type))
            out = out.append_column(c, col)
        if how == "inner" and not ok.all():
            out = out.filter(pa.array(ok))
        return out

    return ds.map_batches(apply, batch_format="pyarrow")


def broadcast_hash_join(
    ds: Dataset,
    small: pd.DataFrame,
    *,
    on: str,
    right_on: str | None = None,
    payload_cols: Sequence[str] | None = None,
    suffix: str = "_r",
    how: str = "left",
) -> Dataset:
    """Equality join against a SMALL dimension table without a shuffle:
    the dimension is ``ray.put`` once and every batch does a vectorized
    hash lookup (pandas merge) against it.

    The scale replacement for `Dataset.join` whenever one side fits in a
    worker heap (lookup/dimension tables — the reference's J6/J7 merges
    against per-document metadata are this shape).  Requires unique keys
    on the small side (validated); ``how`` = left | inner.
    """
    if how not in ("left", "inner"):
        raise ValueError("how must be 'left' or 'inner'")
    right_on = right_on or on
    if small[right_on].duplicated().any():
        raise ValueError("broadcast_hash_join requires unique keys on the "
                         "small side")
    if payload_cols is None:
        payload_cols = [c for c in small.columns if c != right_on]
    payload_cols = list(payload_cols)
    dim = small[[right_on] + payload_cols].set_index(right_on)
    int_pay = {c for c in payload_cols if dim[c].dtype.kind in "iu"}
    handle = ray.put(dim)

    def apply(b: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(handle)
        rename = {c: (c + suffix if c in b.columns else c)
                  for c in payload_cols}
        joined = b.join(d.rename(columns=rename), on=on, how=how)
        if how == "left":
            for c in payload_cols:
                oc = rename[c]
                if c in int_pay and joined[oc].dtype.kind == "f":
                    joined[oc] = joined[oc].astype("Int64")
        return joined.reset_index(drop=True)

    return ds.map_batches(apply, batch_format="pandas")


def broadcast_interval_join(
    ds: Dataset,
    intervals: pd.DataFrame,
    *,
    value_col: str,
    lo_col: str,
    hi_col: str,
    payload_cols: Sequence[str] | None = None,
    how: str = "inner",
) -> Dataset:
    """Stabbing join against a SMALL table of POSSIBLY-OVERLAPPING
    half-open intervals [lo, hi): each fact row emits ONE OUTPUT ROW PER
    interval containing ``value_col`` (the 1:N generalization of
    :func:`broadcast_range_join`, which requires disjoint intervals) —
    SQL ``JOIN b ON v >= b.lo AND v < b.hi``.

    Scale contract: the interval table is decomposed ONCE on the driver
    into elementary segments (sorted unique endpoints) with a CSR
    segment -> covering-intervals index, then ``ray.put`` — every
    interval is a union of whole segments, so per batch ONE
    ``np.searchsorted`` finds each row's segment and a pure ``np.repeat``
    gather expands rows to their covering intervals.  Zero shuffle; the
    big side streams; work scales with the true join cardinality.
    Driver setup is O(total segment coverage) — bounded by
    n_intervals x overlap depth, fine for broadcast-sized tables.

    Output row order is deterministic: input order, then intervals in
    ascending ``lo`` (ties by input position).  ``how="left"`` keeps
    rows covered by no interval with null payload; ``"inner"`` drops
    them.
    """
    if how not in ("left", "inner"):
        raise ValueError("how must be 'left' or 'inner'")
    if payload_cols is None:
        payload_cols = [c for c in intervals.columns if c not in (lo_col, hi_col)]
    payload_cols = list(payload_cols)

    iv = intervals.sort_values(lo_col, kind="mergesort").reset_index(drop=True)
    lo = iv[lo_col].to_numpy(dtype="float64")
    hi = iv[hi_col].to_numpy(dtype="float64")
    if np.any(hi <= lo):
        raise ValueError("empty or inverted interval in interval table")
    # elementary segments: [bounds[k], bounds[k+1]) for k in 0..n_seg-1
    bounds = np.unique(np.concatenate([lo, hi]))
    n_seg = len(bounds) - 1
    first = np.searchsorted(bounds, lo)   # first segment of interval i
    last = np.searchsorted(bounds, hi)    # one-past-last segment
    seg_of = np.concatenate(
        [np.arange(f, e) for f, e in zip(first, last)]) if len(lo) else \
        np.empty(0, dtype=np.int64)
    iv_of = np.repeat(np.arange(len(lo)), last - first)
    order = np.argsort(seg_of, kind="stable")  # lo-sorted within segment
    csr_iv = iv_of[order]
    csr_ptr = np.searchsorted(seg_of[order], np.arange(n_seg + 1))
    payload = {c: pa.Array.from_pandas(iv[c]) for c in payload_cols}
    handle = ray.put((bounds, csr_ptr, csr_iv, payload))

    def apply(t: pa.Table) -> pa.Table:
        b_bounds, b_ptr, b_iv, b_pay = ray.get(handle)
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype("float64")
        seg = np.searchsorted(b_bounds, v, side="right") - 1
        in_rng = (seg >= 0) & (seg < len(b_bounds) - 1)
        seg_safe = np.where(in_rng, seg, 0)
        counts = np.where(in_rng, b_ptr[seg_safe + 1] - b_ptr[seg_safe], 0)
        keep_empty = (how == "left") & (counts == 0)
        out_counts = counts + keep_empty  # left: one null row for misses
        row_idx = np.repeat(np.arange(len(v)), out_counts)
        # position of each output row within its source row's run
        run_start = np.cumsum(out_counts) - out_counts
        within = np.arange(out_counts.sum()) - np.repeat(run_start, out_counts)
        iv_ids = b_iv[np.repeat(b_ptr[seg_safe], out_counts) + within] \
            if len(row_idx) else np.empty(0, dtype=np.int64)
        matched = np.repeat(counts > 0, out_counts)
        out = t.take(pa.array(row_idx))
        iv_safe = pa.array(np.where(matched, iv_ids, 0))
        for c in payload_cols:
            col = b_pay[c].take(iv_safe)
            if not matched.all():
                col = pc.if_else(pa.array(matched), col,
                                 pa.nulls(len(matched), col.type))
            out = out.append_column(c, col)
        return out

    return ds.map_batches(apply, batch_format="pyarrow")


def bloom_filtered_join(
    left: Dataset,
    right: Dataset,
    *,
    on: str,
    right_on: str | None = None,
    num_partitions: int = 8,
    bits: int | None = None,
    k: int | None = None,
) -> Dataset:
    """Inner equi-join where the LEFT side is pre-filtered through a
    Bloom filter of the right side's keys BEFORE the join shuffle — the
    classic big-big join optimization when most left rows have no match
    (enriching a crawl with a curated subset, joining events to a small
    cohort).  Bloom false positives are harmless: the join itself drops
    them, so the result equals the plain inner join exactly.

    Scale shape: the filter build moves only ``bits/8`` bytes per block
    (OR-merged on the driver, broadcast once via ``ray.put``); the probe
    is a narrow vectorized map; only surviving left rows (true matches +
    the bounded false-positive mass) enter ``Dataset.join``'s shuffle.
    """
    from pdf_extract_ray.stages.sketch import (
        BLOOM_BITS,
        BLOOM_K,
        bloom_contains,
        bloom_sketch,
    )

    r_on = right_on or on
    bits = bits or BLOOM_BITS
    k = k or BLOOM_K
    words = bloom_sketch(right, r_on, bits=bits, k=k)
    ref = ray.put(words)

    def probe(b: pd.DataFrame) -> pd.DataFrame:
        return b.loc[bloom_contains(ray.get(ref), b[on], k=k)]

    filtered = left.map_batches(probe, batch_format="pandas")
    return filtered.join(right, join_type="inner",
                         num_partitions=num_partitions,
                         on=(on,), right_on=(r_on,))


def skew_salted_join(
    left: Dataset,
    right: Dataset,
    *,
    on: str,
    right_on: str | None = None,
    salt_col: str,
    salts: int = 8,
    hot_threshold: int = 100_000,
    max_hot: int = 65536,
    num_partitions: int = 8,
) -> Dataset:
    """Inner equi-join with HOT-KEY SALTING — the skew treatment for a
    big-big join whose key distribution has heavy hitters (a handful of
    hosts holding most pages, a celebrity user id): without salting,
    every row of a hot key lands on ONE join partition and that worker
    becomes the job.  The result equals the plain inner join exactly;
    only the shuffle layout changes.

    Mechanics: a bounded census finds keys with >= ``hot_threshold``
    left rows (at most ``n_left / hot_threshold`` keys by construction,
    capped at ``max_hot`` — a key past the cap just stays unsalted).
    Hot left rows scatter across ``salts`` sub-keys by a deterministic
    hash of ``salt_col`` (any stable column — the row's primary key);
    hot RIGHT rows replicate once per salt (the small per-key side —
    right is the dimension-ish side of the hot keys by contract); cold
    rows keep salt 0 on both sides.  The join runs on
    ``(key, __salt)``, so a hot key now spreads over ``salts``
    partitions.

    Scale shape: census moves only per-batch (key, count) partials;
    replication multiplies ONLY hot right rows; one ``Dataset.join``
    hash shuffle on the composite key."""
    from pdf_extract_ray.stages.agg import grouped_aggregate

    if salts < 2:
        raise ValueError("salts must be >= 2")
    r_on = right_on or on

    def census(b: pd.DataFrame) -> pd.DataFrame:
        vc = b[on].value_counts()
        return pd.DataFrame({on: vc.index.to_numpy(),
                             "__n": vc.to_numpy().astype(np.int64)})

    counts = grouped_aggregate(
        left.map_batches(census, batch_format="pandas"),
        [on], {"__n": ("__n", "sum")})
    # keys >= hot_threshold number at most n_left/hot_threshold by
    # pigeonhole, so the filtered table is driver-bounded and the
    # max_hot truncation is a trivial pandas nlargest — no Ray sort
    # stage (a whole all-to-all saved vs sort().limit())
    hot_df = counts.filter(expr=f"__n >= {int(hot_threshold)}").to_pandas()
    # an all-cold census comes back as an EMPTY frame with no columns
    if on in hot_df.columns:
        hot_df = hot_df.nlargest(int(max_hot), "__n")
        hot_keys = set(hot_df[on].tolist())
    else:
        hot_keys = set()
    hot_ref = ray.put(hot_keys)

    def salt_left(b: pd.DataFrame) -> pd.DataFrame:
        hot = ray.get(hot_ref)
        is_hot = b[on].isin(hot).to_numpy()
        h = pd.util.hash_pandas_object(b[salt_col], index=False).to_numpy()
        return b.assign(__salt=np.where(
            is_hot, (h % np.uint64(salts)).astype(np.int64), np.int64(0)))

    def replicate_right(b: pd.DataFrame) -> pd.DataFrame:
        hot = ray.get(hot_ref)
        is_hot = b[r_on].isin(hot).to_numpy()
        reps = np.where(is_hot, salts, 1)
        out = b.loc[b.index.repeat(reps)].reset_index(drop=True)
        salt = np.concatenate([np.arange(r, dtype=np.int64) for r in reps]
                              ) if len(reps) else np.array([], np.int64)
        return out.assign(__salt=salt)

    lsalted = left.map_batches(salt_left, batch_format="pandas")
    rsalted = right.map_batches(replicate_right, batch_format="pandas")
    joined = lsalted.join(
        rsalted, join_type="inner", num_partitions=num_partitions,
        on=(on, "__salt"), right_on=(r_on, "__salt"))
    # output projection computed STATICALLY from the input schemas
    # (parquet metadata): joined.schema() on a lazy join would execute
    # the whole shuffle once just to learn column names, then the
    # consumer would execute it again — a silent 2x.
    lcols = list(left.schema().names)
    rcols = [c for c in right.schema().names if c != r_on]
    clash = set(lcols) & set(rcols)
    if clash:
        raise ValueError(
            f"non-key columns must not collide across sides: {sorted(clash)}")
    return joined.select_columns(lcols + rcols)


def band_join(
    left: Dataset,
    right: Dataset,
    left_val: str,
    right_val: str,
    *,
    eps: int,
    left_cols: list | None = None,
    right_cols: list | None = None,
    num_buckets: int | None = None,
) -> Dataset:
    """BIG-BIG band (range) join: all ``(l, r)`` pairs with
    ``|left_val − right_val| <= eps`` — the distributed sibling of
    :func:`broadcast_range_join` for when NEITHER side fits a
    broadcast (events x orders price matching, near-timestamp joins
    across two full logs).

    Frozen integer semantics: both value columns and ``eps`` are int64;
    every qualifying pair is emitted EXACTLY ONCE.

    Scale shape (the classic band-bucket replication): left rows land
    in bucket ``v // eps`` once; right rows are replicated into their
    bucket and both neighbors (3x — the band can only reach one bucket
    away); pairs form inside the LEFT row's bucket only, so no
    cross-bucket dedup pass is needed.  ONE bucketed cogroup of narrow
    projections; band width ``eps`` is also the bucket width, so skew
    follows the value distribution — pick ``eps`` (or pre-scale the
    values) so no single band holds a hot key's worth of rows.

    ``left_cols`` / ``right_cols`` payload columns must be int64 (the
    union's cross-side sentinel is -1; string payloads would make the
    two branches' Arrow schemas disagree — project ids, join wide
    attributes back afterwards)."""
    from pdf_extract_ray.stages.agg import bucketed_group_apply

    if eps < 1:
        raise ValueError("eps must be >= 1")
    left_cols = list(left_cols or [])
    right_cols = list(right_cols or [])

    def l_rows(b: pd.DataFrame) -> pd.DataFrame:
        v = b[left_val].to_numpy(np.int64)
        f = pd.DataFrame({"band": v // np.int64(eps), "__v": v,
                          "side": np.int8(0)})
        for c in left_cols:
            f["l_" + c] = b[c].to_numpy(np.int64)
        for c in right_cols:
            f["r_" + c] = np.int64(-1)
        return f

    def r_rows(b: pd.DataFrame) -> pd.DataFrame:
        w = b[right_val].to_numpy(np.int64)
        base = w // np.int64(eps)
        parts = []
        for off in (-1, 0, 1):
            f = pd.DataFrame({"band": base + off, "__v": w,
                              "side": np.int8(1)})
            for c in left_cols:
                f["l_" + c] = np.int64(-1)
            for c in right_cols:
                f["r_" + c] = b[c].to_numpy(np.int64)
            parts.append(f)
        return pd.concat(parts, ignore_index=True)

    def body(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for band, grp in g.groupby("band", sort=False):
            lft = grp[grp["side"] == 0]
            rgt = grp[grp["side"] == 1]
            if not len(lft) or not len(rgt):
                continue
            lv = lft["__v"].to_numpy(np.int64)
            rv = rgt["__v"].to_numpy(np.int64)
            li, ri = np.nonzero(
                np.abs(lv[:, None] - rv[None, :]) <= eps)
            if not len(li):
                continue
            out = pd.DataFrame({
                "l_" + left_val: lv[li], "r_" + right_val: rv[ri]})
            for c in left_cols:
                out["l_" + c] = lft["l_" + c].to_numpy()[li]
            for c in right_cols:
                out["r_" + c] = rgt["r_" + c].to_numpy()[ri]
            outs.append(out)
        if not outs:
            cols = (["l_" + left_val, "r_" + right_val]
                    + ["l_" + c for c in left_cols]
                    + ["r_" + c for c in right_cols])
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in cols})
        return pd.concat(outs, ignore_index=True)

    unioned = left.map_batches(l_rows, batch_format="pandas").union(
        right.map_batches(r_rows, batch_format="pandas"))
    return bucketed_group_apply(unioned, ["band"], body,
                                num_buckets=num_buckets)


def band_join_oracle_sql(
    left_sql: str,
    right_sql: str,
    left_val: str,
    right_val: str,
    *,
    eps: int,
    left_cols: list | None = None,
    right_cols: list | None = None,
) -> str:
    """DuckDB mirror of :func:`band_join`."""
    lsel = [f"l.{left_val} AS l_{left_val}"] + [
        f"l.{c} AS l_{c}" for c in (left_cols or [])]
    rsel = [f"r.{right_val} AS r_{right_val}"] + [
        f"r.{c} AS r_{c}" for c in (right_cols or [])]
    cols = ", ".join(lsel[:1] + rsel[:1] + lsel[1:] + rsel[1:])
    return f"""
SELECT {cols}
FROM ({left_sql}) l JOIN ({right_sql}) r
ON abs(l.{left_val} - r.{right_val}) <= {int(eps)}
"""
