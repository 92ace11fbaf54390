"""Generation-store primitives shared by the persistent incremental
stores (MinHash signature store, crawl content-hash store): a store is
``store_dir/meta.json`` (frozen params — increments with different
params cannot be compared and are rejected loudly) plus
``store_dir/gen=NNNNNNNN/*.parquet`` directories, one per ingested
increment, each committed atomically (tmp dir -> rename)."""

from __future__ import annotations

import glob
import json
import os
import shutil

from ray.data import Dataset

_META = "meta.json"


def read_meta(store_dir: str) -> dict:
    with open(os.path.join(store_dir, _META)) as f:
        return json.load(f)


def init_meta(store_dir: str, meta: dict) -> None:
    """Create (or validate) the store's frozen params."""
    os.makedirs(store_dir, exist_ok=True)
    path = os.path.join(store_dir, _META)
    if os.path.exists(path):
        existing = read_meta(store_dir)
        if existing != meta:
            raise ValueError(
                f"{store_dir} already holds a store with different "
                f"params ({existing}); rows from different param sets "
                "cannot be compared")
        return
    with open(path, "w") as f:
        json.dump(meta, f)


def next_gen(store_dir: str) -> int:
    gens = [int(os.path.basename(p).split("=")[1])
            for p in glob.glob(os.path.join(store_dir, "gen=*"))]
    return max(gens) + 1 if gens else 0


def write_gen(store_dir: str, rows: Dataset, gen: int,
              min_rows_per_file: int) -> int:
    """Atomically commit one generation; returns its row count.  A
    zero-row increment still commits (an empty dir marks it ingested)."""
    import pyarrow.parquet as pq

    tmp = os.path.join(store_dir, f".tmp_gen={gen:08d}")
    final = os.path.join(store_dir, f"gen={gen:08d}")
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(final, ignore_errors=True)
    rows.write_parquet(tmp, min_rows_per_file=min_rows_per_file)
    os.makedirs(tmp, exist_ok=True)
    n = sum(pq.ParquetFile(p).metadata.num_rows
            for p in glob.glob(os.path.join(tmp, "*.parquet")))
    os.replace(tmp, final)
    return n


def read_store(store_dir: str) -> Dataset:
    """All stored rows across generations."""
    import ray.data as rd

    files = sorted(glob.glob(os.path.join(store_dir, "gen=*", "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no generations in {store_dir}")
    return rd.read_parquet(files, partitioning=None)
