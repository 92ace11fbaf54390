"""Resumable SCD-2 history builder — the production entry point for
``stages.history`` over a crawl archive on disk: build the url version
table from every snapshot parquet, checkpointed so a killed run resumes
mid-dataset (the north rule's resumability requirement applied to the
archive pass).

Two manifest-driven phases (the ``shards_run`` shape — each byte of the
archive is read once, and only narrow rows are ever re-read):

1. **Tag pass** (narrow, input-partitioned, ``run_partitioned``): each
   input partition streams through one ``map_batches`` that hashes the
   content — page bodies are REDUCED to ``(url, ts, 32-hex hash,
   bucket)`` right here and never travel further — and writes
   ``_tag/part=<pid>/bucket=<b>/`` via parquet ``partition_cols``.
   Resume skips finished input partitions.
2. **Collapse pass** (per url-hash bucket, its own manifest rows):
   bucket ``b`` reads ONLY ``_tag/part=*/bucket=<b>/`` (directory
   pruning), runs the shared vectorized collapse
   (:func:`~pdf_extract_ray.stages.history.collapse_versions` — every
   url's rows are complete within its bucket by construction) and
   writes ``out/bucket=%04d/`` atomically.  Resume skips completed
   buckets; a crashed bucket redoes only itself.

``n_buckets`` bounds the per-bucket collapse memory (archive-rows /
n_buckets narrow rows); size it so one bucket fits a worker
comfortably.  ``method="fast"`` (default) uses the vectorized numpy
content hash for the full-archive tag pass; ``method="md5"`` matches
the SQL-parity hash of the ``scd2_url_versions`` driver query.
"""

from __future__ import annotations

import glob
import hashlib
import os
import shutil
import time

import numpy as np
import pandas as pd

from pdf_extract_ray import __version__
from pdf_extract_ray.stages.agg import _hash_numpy_col

BUCKET_COL = "bucket"


def _tag_batch(
    batch: pd.DataFrame,
    url_col: str,
    ts_col: str,
    content_col: str,
    method: str,
    n_buckets: int,
) -> pd.DataFrame:
    from pdf_extract_ray.stages.crawldiff import _fast_hex, _md5_hex

    hash_fn = _md5_hex if method == "md5" else _fast_hex
    h = _hash_numpy_col(batch[url_col].to_numpy())
    return pd.DataFrame({
        "url": batch[url_col].to_numpy(),
        "ts": batch[ts_col].to_numpy(),
        "content_hash": hash_fn(batch[content_col]).to_numpy(),
        BUCKET_COL: (h % np.uint64(n_buckets)).astype(np.int64),
    })


def history_run(
    input_glob: str,
    out_dir: str,
    *,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    content_col: str = "text",
    method: str = "fast",
    n_buckets: int = 64,
    files_per_partition: int = 8,
    min_rows_per_file: int = 5_000,
    keep_tag_dir: bool = False,
) -> dict:
    """Run (or resume) the two-phase SCD-2 build.  Output:
    ``out_dir/bucket=%04d/*.parquet`` (schema: url, version_no,
    content_hash, valid_from, valid_to, is_current) +
    ``out_dir/_manifest.jsonl``."""
    import ray.data as rd

    from pdf_extract_ray.pipelines.runner import _rows_written
    from pdf_extract_ray.stages.history import collapse_versions
    from pdf_extract_ray.state.manifest import (
        Manifest,
        PartitionResult,
        run_partitioned,
    )

    if method not in ("md5", "fast"):
        raise ValueError(f"method must be 'md5' or 'fast', got {method!r}")
    files = sorted(glob.glob(input_glob))
    if not files:
        raise FileNotFoundError(f"no input files match {input_glob}")

    tag_dir = os.path.join(out_dir, "_tag")
    versions = {"engine": __version__, "pipeline": "history",
                "url_col": url_col, "ts_col": ts_col,
                "content_col": content_col, "method": method,
                "n_buckets": str(n_buckets)}

    manifest = Manifest(os.path.join(out_dir, "_manifest.jsonl"))
    run_versions = dict(versions, phase="complete",
                        files_digest=hashlib.md5("\n".join(
                            os.path.basename(f) for f in files).encode()
                        ).hexdigest())
    n_tag_parts = (len(files) + files_per_partition - 1) \
        // files_per_partition
    for row in manifest.read():
        if (row.get("partition_id") == -2
                and row.get("status") == "completed"
                and row.get("stage_versions") == run_versions):
            return {"completed": 0, "skipped": n_tag_parts, "failed": 0,
                    "buckets_completed": 0, "buckets_skipped": n_buckets}

    def tag_pipeline(part_files: list[str], tmp_out: str) -> int:
        ds = rd.read_parquet(part_files)
        ds.map_batches(
            lambda b: _tag_batch(b, url_col, ts_col, content_col,
                                 method, n_buckets),
            batch_format="pandas",
        ).write_parquet(tmp_out, partition_cols=[BUCKET_COL],
                        min_rows_per_file=min_rows_per_file)
        return _rows_written(tmp_out)

    stats = run_partitioned(
        files, tag_dir, tag_pipeline,
        files_per_partition=files_per_partition,
        stage_versions=dict(versions, phase="tag"),
    )

    merge_versions = dict(versions, phase="collapse",
                          n_tag_partitions=str(stats["completed"]
                                               + stats["skipped"]))
    done = {r["partition_id"] for r in manifest.read()
            if r.get("status") == "completed"
            and r.get("stage_versions") == merge_versions}
    stats["buckets_completed"] = 0
    stats["buckets_skipped"] = 0
    for b in range(n_buckets):
        final_dir = os.path.join(out_dir, f"bucket={b:04d}")
        if b in done:
            stats["buckets_skipped"] += 1
            continue
        bucket_files = sorted(glob.glob(os.path.join(
            tag_dir, "part=*", f"{BUCKET_COL}={b}", "*.parquet")))
        tmp_dir = os.path.join(out_dir, f".tmp_bucket={b:04d}")
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(final_dir, ignore_errors=True)
        t0 = time.time()
        if bucket_files:
            # partitioning=None: hive path keys are plumbing, not data.
            # repartition(1) + batch_size=None hand the WHOLE bucket to
            # one collapse call — every url's rows must arrive together,
            # and the bucket is bounded by archive-rows / n_buckets
            rd.read_parquet(bucket_files, partitioning=None) \
                .repartition(1).map_batches(
                    collapse_versions, batch_format="pandas",
                    batch_size=None,
                ).write_parquet(tmp_dir, min_rows_per_file=min_rows_per_file)
        os.makedirs(tmp_dir, exist_ok=True)  # empty bucket still completes
        n_rows = _rows_written(tmp_dir)
        os.replace(tmp_dir, final_dir)
        wall = time.time() - t0
        manifest.append(PartitionResult(
            partition_id=b, status="completed",
            input_files=[os.path.relpath(p, out_dir) for p in
                         bucket_files[:4]] + (
                             [f"... {len(bucket_files)} files"]
                             if len(bucket_files) > 4 else []),
            n_rows=n_rows, wall_s=round(wall, 3),
            rows_per_s=round(n_rows / wall, 1) if wall > 0 else 0.0,
            stage_versions=merge_versions,
        ))
        stats["buckets_completed"] += 1
    if stats["buckets_skipped"] + stats["buckets_completed"] == n_buckets:
        if not keep_tag_dir:
            shutil.rmtree(tag_dir, ignore_errors=True)
        manifest.append(PartitionResult(
            partition_id=-2, status="completed",
            input_files=[os.path.basename(files[0]),
                         f"... {len(files)} files"],
            n_rows=0, wall_s=0.0, rows_per_s=0.0,
            stage_versions=run_versions,
        ))
    return stats
