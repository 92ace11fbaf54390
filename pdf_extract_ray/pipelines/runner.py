"""Resumable corpus extraction runs: manifest-driven partitions around the
flagship pipeline (reference lifecycle analogue: SURVEY.md §3.4).
"""

from __future__ import annotations

import glob
import os

from pdf_extract_ray import __version__
from pdf_extract_ray.config import DEFAULT_CONFIG, ExtractConfig
from pdf_extract_ray.pipelines.extract import extract_pages_fused, extract_pages_staged
from pdf_extract_ray.state.manifest import Manifest, run_partitioned


def _rows_written(out_dir: str) -> int:
    import pyarrow.parquet as pq

    total = 0
    # "**" also counts partition_cols layouts (e.g. tier=<label>/ subdirs)
    for p in glob.glob(os.path.join(out_dir, "**", "*.parquet"),
                       recursive=True):
        total += pq.ParquetFile(p).metadata.num_rows
    return total


def extract_run(
    input_glob: str,
    out_dir: str,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    *,
    plan: str = "fused",
    files_per_partition: int = 8,
    min_rows_per_file: int = 5_000,
) -> dict:
    """Run (or resume) a partitioned extraction over parquet shards.

    Output layout: ``out_dir/part=<id>/*.parquet`` + ``out_dir/_manifest.jsonl``.
    A re-run after interruption skips manifested partitions (SURVEY.md §5.2.5).
    Ray must already be initialised by the caller.
    """
    import ray.data as rd

    extract = extract_pages_fused if plan == "fused" else extract_pages_staged

    def pipeline(files: list[str], tmp_out: str) -> int:
        ds = rd.read_parquet(files)
        extract(ds, cfg).write_parquet(tmp_out, min_rows_per_file=min_rows_per_file)
        return _rows_written(tmp_out)

    files = sorted(glob.glob(input_glob))
    if not files:
        raise FileNotFoundError(f"no input files match {input_glob}")
    return run_partitioned(
        files,
        out_dir,
        pipeline,
        files_per_partition=files_per_partition,
        stage_versions={"config": cfg.config_hash(), "engine": __version__,
                        "plan": plan},
    )


def quality_run(
    input_glob: str,
    out_dir: str,
    *,
    kor_col: str = "kr_text",
    eng_col: str = "en_text",
    order_col: str = "doc_id",
    dedup: bool = True,
    global_dedup: bool = False,
    files_per_partition: int = 8,
    min_rows_per_file: int = 5_000,
) -> dict:
    """Run (or resume) the composed quality pipeline
    (pipelines/quality.quality_pairs: clean -> analyze -> filter -> dedup
    -> canonical projection) over parquet shards of sentence pairs, with
    the same manifest-driven partition resume as ``extract_run``
    (reference lifecycle: metadata_generator.process_and_filter_files'
    per-file loop, re-expressed as resumable partitions).

    With ``dedup=True`` the exact dedup runs WITHIN each partition (the
    reference deduplicates per input file the same way,
    metadata_generator.py:618-622).  ``global_dedup=True`` adds a final
    CROSS-PARTITION exact dedup pass over the combined per-partition
    output into ``out_dir/global/`` — one more bucketed shuffle keyed by
    the normalized pair, keeping the min-``order_col`` row corpus-wide.
    The global pass is manifest-recorded (partition_id = -1) and
    resume-safe: it re-runs iff the per-partition phase produced new
    partitions since it last completed."""
    import ray.data as rd

    from pdf_extract_ray.pipelines.quality import quality_pairs

    def pipeline(files: list[str], tmp_out: str) -> int:
        ds = rd.read_parquet(files)
        quality_pairs(ds, kor_col=kor_col, eng_col=eng_col,
                      order_col=order_col, dedup=dedup).write_parquet(
            tmp_out, min_rows_per_file=min_rows_per_file)
        return _rows_written(tmp_out)

    files = sorted(glob.glob(input_glob))
    if not files:
        raise FileNotFoundError(f"no input files match {input_glob}")
    stats = run_partitioned(
        files,
        out_dir,
        pipeline,
        files_per_partition=files_per_partition,
        stage_versions={"engine": __version__, "pipeline": "quality",
                        "dedup": str(dedup)},
    )
    if global_dedup:
        stats["global"] = _quality_global_dedup(
            out_dir, kor_col=kor_col, eng_col=eng_col, order_col=order_col,
            min_rows_per_file=min_rows_per_file)
    return stats


def _quality_global_dedup(out_dir: str, *, kor_col: str, eng_col: str,
                          order_col: str, min_rows_per_file: int) -> str:
    """Cross-partition exact dedup of a completed ``quality_run`` output.
    Reads every ``part=*/`` directory, keeps the min-``order_col`` row per
    normalized pair, writes atomically to ``out_dir/global/``.  Recorded
    in the manifest as partition_id -1 with the covered partition count;
    a resume with the same partition count skips it."""
    import shutil
    import time as _time

    import pandas as pd
    import ray.data as rd

    from pdf_extract_ray.stages.agg import bucketed_group_apply
    from pdf_extract_ray.state.manifest import Manifest, PartitionResult

    manifest = Manifest(os.path.join(out_dir, "_manifest.jsonl"))
    part_dirs = sorted(glob.glob(os.path.join(out_dir, "part=*")))
    versions = {"engine": __version__, "stage": "quality_global_dedup",
                "n_partitions": len(part_dirs)}
    for row in manifest.read():
        if (row.get("partition_id") == -1 and row.get("status") == "completed"
                and row.get("stage_versions") == versions):
            return "skipped"  # already deduped over exactly these partitions

    kn, en = f"{kor_col}_normalized", f"{eng_col}_normalized"

    def keep_first(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.sort_values(order_col, kind="mergesort") \
            .drop_duplicates(subset=[kn, en], keep="first")

    tmp_dir = os.path.join(out_dir, ".tmp_global")
    final_dir = os.path.join(out_dir, "global")
    shutil.rmtree(tmp_dir, ignore_errors=True)
    shutil.rmtree(final_dir, ignore_errors=True)
    t0 = _time.time()
    # read_parquet rejects a LIST of directories (ray 2.49): glob files
    part_files = sorted(glob.glob(os.path.join(out_dir, "part=*", "*.parquet")))
    if part_files:
        ds = rd.read_parquet(part_files)
        bucketed_group_apply(ds, [kn, en], keep_first, pre_batch_size=4096) \
            .write_parquet(tmp_dir, min_rows_per_file=min_rows_per_file)
    # all partitions may legitimately be empty (zero-row part dirs hold no
    # parquet files): still complete atomically with an empty global dir
    os.makedirs(tmp_dir, exist_ok=True)
    n_rows = _rows_written(tmp_dir)
    os.replace(tmp_dir, final_dir)
    wall = _time.time() - t0
    manifest.append(PartitionResult(
        partition_id=-1, status="completed",
        input_files=[os.path.basename(p) for p in part_dirs],
        n_rows=n_rows, wall_s=round(wall, 3),
        rows_per_s=round(n_rows / wall, 1) if wall > 0 else 0.0,
        stage_versions=versions,
    ))
    return "completed"
