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
    for p in glob.glob(os.path.join(out_dir, "*.parquet")):
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
