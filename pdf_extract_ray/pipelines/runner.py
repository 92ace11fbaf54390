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


def quality_run(
    input_glob: str,
    out_dir: str,
    *,
    kor_col: str = "kr_text",
    eng_col: str = "en_text",
    order_col: str = "doc_id",
    dedup: bool = True,
    files_per_partition: int = 8,
    min_rows_per_file: int = 5_000,
) -> dict:
    """Run (or resume) the composed quality pipeline
    (pipelines/quality.quality_pairs: clean -> analyze -> filter -> dedup
    -> canonical projection) over parquet shards of sentence pairs, with
    the same manifest-driven partition resume as ``extract_run``
    (reference lifecycle: metadata_generator.process_and_filter_files'
    per-file loop, re-expressed as resumable partitions).

    NOTE: with ``dedup=True`` the exact dedup runs WITHIN each partition
    (the reference deduplicates per input file the same way,
    metadata_generator.py:618-622); run a corpus-wide ``dedup_exact`` over
    the combined output for global dedup."""
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
    return run_partitioned(
        files,
        out_dir,
        pipeline,
        files_per_partition=files_per_partition,
        stage_versions={"engine": __version__, "pipeline": "quality",
                        "dedup": str(dedup)},
    )
