"""Checkpoint manifest: durable per-partition lineage + metrics + resume.

Replaces the reference's SQLite session/batch state machine
(reference: database.py:59-134,177-255; session_manager.py:17-351 — statuses
``pending -> ready -> in_progress -> completed/failed``, resume via
``resume_session_id``) with the batch-engine equivalent: a PARTITION is the
unit of durable progress, Ray task retries handle everything below it.

Design (SURVEY.md §4.2):
* a run processes a list of partitions (one partition = one group of input
  files); each partition streams through the full pipeline and writes to
  ``out_dir/part=<id>/`` ATOMICALLY (tmp dir -> rename), then a manifest
  row is appended (JSONL, append-only, fsync'd);
* resume = anti-join: partitions whose manifest row says ``completed`` are
  skipped; a partially-written tmp dir from a crash is discarded;
* lineage per row: input files, row count, config/stage versions, wall
  time, rows/s — the analogue of ``extraction_stats`` /
  ``batch_summary_stats`` (database.py:96-125);
* idempotent by construction: re-running a completed partition is a no-op
  (fixes the reference's double-insert wart, SURVEY.md §4.1).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Callable, Sequence


@dataclass
class PartitionResult:
    partition_id: int
    status: str            # completed | failed
    input_files: list[str]
    n_rows: int
    wall_s: float
    rows_per_s: float
    stage_versions: dict
    error: str | None = None
    finished_at: str = ""


class Manifest:
    """Append-only JSONL manifest of partition completions."""

    def __init__(self, path: str):
        self.path = path

    def read(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        rows = []
        with open(self.path) as f:
            for line in f:
                line = line.strip()
                if line:
                    try:
                        rows.append(json.loads(line))
                    except json.JSONDecodeError:
                        pass  # torn tail write from a crash: ignore
        return rows

    def completed_ids(self) -> set[int]:
        done = set()
        for r in self.read():
            if r.get("status") == "completed":
                done.add(r["partition_id"])
        return done

    def append(self, result: PartitionResult) -> None:
        row = dict(result.__dict__)
        row["finished_at"] = row["finished_at"] or time.strftime(
            "%Y-%m-%dT%H:%M:%S", time.gmtime()
        )
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")
            f.flush()
            os.fsync(f.fileno())

    # --- reporting (A3/A4/J9 analogues over the manifest) -----------------
    def status_rollup(self) -> dict[str, int]:
        out: dict[str, int] = {}
        for r in self.read():
            out[r["status"]] = out.get(r["status"], 0) + 1
        return out

    def failed(self) -> list[dict]:
        return [r for r in self.read() if r["status"] == "failed"]


def plan_partitions(input_files: Sequence[str], files_per_partition: int = 4) -> list[list[str]]:
    """Deterministic partition plan: sorted files, fixed-size groups.
    Partition id = index in this plan; the plan must be reproducible across
    runs for resume to be sound (same files -> same ids)."""
    files = sorted(input_files)
    return [
        list(files[i : i + files_per_partition])
        for i in range(0, len(files), files_per_partition)
    ]


def run_partitioned(
    input_files: Sequence[str],
    out_dir: str,
    pipeline: Callable[[list[str], str], int],
    *,
    manifest_path: str | None = None,
    files_per_partition: int = 4,
    stage_versions: dict | None = None,
    max_failures: int = 0,
) -> dict:
    """Drive a resumable partitioned run.

    ``pipeline(files, tmp_out_dir) -> n_rows`` runs the (internally
    parallel, streaming) pipeline for one partition and writes its output
    under ``tmp_out_dir``; this driver handles atomicity, the manifest and
    skipping completed partitions.  Partitions run sequentially — each one
    saturates the cluster internally; progress durability is the point of
    the partition boundary, not extra parallelism.
    """
    manifest = Manifest(manifest_path or os.path.join(out_dir, "_manifest.jsonl"))
    versions = stage_versions or {}
    plan = plan_partitions(input_files, files_per_partition)
    # skip a completed partition only if it was produced by THIS pipeline
    # configuration — a partition completed under different stage_versions
    # (changed flags, rules, engine) is stale output and must be redone,
    # never silently kept (latest manifest row per partition wins)
    done: dict[int, dict] = {}
    for r in manifest.read():
        if r.get("status") == "completed":
            done[r["partition_id"]] = r.get("stage_versions") or {}
        elif r.get("status") == "failed":
            # a failed re-run (e.g. under new versions) destroyed the old
            # part dir before failing — the earlier completion is void
            done.pop(r.get("partition_id"), None)
    os.makedirs(out_dir, exist_ok=True)

    stats = {"completed": 0, "skipped": 0, "failed": 0}
    for pid, files in enumerate(plan):
        final_dir = os.path.join(out_dir, f"part={pid}")
        if done.get(pid) == versions:
            stats["skipped"] += 1
            continue
        tmp_dir = os.path.join(out_dir, f".tmp_part={pid}")
        shutil.rmtree(tmp_dir, ignore_errors=True)   # discard crashed partials
        shutil.rmtree(final_dir, ignore_errors=True)  # non-manifested output is invalid
        t0 = time.time()
        try:
            n_rows = pipeline(files, tmp_dir)
            # a zero-row partition is legitimate (e.g. every page in it
            # was robots-filtered) — Ray's empty write_parquet creates
            # no directory, but the atomic rename + manifest row must
            # still happen so resume skips it
            os.makedirs(tmp_dir, exist_ok=True)
            os.replace(tmp_dir, final_dir)
            wall = time.time() - t0
            manifest.append(PartitionResult(
                partition_id=pid, status="completed", input_files=files,
                n_rows=n_rows, wall_s=round(wall, 3),
                rows_per_s=round(n_rows / wall, 1) if wall > 0 else 0.0,
                stage_versions=versions,
            ))
            stats["completed"] += 1
        except Exception as e:  # partition-level failure isolation
            shutil.rmtree(tmp_dir, ignore_errors=True)
            manifest.append(PartitionResult(
                partition_id=pid, status="failed", input_files=files,
                n_rows=0, wall_s=round(time.time() - t0, 3), rows_per_s=0.0,
                stage_versions=versions, error=f"{type(e).__name__}: {e}",
            ))
            stats["failed"] += 1
            if stats["failed"] > max_failures:
                raise
    return stats
