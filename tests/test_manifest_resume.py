"""Checkpoint manifest + resume tests (SURVEY.md §5.2.5): no completed
partition reprocessed after interruption; final output equals an
uninterrupted run; failed partitions isolated and reported."""

import json
import os
import shutil

import pytest

from pdf_extract_ray.corpus import write_pages_corpus
from pdf_extract_ray.state.manifest import (
    Manifest,
    PartitionResult,
    plan_partitions,
    run_partitioned,
)


def test_plan_deterministic(tmp_path):
    files = [f"c_{i}.parquet" for i in (3, 1, 2, 0, 4)]
    plan = plan_partitions(files, 2)
    assert plan == [["c_0.parquet", "c_1.parquet"],
                    ["c_2.parquet", "c_3.parquet"], ["c_4.parquet"]]


def test_manifest_append_read_rollup(tmp_path):
    m = Manifest(str(tmp_path / "m.jsonl"))
    m.append(PartitionResult(0, "completed", ["a"], 10, 1.0, 10.0, {"v": "1"}))
    m.append(PartitionResult(1, "failed", ["b"], 0, 0.5, 0.0, {"v": "1"}, error="boom"))
    assert m.completed_ids() == {0}
    assert m.status_rollup() == {"completed": 1, "failed": 1}
    assert m.failed()[0]["error"] == "boom"
    # torn tail line is tolerated
    with open(m.path, "a") as f:
        f.write('{"partition_id": 2, "status": "comp')
    assert m.completed_ids() == {0}


def _tracking_pipeline(log, fail_on=frozenset()):
    def pipeline(files, tmp_out):
        os.makedirs(tmp_out, exist_ok=True)
        key = tuple(os.path.basename(f) for f in files)
        log.append(key)
        if key in fail_on:
            raise RuntimeError("injected failure")
        with open(os.path.join(tmp_out, "out.txt"), "w") as f:
            f.write("\n".join(key))
        return len(files)
    return pipeline


def test_resume_skips_completed(tmp_path):
    files = [f"f{i}" for i in range(6)]
    out = str(tmp_path / "out")

    # first run: partition 2 (files f4,f5) fails
    log1 = []
    with pytest.raises(RuntimeError):
        run_partitioned(files, out, _tracking_pipeline(log1, {("f4", "f5")}),
                        files_per_partition=2)
    assert log1 == [("f0", "f1"), ("f2", "f3"), ("f4", "f5")]

    # second run: only the failed partition re-executes
    log2 = []
    stats = run_partitioned(files, out, _tracking_pipeline(log2),
                            files_per_partition=2)
    assert log2 == [("f4", "f5")]
    assert stats == {"completed": 1, "skipped": 2, "failed": 0}
    for pid in range(3):
        assert os.path.exists(os.path.join(out, f"part={pid}", "out.txt"))

    # third run: everything skipped, nothing re-runs (idempotent)
    log3 = []
    stats = run_partitioned(files, out, _tracking_pipeline(log3),
                            files_per_partition=2)
    assert log3 == []
    assert stats == {"completed": 0, "skipped": 3, "failed": 0}


def test_stage_version_mismatch_reprocesses(tmp_path):
    """ADVICE r3: a partition completed under DIFFERENT stage_versions
    (changed flags/rules) is stale — resume must redo it, not keep it."""
    files = ["f0", "f1", "f2", "f3"]
    out = str(tmp_path / "out")

    log1 = []
    run_partitioned(files, out, _tracking_pipeline(log1),
                    files_per_partition=2, stage_versions={"flag": "a"})
    assert len(log1) == 2

    # same versions -> all skipped
    log2 = []
    stats = run_partitioned(files, out, _tracking_pipeline(log2),
                            files_per_partition=2,
                            stage_versions={"flag": "a"})
    assert log2 == [] and stats["skipped"] == 2

    # changed versions -> everything reprocessed
    log3 = []
    stats = run_partitioned(files, out, _tracking_pipeline(log3),
                            files_per_partition=2,
                            stage_versions={"flag": "b"})
    assert len(log3) == 2 and stats == {"completed": 2, "skipped": 0,
                                        "failed": 0}

    # a failed re-run voids the earlier completion: the destroyed part
    # dir must not be skipped on the next resume
    log4 = []
    with pytest.raises(RuntimeError):
        run_partitioned(files, out, _tracking_pipeline(log4, {("f0", "f1")}),
                        files_per_partition=2, stage_versions={"flag": "c"})
    log5 = []
    stats = run_partitioned(files, out, _tracking_pipeline(log5),
                            files_per_partition=2,
                            stage_versions={"flag": "c"})
    assert ("f0", "f1") in log5
    assert os.path.exists(os.path.join(out, "part=0", "out.txt"))


def test_webtext_flags_recorded_in_versions():
    """ADVICE r3: keep_rejects / respect_robots are part of the webtext
    pipeline's identity — a flag change must invalidate old partitions."""
    import inspect

    from pdf_extract_ray.pipelines import webtext

    src = inspect.getsource(webtext.webtext_run)
    assert '"keep_rejects"' in src and '"respect_robots"' in src


def test_quality_global_dedup_all_empty_partitions(ray_session, tmp_path):
    """ADVICE r3 (medium): when every completed partition wrote zero rows
    (legitimate after the zero-row-partition fix), the --global-dedup
    merge must not crash on read_parquet([]) — it completes with an
    empty global dir, mirrors linkgraph._merge_global."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_extract_ray.pipelines.runner import quality_run

    src = tmp_path / "pairs"
    src.mkdir()
    # numbers-only BOTH sides -> content-filtered, partition writes 0 rows
    pq.write_table(pa.Table.from_pandas(pd.DataFrame(
        [{"doc_id": 0, "kr_text": "123, 456.", "en_text": "789 012"}])),
        src / "p0.parquet")

    out = tmp_path / "out"
    stats = quality_run(str(src / "*.parquet"), str(out), global_dedup=True,
                        files_per_partition=1, min_rows_per_file=1)
    assert stats["completed"] == 1 and stats["global"] == "completed"
    assert (out / "global").is_dir() and (out / "part=0").is_dir()

    stats2 = quality_run(str(src / "*.parquet"), str(out), global_dedup=True,
                         files_per_partition=1, min_rows_per_file=1)
    assert stats2["skipped"] == 1 and stats2["global"] == "skipped"


def test_crashed_tmp_dir_discarded(tmp_path):
    files = ["f0", "f1"]
    out = str(tmp_path / "out")
    os.makedirs(os.path.join(out, ".tmp_part=0"))
    with open(os.path.join(out, ".tmp_part=0", "junk"), "w") as f:
        f.write("partial garbage")
    log = []
    run_partitioned(files, out, _tracking_pipeline(log), files_per_partition=2)
    assert not os.path.exists(os.path.join(out, ".tmp_part=0"))
    assert os.path.exists(os.path.join(out, "part=0", "out.txt"))


def test_extract_run_resume_equals_uninterrupted(ray_session, tmp_path):
    """Interrupted extract_run resumes to output identical to one-shot run."""
    import pandas as pd

    import ray.data as rd

    from pdf_extract_ray.pipelines.runner import extract_run

    corpus = str(tmp_path / "corpus")
    write_pages_corpus(corpus, n_docs=120, seed=7, docs_per_file=30)

    # uninterrupted reference run
    ref_out = str(tmp_path / "ref")
    extract_run(f"{corpus}/*.parquet", ref_out, files_per_partition=1)
    ref = rd.read_parquet(ref_out).to_pandas().sort_values("url").reset_index(drop=True)

    # interrupted run: complete 2 of 4 partitions, then "crash" (simulated by
    # a fresh invocation after manually truncating the plan via max run)
    out = str(tmp_path / "out")
    import pdf_extract_ray.state.manifest as mm

    calls = {"n": 0}
    orig = mm.Manifest.append

    def exploding_append(self, result):
        orig(self, result)
        calls["n"] += 1
        if calls["n"] == 2:
            raise KeyboardInterrupt  # crash right after 2nd partition commits

    mm.Manifest.append = exploding_append
    try:
        with pytest.raises(KeyboardInterrupt):
            extract_run(f"{corpus}/*.parquet", out, files_per_partition=1)
    finally:
        mm.Manifest.append = orig

    stats = extract_run(f"{corpus}/*.parquet", out, files_per_partition=1)
    assert stats["skipped"] == 2 and stats["completed"] == 2
    got = rd.read_parquet(
        sorted(__import__("glob").glob(f"{out}/part=*/*.parquet"))
    ).to_pandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref)

    # manifest carries lineage + metrics
    rows = mm.Manifest(os.path.join(out, "_manifest.jsonl")).read()
    assert all(r["stage_versions"]["plan"] == "fused" for r in rows)
    assert all(r["n_rows"] == 30 for r in rows if r["status"] == "completed")


def test_extract_run_staged_plan(ray_session, tmp_path):
    """The staged (shuffle) plan also runs partitioned+resumable and matches
    the fused plan's output byte-for-byte."""
    import ray.data as rd

    from pdf_extract_ray.pipelines.runner import extract_run

    corpus = str(tmp_path / "corpus")
    write_pages_corpus(corpus, n_docs=60, seed=5, docs_per_file=30)

    fused_out = str(tmp_path / "fused")
    staged_out = str(tmp_path / "staged")
    extract_run(f"{corpus}/*.parquet", fused_out, files_per_partition=1)
    stats = extract_run(f"{corpus}/*.parquet", staged_out, plan="staged",
                        files_per_partition=1)
    assert stats["completed"] == 2

    import glob as g
    fused = rd.read_parquet(sorted(g.glob(f"{fused_out}/part=*/*.parquet"))).to_pandas()
    staged = rd.read_parquet(sorted(g.glob(f"{staged_out}/part=*/*.parquet"))).to_pandas()
    fused = fused.sort_values("url").reset_index(drop=True)
    staged = staged.sort_values("url").reset_index(drop=True)
    assert fused["extracted_text"].tolist() == staged["extracted_text"].tolist()

    # plan recorded in lineage
    import json as j
    rows = [j.loads(l) for l in open(f"{staged_out}/_manifest.jsonl")]
    assert all(r["stage_versions"]["plan"] == "staged" for r in rows)


def test_zero_row_partition_completes(ray_session, tmp_path):
    """A partition that legitimately writes no rows (e.g. every page in
    it robots-filtered) must still land an atomic part dir + manifest
    row — Ray's empty write_parquet creates no directory, which used to
    crash the rename and poison resume."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_extract_ray.pipelines.linkgraph import links_run

    src = tmp_path / "pages"
    src.mkdir()
    pq.write_table(pa.table({
        "url": ["http://a.example/p"],
        "html": ['<meta name="robots" content="nofollow">'
                 '<a href="http://b.example/x">t</a>'],
    }), src / "p0.parquet")

    out = tmp_path / "out"
    stats = links_run(str(src / "*.parquet"), str(out),
                      respect_robots=True, files_per_partition=1,
                      min_rows_per_file=1)
    assert stats == {"completed": 1, "skipped": 0, "failed": 0,
                     "global": "completed"}
    assert (out / "part=0").is_dir()
    # resume: the empty partition is manifested and skips
    stats2 = links_run(str(src / "*.parquet"), str(out),
                       respect_robots=True, files_per_partition=1,
                       min_rows_per_file=1)
    assert stats2["skipped"] == 1 and stats2["global"] == "skipped"
