"""Resumable SCD-2 builder (pipelines/history.py): output equality vs
the stage-level url_version_history, crash resume redoing only the
missing bucket, run-complete short-circuit, and md5/fast agreement on
version structure."""

import glob

import pandas as pd
import pytest

from pdf_extract_ray.pipelines.history import history_run


def _ts(h):
    return pd.Timestamp("2024-01-01") + pd.Timedelta(hours=h)


def _write_archive(src, n_docs=40, files=2, ks=(0, 1, 2)):
    src.mkdir(parents=True, exist_ok=True)
    rows = []
    for d in range(n_docs):
        for k in ks:
            txt = f"doc{d}" + (" v2" if d % 3 == 0 and k >= 1 else "") \
                + (" v3" if d % 4 == 0 and k >= 2 else "")
            rows.append({"url": f"http://h{d % 7}.example/p/{d}",
                         "warc_ts": _ts(d + k * 1000), "text": txt})
    df = pd.DataFrame(rows)
    per = (len(df) + files - 1) // files
    for i in range(files):
        df.iloc[i * per:(i + 1) * per].to_parquet(
            src / f"snap_{i}.parquet", index=False)
    return df


def _read_history(out):
    import ray.data as rd

    files = sorted(glob.glob(f"{out}/bucket=*/*.parquet"))
    return (rd.read_parquet(files, partitioning=None).to_pandas()
            .sort_values(["url", "version_no"]).reset_index(drop=True))


def test_history_run_equals_stage_build(ray_session, tmp_path):
    import ray.data as rd

    from pdf_extract_ray.stages.history import url_version_history

    src = tmp_path / "archive"
    df = _write_archive(src)
    out = str(tmp_path / "out")
    stats = history_run(str(src / "*.parquet"), out, method="md5",
                        n_buckets=4, files_per_partition=1,
                        min_rows_per_file=1_000)
    assert stats["failed"] == 0 and stats["buckets_completed"] == 4
    got = _read_history(out)
    exp = (url_version_history(
        rd.from_pandas(df.rename(columns={"warc_ts": "ts"}))
        .repartition(3), num_buckets=2).to_pandas()
        .sort_values(["url", "version_no"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp)


def test_history_run_resume_skips_everything(ray_session, tmp_path):
    src = tmp_path / "archive"
    _write_archive(src, n_docs=20)
    out = str(tmp_path / "out")
    history_run(str(src / "*.parquet"), out, n_buckets=3,
                files_per_partition=1, min_rows_per_file=1_000)
    stats = history_run(str(src / "*.parquet"), out, n_buckets=3,
                        files_per_partition=1, min_rows_per_file=1_000)
    assert stats["completed"] == 0 and stats["skipped"] == 2
    assert stats["buckets_skipped"] == 3
    assert stats["buckets_completed"] == 0


def test_history_run_interrupted_resumes_identically(ray_session, tmp_path):
    src = tmp_path / "archive"
    _write_archive(src, n_docs=30)
    ref_out = str(tmp_path / "ref")
    history_run(str(src / "*.parquet"), ref_out, n_buckets=3,
                files_per_partition=1, min_rows_per_file=1_000)
    ref = _read_history(ref_out)

    out = str(tmp_path / "out")
    import pdf_extract_ray.state.manifest as mm

    calls = {"n": 0}
    orig = mm.Manifest.append

    def exploding(self, result):
        orig(self, result)
        calls["n"] += 1
        if calls["n"] == 3:  # 2 tag partitions + 1 bucket, then crash
            raise KeyboardInterrupt

    mm.Manifest.append = exploding
    try:
        with pytest.raises(KeyboardInterrupt):
            history_run(str(src / "*.parquet"), out, n_buckets=3,
                        files_per_partition=1, min_rows_per_file=1_000)
    finally:
        mm.Manifest.append = orig
    stats = history_run(str(src / "*.parquet"), out, n_buckets=3,
                        files_per_partition=1, min_rows_per_file=1_000)
    assert stats["skipped"] == 2  # tag pass fully manifested
    assert stats["buckets_skipped"] == 1  # the bucket that finished
    assert stats["buckets_completed"] == 2
    pd.testing.assert_frame_equal(_read_history(out), ref)


def test_history_run_md5_fast_same_structure(ray_session, tmp_path):
    src = tmp_path / "archive"
    _write_archive(src, n_docs=15)
    outs = {}
    for method in ("md5", "fast"):
        out = str(tmp_path / f"out_{method}")
        history_run(str(src / "*.parquet"), out, method=method,
                    n_buckets=2, files_per_partition=1,
                    min_rows_per_file=1_000)
        outs[method] = _read_history(out)
    cols = ["url", "version_no", "valid_from", "valid_to", "is_current"]
    pd.testing.assert_frame_equal(outs["md5"][cols], outs["fast"][cols])
