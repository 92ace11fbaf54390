"""Composed quality pipeline (pipelines/quality.py): clean -> analyze ->
filter -> dedup -> canonical projection as one flow, mirroring
metadata_generator.process_and_filter_files + add_metadata's ordering."""

import pandas as pd
import pytest

from pdf_extract_ray.pipelines.quality import _STAT_COLS, _STATUS_COLS, quality_pairs


@pytest.fixture(scope="module")
def result(ray_session):
    import ray.data as rd

    rows = [
        # normal valid pair
        {"doc_id": 0, "kr_text": "난민 법원 판결이 항소되었다.",
         "en_text": "The court decision was appealed."},
        # duplicate normalized pair, higher id -> must be dropped by dedup
        {"doc_id": 7, "kr_text": "  난민 법원 판결이 항소되었다. ",
         "en_text": "The court decision was appealed."},
        # numbers-only BOTH sides -> filtered
        {"doc_id": 1, "kr_text": "123, 456.", "en_text": "789 012"},
        # single symbol on one side -> filtered
        {"doc_id": 2, "kr_text": "난민 신청 절차.", "en_text": "+"},
        # numbers-only on ONE side only -> kept
        {"doc_id": 3, "kr_text": "123 456", "en_text": "one two three"},
        # english-only korean side -> kept, flagged no_korean_in_kor
        {"doc_id": 4, "kr_text": "plain english here",
         "en_text": "plain english here"},
    ]
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(3)
    out = quality_pairs(ds)
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_filters_and_dedup(result):
    ids = set(result["doc_id"])
    assert 1 not in ids and 2 not in ids       # content-filtered
    assert 0 in ids and 7 not in ids           # dedup keeps min doc_id
    assert 3 in ids and 4 in ids


def test_canonical_column_order(result):
    cols = list(result.columns)
    assert cols[:3] == ["doc_id", "kr_text", "en_text"]        # original
    assert cols[3:10] == _STAT_COLS                            # stats
    assert cols[10:15] == _STATUS_COLS                         # statuses
    assert cols[-4:] == ["kr_text_cleaned", "en_text_cleaned",
                         "kr_text_normalized", "en_text_normalized"]


def test_analyzer_and_stats_values(result):
    r4 = result[result["doc_id"] == 4].iloc[0]
    assert r4["only_eng_korean_sentence"] == "all_match"
    r0 = result[result["doc_id"] == 0].iloc[0]
    assert r0["word_count_kr"] == 4
    assert r0["kr_text_cleaned"] == "난민 법원 판결이 항소되었다."


def test_quality_run_resume_skips_done_partitions(ray_session, tmp_path):
    """quality_run mirrors extract_run's manifest resume: a second run over
    the same inputs reprocesses nothing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_extract_ray.pipelines.runner import quality_run

    src = tmp_path / "pairs"
    src.mkdir()
    for shard in range(4):
        rows = [{"doc_id": shard * 100 + i,
                 "kr_text": f"문서 {shard} 문장 {i}.",
                 "en_text": f"document {shard} sentence {i}."}
                for i in range(20)]
        pq.write_table(pa.Table.from_pylist(rows), src / f"s{shard}.parquet")

    out = tmp_path / "out"
    r1 = quality_run(str(src / "*.parquet"), str(out), files_per_partition=2)
    assert r1 == {"completed": 2, "skipped": 0, "failed": 0}
    r2 = quality_run(str(src / "*.parquet"), str(out), files_per_partition=2)
    assert r2 == {"completed": 0, "skipped": 2, "failed": 0}

    import ray.data as rd

    got = rd.read_parquet(str(out)).to_pandas()
    assert len(got) == 80
    assert "only_eng_korean_sentence" in got.columns


def test_no_dedup_mode_keeps_duplicates(ray_session):
    import ray.data as rd

    rows = [{"doc_id": i, "kr_text": "같은 문장.", "en_text": "same sentence."}
            for i in range(5)]
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(2)
    out = quality_pairs(ds, dedup=False).to_pandas()
    assert len(out) == 5


def test_global_dedup_removes_cross_partition_duplicates(ray_session, tmp_path):
    """Per-partition dedup cannot see a duplicate pair split across
    partitions; global_dedup=True adds the corpus-wide pass (min doc_id
    wins) into out/global, manifest-recorded and skipped on resume."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from pdf_extract_ray.pipelines.runner import quality_run

    src = tmp_path / "pairs"
    src.mkdir()
    for shard in range(4):
        rows = [{"doc_id": shard * 100 + i,
                 "kr_text": f"문서 {shard} 문장 {i}.",
                 "en_text": f"document {shard} sentence {i}."}
                for i in range(10)]
        # the SAME pair in every shard — partitions are (s0,s1) and
        # (s2,s3), so per-partition dedup keeps 2 copies of it
        rows.append({"doc_id": shard * 100 + 99,
                     "kr_text": "중복 문장.", "en_text": "duplicated sentence."})
        pq.write_table(pa.Table.from_pylist(rows), src / f"s{shard}.parquet")

    out = tmp_path / "out"
    r1 = quality_run(str(src / "*.parquet"), str(out),
                     files_per_partition=2, global_dedup=True)
    assert r1["completed"] == 2 and r1["global"] == "completed"

    parts = rd.read_parquet(
        [str(p) for p in sorted(out.glob("part=*/*.parquet"))]).to_pandas()
    dups_in_parts = parts[parts["kr_text"] == "중복 문장."]
    assert len(dups_in_parts) == 2  # one per partition: the gap the flag closes

    final = rd.read_parquet(str(out / "global")).to_pandas()
    dup_rows = final[final["kr_text"] == "중복 문장."]
    assert len(dup_rows) == 1
    assert dup_rows["doc_id"].iloc[0] == 99  # min order key wins
    assert len(final) == 41  # 4x10 distinct + 1 surviving duplicate

    # resume: nothing recomputed, global pass skipped (same partitions)
    r2 = quality_run(str(src / "*.parquet"), str(out),
                     files_per_partition=2, global_dedup=True)
    assert r2["skipped"] == 2 and r2["global"] == "skipped"
