"""Webtext tier extraction (pipelines/webtext.py): rule semantics, tier
coverage on the test corpus, resumable partitioned run."""

import glob
import os
import shutil

import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from pdf_extract_ray.pipelines.webtext import (
    TIER_RULES,
    tier_batch,
    webtext_run,
    webtext_tiers,
)


def _tier_of(text):
    return tier_batch(pd.DataFrame({"doc_id": [0], "text": [text]}))[
        "tier"].iloc[0]


def test_rule_order_first_match_wins():
    # short AND repetitive -> short wins (rule 1 before rule 2)
    assert _tier_of("spam spam spam spam") == "reject_short"
    # long + repetitive run
    assert _tier_of("the quick brown fox " * 10 + "go go go go") \
        == "reject_repetitive"
    # long, varied, stopword-rich
    assert _tier_of(
        "the cat sat on a mat and looked to the sky for it is that "
        "kind of day when every animal wanders far from home quietly") \
        == "tier1"
    # long, varied, stopword-poor
    words = " ".join(f"word{i}" for i in range(40))
    assert _tier_of(words) == "tier2"


def test_all_tiers_present_on_corpus(ray_session):
    ds = rd.read_parquet("/root/testdata/sf0.01/documents.parquet")
    got = webtext_tiers(ds).to_pandas()
    counts = got["tier"].value_counts().to_dict()
    assert set(counts) >= {"tier1", "tier2", "reject_repetitive",
                           "reject_short"}, counts
    assert sum(counts.values()) == len(got)


def test_webtext_run_partitioned_and_resume(ray_session, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    half = len(docs) // 2
    docs.iloc[:half].to_parquet(f"{src}/a.parquet")
    docs.iloc[half:].to_parquet(f"{src}/b.parquet")
    out = str(tmp_path / "out")

    stats = webtext_run(f"{src}/*.parquet", out, files_per_partition=1,
                        min_rows_per_file=10)
    assert stats["completed"] == 2 and stats["skipped"] == 0
    files = glob.glob(f"{out}/part=*/tier=*/*.parquet")
    assert files, "expected tier-partitioned parquet output"
    tiers_on_disk = {p.split("tier=")[1].split("/")[0] for p in files}
    assert not any(t.startswith("reject_") for t in tiers_on_disk)
    n_rows = sum(pq.ParquetFile(p).metadata.num_rows for p in files)

    # resume: nothing reprocessed
    stats2 = webtext_run(f"{src}/*.parquet", out, files_per_partition=1,
                         min_rows_per_file=10)
    assert stats2["completed"] == 0 and stats2["skipped"] == 2
    files2 = glob.glob(f"{out}/part=*/tier=*/*.parquet")
    assert sum(pq.ParquetFile(p).metadata.num_rows for p in files2) == n_rows

    # keep_rejects writes every tier
    out2 = str(tmp_path / "out2")
    webtext_run(f"{src}/*.parquet", out2, files_per_partition=1,
                keep_rejects=True, min_rows_per_file=10)
    all_tiers = {p.split("tier=")[1].split("/")[0]
                 for p in glob.glob(f"{out2}/part=*/tier=*/*.parquet")}
    assert any(t.startswith("reject_") for t in all_tiers)


def test_rules_frozen():
    # the SQL oracle interpolates these exact constants; changing them
    # must be a deliberate, golden-regenerating decision
    assert TIER_RULES == {
        "min_words": 20, "max_dup_word_frac": 0.65, "max_word_run": 3,
        "max_top_bigram_frac": 0.1, "min_stop_ratio": 0.06}


def test_webtext_run_extract_first_from_pages(ray_session, tmp_path):
    from pdf_extract_ray.corpus import write_pages_corpus

    src = str(tmp_path / "pages")
    write_pages_corpus(src, n_docs=200, seed=3, docs_per_file=100)
    out = str(tmp_path / "out")
    stats = webtext_run(f"{src}/*.parquet", out, extract_first=True,
                        keep_rejects=True, files_per_partition=1,
                        min_rows_per_file=10)
    assert stats["completed"] == 2
    files = glob.glob(f"{out}/part=*/tier=*/*.parquet")
    got = pd.concat(
        [pd.read_parquet(p).assign(
            tier=p.split("tier=")[1].split("/")[0]) for p in files])
    assert len(got) == 200
    # extraction columns travel with the tier signals
    assert {"url", "extracted_text", "status", "tier"} <= set(got.columns)
    assert got["tier"].nunique() >= 2


def test_webtext_run_split_by_lang(ray_session, tmp_path):
    """split_by_lang lays output out per language then per tier, fused
    into the same narrow plan; a flag change invalidates old partitions
    (stage_versions carries it)."""
    import glob

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_extract_ray.pipelines.webtext import webtext_run

    en = ("the report was published and it is available for all who "
          "need it because the results of the study are good and the "
          "method is sound so we can trust it") 
    de = ("der bericht wurde veröffentlicht und ist für alle verfügbar "
          "die ihn brauchen denn die ergebnisse der studie sind gut und "
          "die methode ist solide also können wir ihr vertrauen")
    src = tmp_path / "docs"
    src.mkdir()
    pq.write_table(pa.table({
        "url": [f"http://x.example/{i}" for i in range(8)],
        "text": [en, de] * 4,
    }), src / "d.parquet")

    out = tmp_path / "tiers"
    res = webtext_run(str(src / "*.parquet"), str(out),
                      keep_rejects=True, split_by_lang=True,
                      files_per_partition=1, min_rows_per_file=1)
    assert res["completed"] == 1
    langs = {p.split("=")[-1] for p in
             glob.glob(str(out / "part=*" / "lang_id_v2=*"))}
    assert langs == {"en", "de"}
    assert glob.glob(str(out / "part=*" / "lang_id_v2=en" / "tier=*"
                         / "*.parquet"))
    got = pq.read_table(str(out / "part=0")).to_pandas()
    assert len(got) == 8 and "lang_id_v2" in got.columns

    # resume with the same flag: no-op; changed flag: reprocess
    assert webtext_run(str(src / "*.parquet"), str(out),
                       keep_rejects=True, split_by_lang=True,
                       files_per_partition=1,
                       min_rows_per_file=1)["skipped"] == 1
    res3 = webtext_run(str(src / "*.parquet"), str(out),
                       keep_rejects=True, split_by_lang=False,
                       files_per_partition=1, min_rows_per_file=1)
    assert res3["completed"] == 1 and res3["skipped"] == 0
