"""End-to-end lifecycle composition mirroring the reference's full chain
(SURVEY.md §3.3): extraction-shaped sentence streams -> KRxEN alignment ->
merge views -> composed quality pass -> two-sheet Excel report.

Each stage is individually oracle-/golden-checked elsewhere; this test
proves they COMPOSE: schemas line up, row accounting holds end-to-end,
and the final artifact is written and readable."""

from functools import partial

import pandas as pd
import pytest

from pdf_extract_ray.corpus import PSEUDO_TRANSLATIONS, paired_sentence_tables
from pdf_extract_ray.functions.embed import HashEmbedder
from pdf_extract_ray.pipelines.align import align_documents, merge_aligned
from pdf_extract_ray.pipelines.quality import quality_pairs
from pdf_extract_ray.sources.xlsx import read_xlsx, write_two_sheet_report


@pytest.fixture(scope="module")
def lifecycle(ray_session, tmp_path_factory):
    import ray.data as rd

    kr_t, en_t = paired_sentence_tables(14)
    kr = rd.from_arrow(kr_t).repartition(3)
    en = rd.from_arrow(en_t).repartition(3)

    pairs = align_documents(
        kr, en, embedder_factory=partial(HashEmbedder,
                                         vocab_map=PSEUDO_TRANSLATIONS))

    kr_view = merge_aligned(kr, pairs, side="kr")

    # quality pass over the MATCHED pairs; unique order key from
    # (doc_key, kr_idx) — the engine's lineage-as-columns idiom
    def to_quality_input(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["match_type"] != "unmatched"].copy()
        b["pair_uid"] = b["doc_key"].astype(str) + "#" + \
            b["kr_idx"].astype(int).astype(str).str.zfill(6)
        return b[["pair_uid", "kr_text", "en_text"]]

    quality = quality_pairs(
        pairs.map_batches(to_quality_input, batch_format="pandas"),
        order_col="pair_uid")

    out = tmp_path_factory.mktemp("e2e")
    report = str(out / "metadata.xlsx")
    qdf = quality.to_pandas()
    write_two_sheet_report(report, qdf, qdf.head(0))
    return {
        "kr_rows": kr_t.num_rows,
        "en_rows": en_t.num_rows,
        "pairs": pairs.to_pandas(),
        "kr_view": kr_view.to_pandas(),
        "quality": qdf,
        "report": report,
    }


def test_alignment_and_merge_accounting(lifecycle):
    pairs, kr_view = lifecycle["pairs"], lifecycle["kr_view"]
    assert len(pairs) > 0
    # merge view: exactly one row per KR source sentence
    assert len(kr_view) == lifecycle["kr_rows"]
    assert not kr_view.duplicated(["doc_key", "sent_no"]).any()
    assert (kr_view["match_type"] == "unmatched").sum() > 0


def test_quality_composes_over_aligned_pairs(lifecycle):
    pairs, q = lifecycle["pairs"], lifecycle["quality"]
    matched = pairs[pairs["match_type"] != "unmatched"]
    # quality never invents rows; it filters + dedups
    assert 0 < len(q) <= len(matched)
    assert "kr_text_normalized" in q.columns
    assert set(q["only_eng_korean_sentence"]) <= {
        "empty", "all_match", "partial_match", "no_korean_in_kor",
        "valid_candidate"}
    # the parallel corpus is dominated by genuine KR/EN candidates
    assert (q["only_eng_korean_sentence"] == "valid_candidate").mean() > 0.8


def test_report_artifact_round_trips(lifecycle):
    sheets = read_xlsx(lifecycle["report"])
    assert list(sheets) == ["Text_Analyzed_Filtered", "Table_Filtered"]
    back = sheets["Text_Analyzed_Filtered"]
    assert len(back) == len(lifecycle["quality"])
    assert back["kr_text"].tolist() == lifecycle["quality"]["kr_text"].tolist()
