"""Alignment subsystem tests (T2, J1-J8) on deterministic paired fixtures."""

from functools import partial

import numpy as np
import pandas as pd
import pytest

from pdf_extract_ray.corpus import PSEUDO_TRANSLATIONS, paired_sentence_tables
from pdf_extract_ray.functions.embed import HashEmbedder
from pdf_extract_ray.functions.hungarian import linear_sum_assignment
from pdf_extract_ray.pipelines.align import (
    AlignConfig,
    DocumentAligner,
    align_documents,
    merge_aligned,
    merge_full_outer,
)


def embedder():
    return HashEmbedder(vocab_map=PSEUDO_TRANSLATIONS)


class TestHungarian:
    def test_identity(self):
        cost = np.array([[0.0, 1, 1], [1, 0.0, 1], [1, 1, 0.0]])
        r, c = linear_sum_assignment(cost)
        assert c.tolist() == [0, 1, 2]

    def test_rectangular(self):
        cost = np.array([[10.0, 1.0, 10.0], [1.0, 10.0, 10.0]])
        r, c = linear_sum_assignment(cost)
        assert dict(zip(r.tolist(), c.tolist())) == {0: 1, 1: 0}


class TestHashEmbedder:
    def test_parallel_sentences_high_cosine(self):
        e = embedder()
        v = e.encode(["난민 법원 판결", tr("난민 법원 판결"), "window sort batch"])
        assert v[0] @ v[1] > 0.99
        assert v[0] @ v[2] < 0.5

    def test_deterministic(self):
        a = embedder().encode(["hello world"])
        b = embedder().encode(["hello world"])
        assert np.allclose(a, b)


def H(text, st="H1"):
    return {"text": text, "source_type": st}


def P(text):
    return {"text": text, "source_type": "P"}


def tr(kr_text):
    """EN pseudo-translation of a KR fixture via the positional vocab map."""
    out = []
    for w in kr_text.split():
        stripped = w.rstrip(".")
        out.append(PSEUDO_TRANSLATIONS.get(stripped, stripped) + w[len(stripped):])
    return " ".join(out)


class TestDocumentAligner:
    def setup_method(self):
        self.a = DocumentAligner(embedder())

    def test_pattern_anchor_found(self):
        kr = [H("목차"), P("난민 법원 판결.")]
        en = [H("Table of Contents"), P("asylum court decision.")]
        first, matches = self.a.header_matches(kr, en)
        assert first["method"] == "pattern"
        assert first["kr_idx"] == 0 and first["en_idx"] == 0

    def test_similarity_anchor_fallback(self):
        kr = [H("난민 법원"), P("항소 절차 구금.")]
        en = [H(tr("난민 법원")), P(tr("항소 절차 구금."))]
        first, matches = self.a.header_matches(kr, en)
        assert first["method"] == "similarity"
        assert first["similarity"] > 0.9

    def test_full_alignment_pairs(self):
        kr = [H("목차"), H("난민 절차", "H2"), P("법원 판결 항소 구금 송환."),
              P("비자 체류 허가 신청.")]
        en = [H("contents"), H(tr("난민 절차"), "H2"),
              P(tr("법원 판결 항소 구금 송환.")),
              P(tr("비자 체류 허가 신청."))]
        pairs = self.a.align(kr, en)
        by_kr = {p["kr_idx"]: p for p in pairs}
        assert by_kr[0]["match_type"] == "header"
        assert by_kr[2]["en_idx"] == 2 and by_kr[2]["match_type"] == "paragraph"
        assert by_kr[3]["en_idx"] == 3

    def test_crossed_paragraphs_still_match_best(self):
        # EN paragraphs swapped relative to KR: greedy matches by similarity
        kr = [H("목차"), P("법원 판결 항소."), P("비자 체류 허가.")]
        en = [H("contents"), P(tr("비자 체류 허가.")), P(tr("법원 판결 항소."))]
        pairs = self.a.align(kr, en)
        m = {p["kr_idx"]: p["en_idx"] for p in pairs if p["match_type"] == "paragraph"}
        assert m == {1: 2, 2: 1}

    def test_no_headers_no_alignment(self):
        assert self.a.align([P("법원.")], [P("court.")]) == []

    def test_monotonic_constraint(self):
        # four same-type headers with the middle two swapped on the EN side:
        # Hungarian would pair them crossed; the monotonic filter drops one
        kr = [H("목차"), H("난민 법원"), H("비자 체류"), H("구금 송환")]
        en = [H("contents"), H(tr("비자 체류")), H(tr("난민 법원")), H(tr("구금 송환"))]
        _, matches = self.a.header_matches(kr, en)
        en_order = [m["en_idx"] for m in sorted(matches, key=lambda m: m["kr_idx"])]
        assert en_order == sorted(en_order)


class TestAlignPipeline:
    @pytest.fixture(scope="class")
    def aligned(self, ray_session):
        import ray.data as rd

        kr_t, en_t = paired_sentence_tables(12)
        kr = rd.from_arrow(kr_t).repartition(3)
        en = rd.from_arrow(en_t).repartition(3)
        pairs = align_documents(
            kr, en,
            embedder_factory=partial(HashEmbedder, vocab_map=PSEUDO_TRANSLATIONS))
        return kr, en, pairs, kr_t, en_t

    def test_pairs_sane(self, aligned):
        kr, en, pairs, kr_t, en_t = aligned
        df = pairs.to_pandas()
        assert len(df) > 0
        assert set(df["match_type"]) <= {"header", "paragraph"}
        # each kr_idx used at most once per doc, ditto en_idx
        assert not df.duplicated(["doc_key", "kr_idx"]).any()
        assert not df.duplicated(["doc_key", "en_idx"]).any()
        # true parallel pairs should dominate: similarity high
        assert (df["similarity"] > 0.9).mean() > 0.8

    def test_pipeline_matches_single_process(self, aligned):
        kr, en, pairs, kr_t, en_t = aligned
        df = pairs.to_pandas().sort_values(["doc_key", "kr_idx"]).reset_index(drop=True)
        # single-process oracle over the same fixtures
        a = DocumentAligner(embedder())
        rows = []
        kr_df, en_df = kr_t.to_pandas(), en_t.to_pandas()
        for doc_key in sorted(kr_df["doc_key"].unique()):
            kr_items = kr_df[kr_df.doc_key == doc_key].sort_values("sent_no")[
                ["text", "source_type"]].to_dict("records")
            en_items = en_df[en_df.doc_key == doc_key].sort_values("sent_no")[
                ["text", "source_type"]].to_dict("records")
            for p in a.align(kr_items, en_items):
                p["doc_key"] = doc_key
                rows.append(p)
        exp = pd.DataFrame(rows)[df.columns.tolist()].sort_values(
            ["doc_key", "kr_idx"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(df, exp)

    def test_merge_left_and_full_outer(self, aligned):
        kr, en, pairs, kr_t, en_t = aligned
        kr_view = merge_aligned(kr, pairs, side="kr").to_pandas()
        assert len(kr_view) == kr_t.num_rows  # every KR sentence appears
        assert (kr_view["match_type"] == "unmatched").sum() > 0

        full = merge_full_outer(kr, en, pairs).to_pandas()
        n_matched_en = pairs.to_pandas()["en_idx"].notna().sum()
        assert len(full) == kr_t.num_rows + (en_t.num_rows - n_matched_en)


def test_merge_dedup_survives_batch_boundaries(ray_session):
    """Duplicate (doc, kr_idx) pairs split across different blocks must
    still collapse to ONE row per source sentence (keep-last by pair_seq).
    A per-batch drop_duplicates would let both survive and fan out the
    left join."""
    import ray.data as rd

    kr = pd.DataFrame(
        [("d", 0, "목차", "H1"), ("d", 1, "법원 판결.", "P")],
        columns=["doc_key", "sent_no", "text", "source_type"],
    )
    # two conflicting pairs for kr_idx=0 (anchor vs Hungarian disagreement),
    # forced into SEPARATE blocks
    pair_cols = ["doc_key", "kr_idx", "en_idx", "kr_text", "en_text",
                 "match_type", "similarity", "pair_seq"]
    p0 = pd.DataFrame([("d", 0, 5, "목차", "contents", "header", 0.9, 0)],
                      columns=pair_cols)
    p1 = pd.DataFrame([("d", 0, 7, "목차", "table of contents", "header", 1.0, 1)],
                      columns=pair_cols)
    pairs = rd.from_pandas(p0).union(rd.from_pandas(p1))

    merged = merge_aligned(rd.from_pandas(kr), pairs, side="kr").to_pandas()
    assert len(merged) == 2  # one row per KR sentence, never fanned out
    row = merged[merged["sent_no"] == 0].iloc[0]
    assert row["en_idx"] == 7 and row["match_type"] == "header"  # last wins


def test_align_gapped_sent_no_joins_correctly(ray_session):
    """Pair indices are the stream's actual order keys, not list positions:
    gapped sent_no (e.g. upstream filtering) must still merge correctly."""
    import ray.data as rd

    def tbl(rows):
        return pd.DataFrame(rows, columns=["doc_key", "sent_no", "text", "source_type"])

    kr = tbl([("d", 10, "목차", "H1"), ("d", 20, "법원 판결 항소.", "P")])
    en = tbl([("d", 5, "contents", "H1"), ("d", 7, tr("법원 판결 항소."), "P")])
    pairs = align_documents(
        rd.from_pandas(kr), rd.from_pandas(en),
        embedder_factory=partial(HashEmbedder, vocab_map=PSEUDO_TRANSLATIONS),
    ).to_pandas()
    got = {(r.kr_idx, r.en_idx) for r in pairs.itertuples()}
    assert got == {(10, 5), (20, 7)}

    merged = merge_aligned(rd.from_pandas(kr), rd.from_pandas(pairs),
                           side="kr").to_pandas()
    assert len(merged) == 2
    assert set(merged["match_type"]) == {"header", "paragraph"}
