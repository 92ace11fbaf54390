"""Analyzer (M14-M18), filter (M19), stats (M20), normalize (M13) tests —
fixtures per FIXTURES.md F6."""

import json

import pandas as pd

from pdf_extract_ray.stages.analyzers import (
    NumberComparer,
    PairAnalyzer,
    compare_english_words,
    compare_punct,
    compare_special_symbols,
    sentence_quality_class,
)
from pdf_extract_ray.stages.filters import (
    apply_content_filters,
    is_numbers_only,
    is_symbol_or_single_alpha,
)
from pdf_extract_ray.stages.normalize import normalize_batch
from pdf_extract_ray.stages.stats import pair_stats_batch


class TestPunct:
    def test_match(self):
        r = compare_punct("안녕하세요.", "Hello.")
        assert r["punct_match_type"] == "match"
        assert r["kor_punct"] == "." and r["eng_punct"] == "."

    def test_mid_period_not_counted(self):
        r = compare_punct("a.b", "ab")
        assert r["punct_match_type"] == "match"  # only END period counts

    def test_no_match_with_diffs(self):
        r = compare_punct("뭐?", "What?!")
        assert r["punct_match_type"] == "no_match"
        assert json.loads(r["punct_differences"])["!"]["english"] == 1


class TestNumbers:
    def setup_method(self):
        self.c = NumberComparer()

    def test_no_numbers(self):
        assert self.c.compare("가나다", "abc")["number_match_status"] == "no_numbers"

    def test_all_match(self):
        r = self.c.compare("3개의 사과 1,000원", "3 apples for 1000 won")
        assert r["number_match_status"] == "all_match"

    def test_thousands_and_decimal(self):
        r = self.c.compare("1,234.5", "1234.5")
        assert r["number_match_status"] == "all_match"

    def test_ordinal_mapping(self):
        # korean has digit 2, english spells "second" -> mapped
        r = self.c.compare("2차 회의", "the second meeting")
        assert r["number_match_status"] == "all_match"

    def test_korean_word_mapping(self):
        r = self.c.compare("이중 구조", "double structure 2")
        assert r["number_match_status"] == "all_match"

    def test_partial(self):
        r = self.c.compare("1과 2", "1 and 9999")
        assert r["number_match_status"] == "partial_match"

    def test_range_token(self):
        r = self.c.compare("10-20", "10-20")
        assert r["number_match_status"] == "all_match"
        assert r["kor_numbers"] == "10-20"


class TestEnglishWords:
    def test_no_eng(self):
        assert compare_english_words("한국어만", "english")["eng_word_match_status"] == "no_eng_in_kor"

    def test_all_match_with_plural_fold(self):
        r = compare_english_words("그 ruling 문제", "the rulings problem")
        assert r["eng_word_match_status"] == "all_match"
        r = compare_english_words("그 party 참석", "the parties attended")
        assert r["eng_word_match_status"] == "all_match"

    def test_roman_numeral_credit(self):
        r = compare_english_words("부록 ii 참고", "see annex 2")
        assert r["eng_word_match_status"] == "all_match"

    def test_missing(self):
        r = compare_english_words("CJEU 판결", "the ruling")
        assert r["eng_word_match_status"] == "no_match"
        assert json.loads(r["eng_word_differences"]) == {"cjeu": 1}


class TestSymbols:
    def test_none(self):
        assert compare_special_symbols("가나.", "ab.")["symbol_match_status"] == "no_special_symbols"

    def test_match(self):
        r = compare_special_symbols("a † b", "c † d")
        assert r["symbol_match_status"] == "all_match"

    def test_superscript_digit_credit(self):
        r = compare_special_symbols("각주¹", "footnote 1")
        # NFKC turns ¹ into plain 1 on the korean side first, so no symbols remain
        assert r["symbol_match_status"] == "no_special_symbols"


class TestQualityClass:
    def test_classes(self):
        assert sentence_quality_class(None, "x") == "invalid_input"
        assert sentence_quality_class("", " ") == "empty"
        assert sentence_quality_class("Same Text", "same text") == "all_match"
        assert sentence_quality_class("s a m e", "same") == "partial_match"
        assert sentence_quality_class("english only", "different") == "no_korean_in_kor"
        assert sentence_quality_class("한국어 문장", "an english sentence") == "valid_candidate"


class TestFilters:
    def test_numbers_only(self):
        assert is_numbers_only("1, 2.3 ")
        assert not is_numbers_only("1a")
        assert not is_numbers_only("  ")

    def test_single_symbol_or_alpha(self):
        assert is_symbol_or_single_alpha("†")
        assert is_symbol_or_single_alpha("x")
        assert not is_symbol_or_single_alpha("가")
        assert not is_symbol_or_single_alpha("ab")

    def test_apply(self):
        df = pd.DataFrame({
            "k": ["1 2", "좋은 문장", "†", "정상"],
            "e": ["3 4", "good sentence", "ok", "fine"],
        })
        out = apply_content_filters(df, "k", "e")
        assert list(out["k"]) == ["좋은 문장", "정상"]


class TestStatsAndNormalize:
    def test_stats(self):
        df = pd.DataFrame({
            "kr_text_normalized": ["하나 둘 셋 넷 다섯 여섯"],
            "en_text_normalized": ["one two"],
            "match_type": ["header"],
        })
        out = pair_stats_batch(df.copy())
        assert out["word_count_kr"].iloc[0] == 6
        assert out["word_ratio"].iloc[0] == 0.33
        assert bool(out["potential_split"].iloc[0])

    def test_normalize_chain(self):
        df = pd.DataFrame({"t": ["- “헬로” * 월드 --- ﬁn ;"]})
        out = normalize_batch(df.copy(), ["t"])
        assert out["t_cleaned"].iloc[0] == '"헬로" 월드  ﬁn'
        assert out["t_normalized"].iloc[0] == '"헬로" 월드  fin'


def test_pair_analyzer_batch():
    df = pd.DataFrame({
        "kr_text_normalized": ["3개의 CJEU 판결.", ""],
        "en_text_normalized": ["3 CJEU rulings.", ""],
    })
    out = PairAnalyzer()(df.copy())
    assert out["punct_match_type"].tolist() == ["match", "match"]
    assert out["number_match_status"].tolist() == ["all_match", "no_numbers"]
    assert out["eng_word_match_status"].tolist() == ["all_match", "no_eng_in_kor"]
    assert out["only_eng_korean_sentence"].tolist() == ["valid_candidate", "empty"]


def test_batched_analyzer_identical_to_per_row_composition():
    """PairAnalyzer's batched kernels (joined-scan + sentinel findall)
    must be byte-identical to composing the per-row reference functions —
    including sentinel-collision rows (fallback path), unicode edge cases
    ('İ' lowercase expansion), superscripts, and empty/None inputs."""
    import pandas as pd

    from pdf_extract_ray.stages.analyzers import (
        NumberComparer,
        PairAnalyzer,
        compare_english_words,
        compare_punct,
        compare_special_symbols,
        sentence_quality_class,
    )

    batch = pd.DataFrame({
        "kr_text_normalized": [
            "", "안녕하세요 3rd test!", "x²+y₂=z", "1,234.5 ranges 3-4 2nd",
            "이중 더블 check", "same text.", "CAF-part ies policies",
            "V II x", None, "“quote…” ~`%",
            "word zqzrowsepzqz trap", "İstanbul Aİ", "ends with period.",
            "mixed 12 한글 words», °C", "쉼표, 느낌표! 물음표?",
        ],
        "en_text_normalized": [
            "", "hello third test!", "x2 + y2 = z", "1234.5 3-4 second",
            "double double check", "same  text.", "caf parts policy",
            "5 2 10", "word", "quotes… %",
            "zqzrowsepzqz", "istanbul ai", "ends with period.",
            "mixed 12 words», °C superscript ³", "comma, bang! question?",
        ],
    }).astype(object)
    got = PairAnalyzer()(batch.copy())

    nc = NumberComparer()
    kors = batch["kr_text_normalized"].fillna("").astype(str)
    engs = batch["en_text_normalized"].fillna("").astype(str)
    recs = []
    for k, e in zip(kors, engs):
        rec = {}
        rec.update(compare_punct(k, e))
        rec.update(nc.compare(k, e))
        rec.update(compare_english_words(k, e))
        rec.update(compare_special_symbols(k, e))
        rec["only_eng_korean_sentence"] = sentence_quality_class(k, e)
        recs.append(rec)
    want = pd.DataFrame(recs)
    for c in want.columns:
        assert (got[c].astype(str).to_numpy()
                == want[c].astype(str).to_numpy()).all(), c
    # column ORDER also frozen (canonical projection depends on it)
    assert [c for c in got.columns if c in set(want.columns)] \
        == list(want.columns)
