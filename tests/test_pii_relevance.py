"""PII redaction (stages/pii.py) and BM25/TF-IDF relevance scoring
(stages/relevance.py): kernel semantics, rule ordering, scale shape, and
the fast stratified-sample variant."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from pdf_extract_ray.stages.pii import PII_RULES, redact_batch, redact_pii
from pdf_extract_ray.stages.relevance import (
    bm25_idf,
    bm25_scores,
    corpus_stats,
    tfidf_scores,
)


def _redact_one(text: str) -> dict:
    t = redact_batch(pa.table({"text": [text]}))
    return {c: t.column(c)[0].as_py() for c in t.column_names}


def test_redact_email_ssn_ip_phone():
    got = _redact_one(
        "mail a.b-c_1@sub.example.org ssn 123-45-6789 "
        "host 192.168.0.1 tel +1 555-123-4567 end")
    assert got["redacted_text"] == (
        "mail <EMAIL> ssn <SSN> host <IP> tel +1 <PHONE> end")
    assert (got["n_email"], got["n_ssn"], got["n_ipv4"], got["n_phone"]) \
        == (1, 1, 1, 1)


def test_rule_order_ssn_not_double_counted_as_phone():
    # SSN (3-2-4) must be taken by the ssn rule, not the phone rule
    got = _redact_one("123-45-6789 and 555-123-4567")
    assert got["n_ssn"] == 1 and got["n_phone"] == 1
    assert got["redacted_text"] == "<SSN> and <PHONE>"


def test_redaction_tokens_never_rematch():
    # replacement tokens contain no digits: a second pass is a no-op
    once = _redact_one("x 10.0.0.1 y u@v.com z")["redacted_text"]
    twice = _redact_one(once)["redacted_text"]
    assert once == twice == "x <IP> y <EMAIL> z"


def test_clean_text_untouched_and_nulls_safe():
    t = redact_batch(pa.table({"text": ["plain words only", None]}))
    assert t.column("redacted_text").to_pylist() == ["plain words only", ""]
    assert t.column("n_email").to_pylist() == [0, 0]


def test_redact_pii_dataset(ray_session):
    ds = rd.from_items([
        {"doc_id": 1, "text": "write to bob@example.com now"},
        {"doc_id": 2, "text": "nothing here"},
    ])
    out = {r["doc_id"]: r for r in redact_pii(ds).take_all()}
    assert out[1]["redacted_text"] == "write to <EMAIL> now"
    assert out[1]["n_email"] == 1
    assert out[2]["redacted_text"] == "nothing here"


# ---------------------------------------------------------------------------
# relevance
# ---------------------------------------------------------------------------

DOCS = [
    {"doc_id": 0, "text": "hash join hash probe"},
    {"doc_id": 1, "text": "merge sort merge path merge"},
    {"doc_id": 2, "text": "stream the stream"},
    {"doc_id": 3, "text": "unrelated words entirely"},
    {"doc_id": 4, "text": None},
]


def test_corpus_stats(ray_session):
    ds = rd.from_items(DOCS)
    s = corpus_stats(ds, ["hash", "merge", "stream"])
    assert s["n_docs"] == 5
    assert s["df"] == {"hash": 1, "merge": 1, "stream": 1}
    # token counts: 4 + 5 + 3 + 3 + 0 = 15
    assert s["avgdl"] == 15 / 5


def test_bm25_matches_hand_formula(ray_session):
    ds = rd.from_items(DOCS)
    out = {r["doc_id"]: r for r in
           bm25_scores(ds, ["hash"], ndigits=9).take_all()}
    n, df, avgdl, k1, b = 5, 1, 3.0, 1.2, 0.75
    idf = bm25_idf(n, df)
    tf, dl = 2.0, 4.0
    expect = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    assert out[0]["bm25"] == pytest.approx(expect, abs=1e-8)
    assert out[3]["bm25"] == 0.0
    assert out[4]["bm25"] == 0.0 and out[4]["dl"] == 0


def test_bm25_term_subset_matching_is_word_bounded(ray_session):
    # "hashing" must not count as "hash"
    ds = rd.from_items([{"doc_id": 0, "text": "hashing rehash hash"}])
    out = bm25_scores(ds, ["hash"]).take_all()[0]
    assert out["dl"] == 3
    assert out["bm25"] > 0  # exactly one true "hash" token counted
    s = corpus_stats(rd.from_items(
        [{"doc_id": 0, "text": "hashing rehash"}]), ["hash"])
    assert s["df"] == {"hash": 0}


def test_tfidf_zero_for_absent_terms(ray_session):
    ds = rd.from_items(DOCS)
    out = {r["doc_id"]: r for r in
           tfidf_scores(ds, ["hash", "merge"]).take_all()}
    assert out[3]["tfidf"] == 0.0
    # doc 1: tf(merge)=3, idf=ln(5/2)
    assert out[1]["tfidf"] == pytest.approx(
        round(3 * math.log(5 / 2), 4), abs=1e-9)


def test_bm25_deterministic_across_parallelism(ray_session):
    rows = [{"doc_id": i, "text": f"hash value {i} merge stream" * (i % 4)}
            for i in range(200)]
    a = bm25_scores(rd.from_items(rows, override_num_blocks=1),
                    ["hash", "stream"]).to_pandas()
    b = bm25_scores(rd.from_items(rows, override_num_blocks=13),
                    ["hash", "stream"]).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# stratified_sample fast variant
# ---------------------------------------------------------------------------

def test_stratified_sample_fast_variant(ray_session):
    from pdf_extract_ray.stages.agg import stratified_sample

    rows = [{"k": f"g{i % 3}", "id": i} for i in range(300)]
    fast = stratified_sample(rd.from_items(rows), ["k"], "id", 5,
                             order="fast").to_pandas()
    assert len(fast) == 15
    assert fast.groupby("k").size().eq(5).all()
    # deterministic across parallelism
    fast2 = stratified_sample(
        rd.from_items(rows, override_num_blocks=7), ["k"], "id", 5,
        order="fast").to_pandas()
    key = lambda d: sorted(map(tuple, d[["k", "id"]].to_numpy()))
    assert key(fast) == key(fast2)
    with pytest.raises(ValueError):
        stratified_sample(rd.from_items(rows), ["k"], "id", 5, order="nope")


def test_pii_rules_frozen():
    # the oracle SQL chain mirrors this exact order; a reorder is a
    # semantic change and must be deliberate
    assert [r[0] for r in PII_RULES] == ["email", "ssn", "ipv4", "phone"]


# ---------------------------------------------------------------------------
# repetition stats (Gopher-style filters)
# ---------------------------------------------------------------------------

def test_repetition_stats_hand_values():
    from pdf_extract_ray.stages.textquality import repetition_stats_batch

    b = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "spam spam spam eggs",       # 4 words, 2 distinct, run 3
            "a b a b a b",               # top bigram "a b" = 3/5
            "all unique words here",
            None,
        ],
    })
    out = repetition_stats_batch(b)
    assert out["n_words"].tolist() == [4, 6, 4, 0]
    assert out.loc[0, "dup_word_frac"] == pytest.approx(1 - 2 / 4)
    assert out.loc[0, "top_word_frac"] == pytest.approx(3 / 4)
    assert out.loc[0, "max_word_run"] == 3
    assert out.loc[1, "top_bigram_frac"] == pytest.approx(3 / 5)
    assert out.loc[1, "max_word_run"] == 1
    assert out.loc[2, "dup_word_frac"] == 0.0
    assert out.loc[3, "n_words"] == 0 and out.loc[3, "max_word_run"] == 0


def test_repetition_stats_run_not_confused_across_docs():
    from pdf_extract_ray.stages.textquality import repetition_stats_batch

    # doc 0 ends with "x x", doc 1 starts with "x x": runs must not merge
    b = pd.DataFrame({"doc_id": [0, 1], "text": ["y x x", "x x y"]})
    out = repetition_stats_batch(b)
    assert out["max_word_run"].tolist() == [2, 2]


def test_term_postings(ray_session):
    import pandas as pd
    import ray.data as rd

    from pdf_extract_ray.stages.relevance import term_postings

    docs = pd.DataFrame({
        "doc_id": [3, 1, 2],
        "text": ["apple banana apple", "banana Cherry", None],
    })
    got = (term_postings(rd.from_pandas(docs).repartition(2), max_df=2)
           .to_pandas().sort_values("word").reset_index(drop=True))
    expect = pd.DataFrame({
        "word": ["apple", "banana", "cherry"],
        "df": [1, 2, 1],
        "postings": ["3", "1,3", "1"],   # per-doc dedup, ascending ids
    })
    pd.testing.assert_frame_equal(got, expect.astype({"df": got.df.dtype}))

    # max_df drops the stop-term
    got2 = (term_postings(rd.from_pandas(docs), max_df=1)
            .to_pandas().sort_values("word").reset_index(drop=True))
    assert list(got2.word) == ["apple", "cherry"]


def test_pmi_terms_distinctive_and_sql_parity(ray_session):
    import duckdb

    from pdf_extract_ray.stages.relevance import (
        pmi_terms,
        pmi_terms_oracle_sql,
    )

    # "kat" is exclusive to group a, "chat" to group b; "the" is common
    rows = []
    for i in range(30):
        rows.append(("a", f"the kat sat {i % 3}"))
        rows.append(("b", f"the chat dort {i % 3}"))
    df = pd.DataFrame(rows, columns=["g", "text"])
    got = (pmi_terms(rd.from_pandas(df).repartition(4), "g",
                     min_count=5, top_k=3)
           .to_pandas().sort_values(["g", "word"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    want = (con.sql(pmi_terms_oracle_sql("SELECT g, text FROM t", "g",
                                         min_count=5, top_k=3))
            .df().sort_values(["g", "word"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  want[sorted(want.columns)],
                                  check_dtype=False)
    # exclusive words rank as MOST distinctive; the shared "the" never
    # beats them
    top_a = got[got["g"] == "a"].sort_values(
        ["pmi", "word"], ascending=[False, True])
    assert set(top_a.head(2)["word"]) <= {"kat", "sat"}
    assert "chat" not in set(got.loc[got["g"] == "a", "word"])
    # exclusive-to-half-the-corpus word: pmi = ln(2) (both groups equal
    # token counts by construction)
    kat = got[(got["g"] == "a") & (got["word"] == "kat")]["pmi"].iloc[0]
    assert abs(kat - math.log(2)) < 1e-6
    # topology independence
    again = (pmi_terms(rd.from_pandas(df).repartition(9), "g",
                       min_count=5, top_k=3, num_buckets=32)
             .to_pandas().sort_values(["g", "word"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, again)


def test_pmi_terms_min_count_filters(ray_session):
    from pdf_extract_ray.stages.relevance import pmi_terms

    df = pd.DataFrame({"g": ["a"] * 4, "text": ["rare word"] * 1 +
                       ["common word"] * 3})
    out = (pmi_terms(rd.from_pandas(df), "g", min_count=2, top_k=10)
           .to_pandas())
    assert "rare" not in set(out["word"])
    assert {"common", "word"} <= set(out["word"])


def test_doc_keywords_top_k_and_tie_rule(ray_session):
    import math

    import pandas as pd
    import ray.data as rd

    from pdf_extract_ray.stages.relevance import doc_keywords

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            "apple apple banana zebra",   # apple tf=2; banana/zebra tie on tf
            "banana banana banana apple",
            "zebra apple",
        ],
    })
    got = doc_keywords(rd.from_pandas(df).repartition(3), k=2,
                       min_df=1, ndigits=6).to_pandas()
    n = 3.0
    idf = {w: math.log(n / (d + 1.0))
           for w, d in {"apple": 3, "banana": 2, "zebra": 2}.items()}
    # doc 1: banana and zebra have equal score (tf=1, df=2) -> word asc
    d1 = got[got["doc_id"] == 1].sort_values("kw_rank")
    assert list(d1["word"]) == ["banana", "zebra"]
    assert d1["score"].iloc[0] == round(1 * idf["banana"], 6)
    # apple's idf ln(3/4) is NEGATIVE -> ranks below banana/zebra
    assert "apple" not in set(d1["word"])
    # doc 2: banana tf=3 dominates
    d2 = got[got["doc_id"] == 2].sort_values("kw_rank")
    assert list(d2["word"]) == ["banana", "apple"]
    # min_df excludes rare words BEFORE ranking
    got2 = doc_keywords(rd.from_pandas(df), k=2, min_df=3).to_pandas()
    assert set(got2["word"]) == {"apple"}


# --- reciprocal rank fusion --------------------------------------------------

@pytest.mark.parametrize("blocks", [1, 5])
def test_rrf_fusion_matches_reference_and_sql(ray_session, blocks):
    import duckdb
    import ray.data as rd

    from pdf_extract_ray.stages.relevance import (
        rrf_fusion, rrf_fusion_oracle_sql)

    rng = np.random.default_rng(12)
    df = pd.DataFrame({
        "doc_id": np.arange(90, dtype=np.int64),
        "bm25": rng.integers(0, 40, 90).astype(np.int64),  # ties!
        "pr": rng.integers(0, 15, 90).astype(np.int64)})
    got = (rrf_fusion(rd.from_pandas(df).repartition(blocks), "doc_id",
                      ["bm25", "pr"])
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # plain reference: rank = 1 + #rows strictly better + #ties with
    # smaller id (the (score DESC, id ASC) row_number)
    def ranks(col):
        order = df.sort_values([col, "doc_id"],
                               ascending=[False, True])["doc_id"]
        r = pd.Series(np.arange(1, len(df) + 1, dtype=np.int64),
                      index=order.to_numpy())
        return r.reindex(df["doc_id"]).to_numpy()

    ra, rb = ranks("bm25"), ranks("pr")
    want_score = np.floor((1.0 / (60.0 + ra) + 1.0 / (60.0 + rb))
                          * 1e6 + 0.5) / 1e6
    assert got["rank_bm25"].tolist() == ra.tolist()
    assert got["rank_pr"].tolist() == rb.tolist()
    np.testing.assert_allclose(got["rrf_score"], want_score, rtol=0,
                               atol=1e-12)
    con = duckdb.connect()
    con.register("t", df)
    sql = rrf_fusion_oracle_sql("SELECT * FROM t", "doc_id",
                                ["bm25", "pr"])
    want = (con.sql(sql).df()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    with pytest.raises(ValueError):
        rrf_fusion(rd.from_pandas(df), "doc_id", [])


def test_textrank_kernel_and_distributed_parity(ray_session):
    import numpy as np
    import ray.data as rd

    from pdf_extract_ray.stages.relevance import (
        textrank_keywords,
        textrank_scores,
    )

    # symmetric roles get identical scores; the hub outranks the rim
    s = textrank_scores("alpha beta alpha gamma beta alpha".split())
    assert s["alpha"] == s["beta"] and s["gamma"] < s["alpha"]
    # min_len filter drops short tokens entirely
    assert "ab" not in textrank_scores("ab alpha ab beta".split())
    # no candidates -> empty
    assert textrank_scores("a b c".split()) == {}

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["the quick brown foxes jump over lazy dogs while "
                 "brown foxes watch other brown foxes",
                 "word",  # single candidate, no edges
                 None],
    })
    for parts in (1, 3):
        got = (textrank_keywords(rd.from_pandas(docs).repartition(parts),
                                 k=3)
               .to_pandas().sort_values(["doc_id", "rank"])
               .reset_index(drop=True))
        # doc 0: 'brown'/'foxes' co-occur most -> top-2
        top2 = set(got[got["doc_id"] == 0].head(2)["word"])
        assert top2 == {"brown", "foxes"}
        # doc 1: isolated vertex scores 1-d
        w1 = got[got["doc_id"] == 1]
        assert w1["word"].tolist() == ["word"]
        assert np.isclose(w1["score"].iloc[0], 0.15)
        # doc 2 (None) contributes no rows
        assert (got["doc_id"] != 2).all()
