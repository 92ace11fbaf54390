"""Word-entropy, the Gopher top/dup n-gram battery, and the host-level
quality prior (textquality.word_entropy_batch /
gopher_ngram_stats_batch, links.host_quality_prior)."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

# ---------------------------------------------------------------- #
# word entropy


def test_word_entropy_known_values():
    from pdf_extract_ray.stages.textquality import word_entropy_batch

    b = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": ["", None, "aaa aaa aaa", "cat dog", "Cat CAT dog DOG"],
    })
    out = word_entropy_batch(b)
    assert out["n_words"].tolist() == [0, 0, 3, 2, 4]
    assert out["n_unique_words"].tolist() == [0, 0, 1, 2, 2]
    # single repeated word -> 0 bits; two equally-likely words -> 1 bit
    assert out["word_entropy"].tolist() == [0.0, 0.0, 0.0, 1.0, 1.0]


def test_word_entropy_sql_parity_randomized():
    from pdf_extract_ray.stages.textquality import (
        word_entropy_batch,
        word_entropy_oracle_sql,
    )

    rng = np.random.default_rng(11)
    vocab = ["alpha", "beta", "g4mma", "the", "of", "zz"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 30)))
             + (" Ünïcode-tail" if i % 9 == 0 else "")
             for i in range(250)]
    texts[0], texts[1] = "", None
    df = pd.DataFrame({"doc_id": np.arange(250), "text": texts})
    got = word_entropy_batch(df).sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", df)
    want = (con.sql(word_entropy_oracle_sql()).df()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ---------------------------------------------------------------- #
# Gopher top/dup n-gram battery


def test_gopher_ngram_hand_computed():
    from pdf_extract_ray.stages.textquality import gopher_ngram_stats_batch

    b = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [
            # "x y" * 5: top 2-gram "x y" count 5 (overlap convention:
            # 5*2/10 chars = 1.0); every 5-gram occurs >= 2 times, so
            # dup_5gram union coverage = all 10 word positions = 1.0
            "x y x y x y x y x y",
            # no repeated 5-gram; top 2-gram "aa bb" count 2 -> 8/14
            "aa bb cc aa bb dd zz",
            "",
        ],
    })
    out = gopher_ngram_stats_batch(b)
    r0 = out.iloc[0]
    assert r0["top_2gram_char_frac"] == 1.0
    assert r0["dup_5gram_char_frac"] == 1.0
    assert r0["dup_10gram_char_frac"] == 0.0  # only one 10-gram exists
    r1 = out.iloc[1]
    assert r1["top_2gram_char_frac"] == round(8 / 14, 4)
    assert r1["dup_5gram_char_frac"] == 0.0
    assert (out.iloc[2][2:] == 0.0).all()


def test_gopher_ngram_dup_coverage_no_double_count():
    from pdf_extract_ray.stages.textquality import gopher_ngram_stats_batch

    # overlapping duplicated 5-grams: union accounting, not
    # per-occurrence sums
    text = "a b c d e f " + "a b c d e f " + "tail1 tail2 tail3"
    out = gopher_ngram_stats_batch(
        pd.DataFrame({"doc_id": [0], "text": [text]}))
    # words: a b c d e f a b c d e f tail1 tail2 tail3 (15 words,
    # 12·1 + 3·5 = 27 chars).  Dup 5-grams: "a b c d e" (starts 1, 7)
    # and "b c d e f" (starts 2, 8) -> covered positions 1..6 ∪ 7..12 =
    # 12 single-char words.  Per-occurrence summing would claim 20.
    assert out["dup_5gram_char_frac"].iloc[0] == round(12 / 27, 4)


def test_gopher_ngram_sql_parity_randomized():
    from pdf_extract_ray.stages.textquality import (
        gopher_ngram_oracle_sql,
        gopher_ngram_stats_batch,
    )

    rng = np.random.default_rng(5)
    vocab = ["buy", "cheap", "pills", "now", "alpha", "beta", "x"]
    texts = []
    for i in range(200):
        ws = list(rng.choice(vocab, size=rng.integers(0, 25)))
        if i % 4 == 0:
            ws += list(rng.choice(vocab, size=7)) * rng.integers(2, 4)
        texts.append(" ".join(ws))
    texts[0], texts[1] = "", None
    df = pd.DataFrame({"doc_id": np.arange(200), "text": texts})
    got = (gopher_ngram_stats_batch(df)
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", df)
    want = (con.sql(gopher_ngram_oracle_sql()).df()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_gopher_ngram_batch_split_invariant():
    # per-doc semantics: splitting the batch changes nothing
    from pdf_extract_ray.stages.textquality import gopher_ngram_stats_batch

    rng = np.random.default_rng(3)
    vocab = ["a", "bb", "ccc", "dd"]
    df = pd.DataFrame({
        "doc_id": np.arange(60),
        "text": [" ".join(rng.choice(vocab, size=rng.integers(4, 30)))
                 for _ in range(60)],
    })
    whole = gopher_ngram_stats_batch(df)
    parts = pd.concat([gopher_ngram_stats_batch(df.iloc[i:i + 7])
                       for i in range(0, 60, 7)], ignore_index=True)
    pd.testing.assert_frame_equal(
        whole.reset_index(drop=True), parts, check_dtype=False)


# ---------------------------------------------------------------- #
# host quality prior


def test_host_quality_prior_and_sql_parity(ray_session):
    from pdf_extract_ray.functions.url import canonicalize_oracle_sql
    from pdf_extract_ray.stages.links import (
        host_quality_prior,
        host_quality_prior_oracle_sql,
    )

    rng = np.random.default_rng(17)
    n = 300
    df = pd.DataFrame({
        "doc_id": np.arange(n),
        "url": ["https://site" + str(i % 9) + ".example.com/p/" + str(i)
                for i in range(n)],
        "score": rng.integers(0, 1000, size=n),
    })
    got = (host_quality_prior(rd.from_pandas(df).repartition(5),
                              min_avg=500.0)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("pages", df)
    can = canonicalize_oracle_sql("SELECT doc_id, url, score FROM pages",
                                  id_cols="doc_id, score")
    src = f"SELECT doc_id, url_host, score FROM ({can})"
    want = (con.sql(host_quality_prior_oracle_sql(src, min_avg=500.0))
            .df().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # both kept and dropped hosts exist at this threshold
    assert got["kept"].any() and (~got["kept"]).any()
    # every page of a host carries the same verdict
    per_host = got.groupby("url_host")["kept"].nunique()
    assert (per_host == 1).all()


# ---------------------------------------------------------------- #
# corpus n-gram top-k (boilerplate phrase mining)


def test_ngram_counts_and_sql_parity(ray_session):
    from pdf_extract_ray.stages.textquality import (
        ngram_counts,
        ngram_counts_oracle_sql,
    )

    rng = np.random.default_rng(41)
    vocab = ["accept", "all", "cookies", "share", "this", "page",
             "unique" ]
    texts = []
    for i in range(150):
        ws = list(rng.choice(vocab, size=rng.integers(0, 20)))
        if i % 2 == 0:
            ws = ["please", "accept", "all", "cookies"] + ws
        texts.append(" ".join(ws) + f" tail{i}")
    texts[0], texts[1] = "", None
    df = pd.DataFrame({"doc_id": np.arange(150), "text": texts})
    got = (ngram_counts(rd.from_pandas(df).repartition(5), 3, top_k=25)
           .to_pandas().reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", df)
    want = (con.sql(ngram_counts_oracle_sql(3, top_k=25)).df()
            .reset_index(drop=True))
    # compare as sets of rows (driver convention: order-insensitive)
    key = lambda d: d.sort_values(["n", "gram"],
                                  ascending=[False, True],
                                  kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(key(got), key(want), check_dtype=False)
    # the planted banner trigrams dominate; "please" never occurs in
    # random text, so its trigram counts exactly the banner docs
    # (75 even docs minus the emptied doc 0)
    top = key(got)
    assert top.iloc[0]["gram"].split()[0] in ("please", "accept")
    assert int(top.loc[top["gram"] == "please accept all", "n"].iloc[0]) == 74
    # grams never straddle documents: "tail<i> please" bigrams absent
    got5 = (ngram_counts(rd.from_pandas(df), 2)
            .to_pandas())
    assert not got5["gram"].str.match(r"tail\d+ please").any()


def test_vocab_filter_sql_parity_and_unk_rule(ray_session):
    import duckdb
    import ray.data as rd

    from pdf_extract_ray.stages.textquality import (
        vocab_filter,
        vocab_filter_oracle_sql,
    )

    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype="int64"),
        "text": [
            "aa aa aa bb bb cc",    # aa, bb frequent
            "aa bb rare1",
            "aa bb rare2 rare2",
            "",                     # empty
            None,                   # null
            "AA Bb cc",             # case folds into the same vocab
        ],
    })
    got = (vocab_filter(rd.from_pandas(docs).repartition(3), top_k=3)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # vocab = 3 most frequent: aa(5) bb(4) cc(2)... rare2 has 2 too ->
    # tie broken by word asc: cc < rare2
    assert got.loc[1, "text_unk"] == "aa bb <unk>"
    assert got.loc[2, "text_unk"] == "aa bb <unk> <unk>"
    assert got.loc[2, "n_unk"] == 2
    assert got.loc[3, "text_unk"] == "" and got.loc[3, "n_tokens"] == 0
    assert got.loc[5, "text_unk"] == "aa bb cc"
    con = duckdb.connect()
    con.register("documents", docs)
    want = (con.sql(vocab_filter_oracle_sql(top_k=3)).df()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_lexical_diversity_reference(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from pdf_extract_ray.stages.textquality import lexical_diversity_batch

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["the the the cat", "a b c d", ""],
    })
    got = (rd.from_pandas(df).repartition(2)
           .map_batches(lexical_diversity_batch, batch_format="pandas")
           .to_pandas().set_index("doc_id"))
    # doc 1: n=4 tokens, 2 types, 1 hapax (cat), rep = 3*2 = 6
    assert got.loc[1, "n_words"] == 4
    assert got.loc[1, "n_distinct"] == 2
    assert got.loc[1, "n_hapax"] == 1
    assert got.loc[1, "ttr"] == 0.5
    assert got.loc[1, "simpson"] == 6 / 12
    # doc 2: all hapax, simpson 0
    assert got.loc[2, "n_hapax"] == 4 and got.loc[2, "simpson"] == 0.0
    # doc 3 (empty) emits NO row
    assert 3 not in got.index


class TestQuotedSpans:
    def test_rules_and_positions(self):
        from pdf_extract_ray.stages.textquality import quoted_spans_batch

        b = pd.DataFrame({"doc_id": [0, 1, 2], "text": [
            'He said "the quick brown fox" and then "too short" again '
            'plus "five more words right here" done',
            'no quotes at all',
            '"unterminated so ignored and also\nnewline "a b c" ok',
        ]})
        got = quoted_spans_batch(b)
        assert got["quote"].tolist() == [
            "the quick brown fox", "five more words right here",
            "a b c"]
        assert got["pos"].tolist() == [1, 2, 1]
        assert got["n_words"].tolist() == [4, 5, 3]

    def test_sql_parity(self, ray_session):
        import duckdb

        from pdf_extract_ray.stages.textquality import (
            quoted_spans_batch,
            quoted_spans_oracle_sql,
        )

        rng = np.random.RandomState(23)
        words = np.array(['alpha', 'beta', '"', 'gamma delta epsilon',
                          'zeta"', '"eta theta iota kappa"'])
        texts = [" ".join(words[rng.randint(0, len(words), 12)])
                 for _ in range(150)]
        df = pd.DataFrame({"doc_id": range(150), "text": texts})
        got = (quoted_spans_batch(df)
               .sort_values(["doc_id", "pos"]).reset_index(drop=True))
        con = duckdb.connect()
        con.register("t", df)
        want = (con.execute(quoted_spans_oracle_sql("t"))
                .df().sort_values(["doc_id", "pos"])
                .reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_sentence_stats_via_real_splitter(ray_session):
    import ray.data as rd

    from pdf_extract_ray.stages.textquality import (
        sentence_stats,
        sentence_stats_batch,
    )

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "One two. Three four five! Six seven eight nine?",
            "No terminal punctuation here at all",
            # bracket-protected period must NOT split
            "Before (see Fig. 2) after. Tail words",
            None,
        ],
    })
    got = sentence_stats_batch(docs)
    assert got["n_sentences"].tolist() == [3, 1, 2, 0]
    assert got["max_sentence_words"].tolist() == [4, 6, 5, 0]
    assert got.loc[0, "mean_sentence_words"] == 3.0
    assert pd.isna(got.loc[3, "mean_sentence_words"])
    dist = (sentence_stats(rd.from_pandas(docs).repartition(3))
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(dist, got)
