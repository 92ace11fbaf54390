"""Corpus-wide duplicated-line removal (stages/boilerplate.py)."""

import pandas as pd
import pytest
import ray.data as rd

from pdf_extract_ray.stages.boilerplate import (
    dedup_lines,
    dup_line_positions,
)

DOCS = pd.DataFrame({
    "doc_id": [0, 1, 2, 3],
    "text": [
        "ACCEPT COOKIES\nunique alpha content\nCopyright Site",
        "ACCEPT COOKIES\nunique beta content\nCopyright Site",
        "  ACCEPT COOKIES  \nunique gamma content",  # strip-matches
        "\n\nonly unique here\n",  # blank lines never count as dups
    ],
})


@pytest.mark.parametrize("key", ["text", "hash"])
def test_dup_positions(ray_session, key):
    got = (dup_line_positions(rd.from_pandas(DOCS).repartition(2), key=key)
           .to_pandas().sort_values(["doc_id", "pos"])
           .reset_index(drop=True))
    # cookie banner in docs 0,1,2 (stripped match); copyright in 0,1
    want = {(0, 1), (0, 3), (1, 1), (1, 3), (2, 1)}
    assert set(zip(got["doc_id"], got["pos"])) == want


@pytest.mark.parametrize("key", ["text", "hash"])
def test_dedup_lines_removal(ray_session, key):
    got = (dedup_lines(rd.from_pandas(DOCS).repartition(2), key=key)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["cleaned_text"].tolist() == [
        "unique alpha content",
        "unique beta content",
        "unique gamma content",
        "\n\nonly unique here\n",  # untouched, blanks kept
    ]
    assert got["n_lines"].tolist() == [3, 3, 2, 4]
    assert got["n_removed_lines"].tolist() == [2, 2, 1, 0]


def test_hash_equals_text_mode(ray_session):
    a = (dedup_lines(rd.from_pandas(DOCS), key="text")
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (dedup_lines(rd.from_pandas(DOCS), key="hash")
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_min_count_threshold(ray_session):
    # min_count=3: only the 3-doc cookie banner qualifies
    got = (dedup_lines(rd.from_pandas(DOCS), key="text", min_count=3)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["n_removed_lines"].tolist() == [1, 1, 1, 0]
    assert "Copyright Site" in got.loc[0, "cleaned_text"]


def test_bad_key(ray_session):
    with pytest.raises(Exception):
        dedup_lines(rd.from_pandas(DOCS), key="bogus").take_all()


# --- host template prefix (LCP) + strip -------------------------------------

def _lcp_run(df, **kw):
    from pdf_extract_ray.stages.boilerplate import host_common_prefix

    got = host_common_prefix(rd.from_pandas(df).repartition(3),
                             num_buckets=2, **kw)
    return got.to_pandas().sort_values("host").set_index("host")


def test_lcp_basic_and_null(ray_session):
    df = pd.DataFrame({
        "host": ["a", "a", "a", "b", "b", "c", "d"],
        "text": ["Banner | one", "Banner | two", "Banner | three",
                 "x only", None,  # null forces b's lcp empty
                 "solo full text",  # single doc: lcp == whole text
                 ""],
    })
    got = _lcp_run(df)
    assert got.loc["a", "prefix"] == "Banner | "
    assert got.loc["a", "lcp_len"] == 9 and got.loc["a", "n_docs"] == 3
    assert got.loc["b", "lcp_len"] == 0 and got.loc["b", "prefix"] == ""
    assert got.loc["c", "prefix"] == "solo full text"
    assert got.loc["d", "lcp_len"] == 0


def test_lcp_matches_commonprefix_reference(ray_session):
    import os.path

    rows = []
    for d in range(60):
        h = f"h{d % 5}"
        rows.append({"host": h,
                     "text": f"tmpl-{h} nav | doc {d} body {d * 7 % 11}"})
    df = pd.DataFrame(rows)
    got = _lcp_run(df)
    for h, g in df.groupby("host"):
        exp = os.path.commonprefix(list(g.text))
        assert got.loc[h, "prefix"] == exp
        assert got.loc[h, "lcp_len"] == len(exp)


def test_lcp_max_len_caps(ray_session):
    df = pd.DataFrame({"host": ["a", "a"],
                       "text": ["longprefix-x", "longprefix-y"]})
    got = _lcp_run(df, max_len=4)
    assert got.loc["a", "prefix"] == "long" and got.loc["a", "lcp_len"] == 4


def test_strip_common_prefix_roundtrip(ray_session):
    from pdf_extract_ray.stages.boilerplate import (
        host_common_prefix, strip_common_prefix)

    df = pd.DataFrame({
        "host": ["a", "a", "b", "b"],
        "text": ["Banner: doc one", "Banner: doc two",
                 "nav» x", None],
    })
    ds = rd.from_pandas(df).repartition(2)
    pref = host_common_prefix(ds, num_buckets=2).to_pandas()
    out = (strip_common_prefix(ds, pref).to_pandas()
           .sort_values("text", na_position="first")
           .reset_index(drop=True))
    texts = set(out.text.fillna(""))
    # lcp of the two banner docs is "Banner: doc " (shared up to o/t)
    assert "one" in texts and "two" in texts
    # host b: lcp is empty (null row) -> rows pass through unchanged
    assert "nav» x" in texts


HOST_DOCS = pd.DataFrame({
    "doc_id": [0, 1, 2, 3, 4, 5],
    "url_host": ["a.com", "a.com", "a.com", "b.org", "b.org", "b.org"],
    "text": [
        "SITE NAV\nalpha body",
        "SITE NAV\nbeta body",
        "SITE NAV\ngamma body",
        "SITE NAV\ndelta body",    # same words on b.org: only 1 hit there
        "other menu\nepsilon body",
        "other menu\nzeta body",
    ],
})


@pytest.mark.parametrize("key", ["text", "hash"])
def test_host_scoped_dedup_lines(ray_session, key):
    # host-scoped rule: "SITE NAV" is chrome on a.com (3 hits >= 3) but
    # content on b.org (1 hit); corpus-wide it would vanish everywhere.
    got = (dedup_lines(rd.from_pandas(HOST_DOCS).repartition(3), key=key,
                       min_count=3, group_col="url_host")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["cleaned_text"].tolist() == [
        "alpha body", "beta body", "gamma body",
        "SITE NAV\ndelta body",
        "other menu\nepsilon body", "other menu\nzeta body",
    ]
    assert got["n_removed_lines"].tolist() == [1, 1, 1, 0, 0, 0]
    # corpus-wide at the same threshold strips a.com AND b.org's copy
    corpus = (dedup_lines(rd.from_pandas(HOST_DOCS), key=key, min_count=3)
              .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert corpus.loc[3, "cleaned_text"] == "delta body"


def test_host_scoped_oracle_parity(ray_session, tmp_path):
    import duckdb

    from pdf_extract_ray.stages.boilerplate import dedup_lines_oracle_sql

    got = (dedup_lines(rd.from_pandas(HOST_DOCS), key="text", min_count=3,
                       group_col="url_host")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("pages", HOST_DOCS)
    want = con.execute(dedup_lines_oracle_sql(
        "pages", min_count=3, group_col="url_host")).df() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
