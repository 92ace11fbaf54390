"""Page-metadata extraction (stages/pagemeta.py): first-wins rules,
cleaning, canonical resolution, missing fields (the `page_metadata`
driver query adds the independent SQL-oracle check)."""

import numpy as np
import pandas as pd

from pdf_extract_ray.stages.pagemeta import page_metadata, page_metadata_batch


def test_all_fields():
    html = (
        "<head><title> My <b>Page</b> &amp;\n co </title>"
        '<meta name="description" content="A &quot;desc&quot;  here">'
        "<meta property='og:title' content='OG title'>"
        '<link rel="canonical stylesheet" href="/canon/1">'
        "</head><title>second ignored</title>"
    )
    got = page_metadata(html, "http://h.example/a/b")
    assert got == {
        "title": "My Page & co",
        "description": 'A "desc" here',
        "canonical": "http://h.example/canon/1",
        "og_title": "OG title",
    }


def test_missing_and_first_wins():
    got = page_metadata("<p>nothing here</p>", "http://h.example/")
    assert got == {"title": None, "description": None, "canonical": None,
                   "og_title": None}
    got = page_metadata(
        '<meta name=description content=first>'
        '<meta name="description" content="second">', "u")
    assert got["description"] == "first"
    # decoy: property=description is not name=description
    got = page_metadata(
        '<meta property="description" content="x">', "u")
    assert got["description"] is None


def test_batch_bytes_null():
    b = pd.DataFrame({
        "url": ["u1", "u2"],
        "html": ["<title>t</title>".encode("utf-8"), None],
    })
    out = page_metadata_batch(b)
    assert list(out.title) == ["t", None]
    assert list(out.url) == ["u1", "u2"]


def test_ldjson_extraction():
    from pdf_extract_ray.stages.pagemeta import ldjson_batch

    html = (
        '<script type="application/ld+json">'
        ' {"@type": "Article", "headline": "x"} </script>'
        "<script type='application/ld+json'>{\"@type\": [\"Recipe\", \"y\"]}"
        "</script>"
        '<script type="application/ld+json">not json at all</script>'
        '<script type="text/javascript">{"@type": "Decoy"}</script>'
    )
    out = ldjson_batch(pd.DataFrame({"url": ["u"], "html": [html]}))
    assert list(out.blob_no) == [0, 1, 2]
    assert list(out.ld_type) == ["Article", "Recipe", None]
    assert out.raw_json[0] == '{"@type": "Article", "headline": "x"}'
    assert out.raw_json[2] == "not json at all"
    assert len(ldjson_batch(
        pd.DataFrame({"url": ["u"], "html": [None]}))) == 0


def test_refresh_redirects():
    from pdf_extract_ray.stages.pagemeta import refresh_redirects_batch

    b = pd.DataFrame({
        "url": ["http://h.example/a", "http://h.example/b",
                "http://h.example/c", "http://h.example/d",
                "http://h.example/e"],
        "html": [
            '<meta http-equiv="refresh" content="0; url=/new">',
            "<meta http-equiv='REFRESH' content='5;URL=\"http://x.example/\"'>"
            '<meta http-equiv="refresh" content="9; url=/ignored-second">',
            '<meta http-equiv="refresh" content="30">',      # self-refresh
            '<meta http-equiv="refresh" content="garbage">',  # unparseable
            "<p>no meta</p>",
        ],
    })
    out = refresh_redirects_batch(b)
    assert list(out.url) == ["http://h.example/a", "http://h.example/b",
                             "http://h.example/c"]
    assert list(out.delay_s) == [0, 5, 30]
    assert list(out.target_url) == ["http://h.example/new",
                                    "http://x.example/", None]


def test_date_mentions_known_values_and_sql_parity(ray_session):
    import duckdb
    import ray.data as rd

    from pdf_extract_ray.stages.pagemeta import (
        date_mentions_oracle_sql,
        extract_date_mentions,
    )

    docs = pd.DataFrame({
        "doc_id": np.arange(8, dtype="int64"),
        "text": [
            "released on 2014-05-02 and again on 2015-12-31",
            "March 3, 1995 was notable; so was july 14, 2001",
            "invalid 2014-13-40 and 2014-00-00 do not count",
            "bare years 1899 and 2100 are out, 1900 and 2099 are in",
            "year in a word like x1999y does not count",
            "",
            None,
            "the 2020-02-29 leap date and year 2020 again",
        ],
    })
    got = (extract_date_mentions(rd.from_pandas(docs).repartition(3))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["n_dates_iso"].tolist() == [2, 0, 0, 0, 0, 0, 0, 1]
    assert got["n_dates_textual"].tolist() == [0, 2, 0, 0, 0, 0, 0, 0]
    # row 0: years 2014, 2015; row 2: invalid dates still contain year
    # words 2014, 2014; row 3: only 1900/2099 count; row 4: embedded
    assert got["n_years"].tolist() == [2, 2, 2, 2, 0, 0, 0, 2]
    assert got["min_year"].tolist() == [2014, 1995, 2014, 1900, -1, -1,
                                        -1, 2020]
    assert got["max_year"].tolist() == [2015, 2001, 2014, 2099, -1, -1,
                                        -1, 2020]
    con = duckdb.connect()
    con.register("documents", docs)
    want = (con.sql(date_mentions_oracle_sql(
                "SELECT doc_id, text FROM documents")).df()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
