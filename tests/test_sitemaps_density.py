"""Sitemap parsing (stages/sitemaps.py) and text-density signals
(stages/pagemeta.py) — crawl discovery + structural quality cues."""

import numpy as np
import pandas as pd
import pytest

from pdf_extract_ray.stages.sitemaps import extract_sitemap_entries, parse_sitemap

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>http://a.example/p/1?a=1&amp;b=2</loc>
    <lastmod>2024-01-05</lastmod>
  </url>
  <url><loc>http://a.example/p/2</loc></url>
  <url><lastmod>2024-01-06</lastmod></url>
</urlset>"""

INDEX = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://a.example/sitemap-1.xml</loc>
    <lastmod>2024-02-01</lastmod></sitemap>
  <sitemap><loc>http://a.example/sitemap-2.xml</loc></sitemap>
</sitemapindex>"""


def test_urlset_parse():
    got = parse_sitemap(URLSET)
    assert got == [
        {"kind": "url", "loc": "http://a.example/p/1?a=1&b=2",
         "lastmod": "2024-01-05"},
        {"kind": "url", "loc": "http://a.example/p/2", "lastmod": None},
    ]  # the loc-less block is skipped; &amp; unescaped


def test_sitemapindex_parse():
    got = parse_sitemap(INDEX)
    assert [e["loc"] for e in got] == ["http://a.example/sitemap-1.xml",
                                       "http://a.example/sitemap-2.xml"]
    assert all(e["kind"] == "sitemap" for e in got)


def test_garbage_and_edges_are_total():
    assert parse_sitemap(None) == []
    assert parse_sitemap("") == []
    assert parse_sitemap("<html><body>not a sitemap</body></html>") == []
    assert parse_sitemap("<urlset><url><loc>http://x/") == []  # torn tail
    # case-insensitive tags, whitespace inside loc trimmed
    got = parse_sitemap("<URLSET><URL><LOC>  http://a/x </LOC></URL></URLSET>")
    assert got == [{"kind": "url", "loc": "http://a/x", "lastmod": None}]


def test_entity_unescape_order():
    got = parse_sitemap(
        "<urlset><url><loc>http://a/?q=&amp;lt;</loc></url></urlset>")
    assert got[0]["loc"] == "http://a/?q=&lt;"  # &amp; last, per spec


def test_extract_entries_dataset(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({
        "sitemap_url": ["http://a.example/sitemap.xml",
                        "http://b.example/sitemap.xml",
                        "http://c.example/sitemap.xml"],
        "sitemap_xml": [URLSET, INDEX, "garbage"],
    })).repartition(2)
    got = extract_sitemap_entries(ds).to_pandas() \
        .sort_values(["source", "loc"]).reset_index(drop=True)
    assert len(got) == 4
    assert list(got["kind"]) == ["url", "url", "sitemap", "sitemap"]
    assert got["lastmod"].iloc[0] == "2024-01-05"
    assert got["lastmod"].isna().sum() == 2


# ---------------------------------------------------------------------------
# text density
# ---------------------------------------------------------------------------

def test_density_rules():
    from pdf_extract_ray.stages.pagemeta import text_density_batch

    b = pd.DataFrame({"html": [
        "<html><body><p>hello world</p><a href=x>nav  link</a></body></html>",
        "plain text only",
        "",
        None,
        "<A HREF=y>Upper</A>",          # case-insensitive anchor
        "<a>multi\nline</a>",           # (?s) inner newline
        "<a><b>nested  tags</b></a>",   # tags stripped inside anchors
    ]})
    out = text_density_batch(b)
    assert list(out["tag_count"]) == [8, 0, 0, 0, 2, 2, 4]
    assert out["text_len"].iloc[1] == 15 and out["text_density"].iloc[1] == 1.0
    assert out["link_text_len"].iloc[0] == len("nav link")
    assert out["link_text_len"].iloc[5] == len("multi line")
    assert out["link_text_len"].iloc[6] == len("nested tags")
    assert out["link_density"].iloc[4] == 1.0   # anchor-only page
    assert (out.loc[2:3, ["html_len", "text_len", "link_text_len"]] == 0) \
        .all().all()


def test_density_matches_duckdb_oracle(ray_session):
    """The SQL mirror must agree bit-for-bit on varied ASCII html."""
    import duckdb
    import numpy as np
    import ray.data as rd

    from pdf_extract_ray.stages.pagemeta import (
        extract_text_density,
        text_density_oracle_sql,
    )

    htmls = [
        "<html><body><h1>T</h1><p>some body</p><a href=/x>go</a></body></html>",
        "<div><a href='a'>one</a><a href='b'>two  words</a></div>",
        "no markup at all",
        "<p>unclosed anchor <a href=x>tail",
        "<a>A</a><a>B</a><a>C</a>",
        "",
    ]
    df = pd.DataFrame({"i": range(len(htmls)), "html": htmls})
    got = extract_text_density(rd.from_pandas(df)).to_pandas() \
        .sort_values("i").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", df)
    exp = con.sql(text_density_oracle_sql("SELECT * FROM t")).df() \
        .sort_values("i").reset_index(drop=True)
    for c in ("html_len", "tag_count", "text_len", "link_text_len",
              "text_density", "link_density"):
        assert np.allclose(got[c].to_numpy(np.float64),
                           exp[c].to_numpy(np.float64)), c


class TestStalePages:
    def test_staleness_rules(self, ray_session):
        import ray.data as rd

        from pdf_extract_ray.stages.sitemaps import stale_pages

        pages = pd.DataFrame({
            "url": ["a", "b", "c", "d"],
            "warc_ts": pd.to_datetime([
                "2024-01-10", "2024-06-01", "2024-03-01", "2024-01-01"]),
        })
        entries = pd.DataFrame({
            "loc": ["a", "a", "b", "c", "nope"],
            # a: two claims, max 2024-02-01 -> stale; b: older claim ->
            # fresh; c: unparseable claim -> NULL -> False; nope: no page
            "lastmod": ["2024-02-01", "2024-01-05", "2024-05-31",
                        "last week", "2024-01-01"],
        })
        got = (stale_pages(rd.from_pandas(pages).repartition(2),
                           rd.from_pandas(entries).repartition(2))
               .to_pandas().sort_values("url").reset_index(drop=True))
        assert got["url"].tolist() == ["a", "b", "c"]
        assert got["is_stale"].tolist() == [True, False, False]
        assert pd.isna(got.loc[2, "lastmod_ts"])
        assert got.loc[0, "lastmod_ts"] == pd.Timestamp("2024-02-01")

    def test_sql_parity_with_datetime_forms(self, ray_session):
        import duckdb
        import ray.data as rd

        from pdf_extract_ray.stages.sitemaps import (
            stale_pages,
            stale_pages_oracle_sql,
        )

        rng = np.random.RandomState(11)
        n = 300
        pages = pd.DataFrame({
            "url": "u" + pd.Series(np.arange(n) % 120).astype(str),
            "warc_ts": pd.Timestamp("2024-03-01")
            + pd.to_timedelta(rng.randint(0, 120, n), unit="D"),
        })
        forms = np.array(["2024-03-15", "2024-03-15T06:30:00",
                          "2024-03-15 06:30:00", "soon", ""])
        entries = pd.DataFrame({
            "loc": "u" + pd.Series(rng.randint(0, 150, n)).astype(str),
            "lastmod": forms[rng.randint(0, len(forms), n)],
        })
        got = (stale_pages(rd.from_pandas(pages).repartition(3),
                           rd.from_pandas(entries).repartition(3))
               .to_pandas().sort_values(["url", "warc_ts"])
               .reset_index(drop=True))
        con = duckdb.connect()
        con.register("pg", pages)
        con.register("en", entries)
        want = (con.execute(stale_pages_oracle_sql(
                    "SELECT * FROM pg", "SELECT * FROM en"))
                .df().sort_values(["url", "warc_ts"])
                .reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
