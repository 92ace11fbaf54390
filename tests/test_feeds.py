"""RSS/Atom feed parsing (stages/feeds.py)."""

import pandas as pd

from pdf_extract_ray.stages.feeds import extract_feed_entries, parse_feed

RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel>
  <title>Site feed</title>
  <item>
    <title>Hello &amp; goodbye</title>
    <link>http://ex.com/a?x=1&amp;y=2</link>
    <pubDate>Mon, 01 Apr 2024 09:30:00 GMT</pubDate>
  </item>
  <item><link>http://ex.com/b</link></item>
  <item><title>no link, skipped</title></item>
</channel></rss>"""

ATOM = """<feed xmlns="http://www.w3.org/2005/Atom">
  <title>Atom feed</title>
  <entry>
    <title>First</title>
    <link rel="alternate" href="http://ex.com/one"/>
    <updated>2024-05-03T12:00:00Z</updated>
  </entry>
  <entry><link href="http://ex.com/two"/></entry>
  <entry><id>no link, skipped</id></entry>
</feed>"""


def test_rss_items():
    got = parse_feed(RSS)
    assert got == [
        {"kind": "rss", "link": "http://ex.com/a?x=1&y=2",
         "title": "Hello & goodbye",
         "published": "Mon, 01 Apr 2024 09:30:00 GMT"},
        {"kind": "rss", "link": "http://ex.com/b", "title": None,
         "published": None},
    ]


def test_atom_entries():
    got = parse_feed(ATOM)
    assert [e["link"] for e in got] == ["http://ex.com/one",
                                       "http://ex.com/two"]
    assert got[0]["published"] == "2024-05-03T12:00:00Z"
    assert got[0]["title"] == "First"
    assert got[1]["title"] is None
    assert all(e["kind"] == "atom" for e in got)


def test_total_on_garbage():
    assert parse_feed(None) == []
    assert parse_feed("") == []
    assert parse_feed("<html><body>nope</body></html>") == []
    # truncated mid-item: entries parsed so far, no exception
    assert parse_feed("<rss><channel><item><link>http://x/1</link>"
                      "</item><item><link>http://x/2") == [
        {"kind": "rss", "link": "http://x/1", "title": None,
         "published": None}]


def test_extract_feed_entries_dataset(ray_session):
    import ray.data as rd

    df = pd.DataFrame({
        "feed_url": ["f1", "f2", "f3"],
        "feed_xml": [RSS, ATOM, "junk"],
    })
    got = (extract_feed_entries(rd.from_pandas(df).repartition(2))
           .to_pandas().sort_values(["source", "link"])
           .reset_index(drop=True))
    assert got["source"].tolist() == ["f1", "f1", "f2", "f2"]
    assert got["link"].tolist() == [
        "http://ex.com/a?x=1&y=2", "http://ex.com/b",
        "http://ex.com/one", "http://ex.com/two"]
