"""Page-metadata extraction (stages/pagemeta.py): first-wins rules,
cleaning, canonical resolution, missing fields (the `page_metadata`
driver query adds the independent SQL-oracle check)."""

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
