"""Fuzz never-raise tests for the DOM-side extractors that parse
untrusted crawl bytes (links/anchors, tables, page metadata, robots
directives): at 100 TB one hostile page cannot kill a job, and every
extractor must keep its output schema regardless of input."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_extract_ray.stages.links import (anchor_host_rollup,  # noqa: F401
                                          extract_anchors_batch,
                                          extract_links_batch)
from pdf_extract_ray.stages.pagemeta import ldjson_batch, page_metadata_batch
from pdf_extract_ray.stages.robots import robots_directives_batch
from pdf_extract_ray.stages.tables import extract_tables_batch

# markup-ish soup: plain unicode text salted with tag/attr fragments so
# the regex paths actually fire (pure random text rarely contains '<a')
_FRAGS = st.sampled_from([
    "<a href=", "<a href='", '<a href="', "</a>", "<table>", "</table>",
    "<tr>", "<td>", "<th ", "<meta name=robots content=", "<meta ",
    '<script type="application/ld+json">', "</script>", '{"@type":',
    '<meta http-equiv=refresh content="0; url=', "http-equiv='refresh'",
    '<link rel="alternate" hreflang=', "hreflang='",
    "<title>", "</title>", "<link rel=", "javascript:", "&amp;", "&#x27;",
    "http://", "https://", "//", "#", "'", '"', ">", "<", "=", " ", "\x00",
])
_SOUP = st.lists(
    st.one_of(_FRAGS, st.text(max_size=12)), min_size=0, max_size=30,
).map("".join)
_HTML = st.one_of(
    st.none(),
    _SOUP,
    _SOUP.map(lambda s: s.encode("utf-8", "surrogatepass")),
    st.binary(max_size=256),
)


def _batch(html):
    return pd.DataFrame({"url": ["http://h.example/a/b"], "html": [html]})


@settings(max_examples=150, deadline=None)
@given(_HTML)
def test_extractors_never_raise_and_keep_schema(html):
    b = _batch(html)
    links = extract_links_batch(b.copy())
    assert list(links.columns) == ["src_url", "dst_url"]
    anchors = extract_anchors_batch(b.copy())
    assert list(anchors.columns) == ["src_url", "dst_url", "anchor"]
    tables = extract_tables_batch(b.copy())
    assert list(tables.columns) == ["url", "table_no", "row_no", "col_no",
                                    "cell", "is_header"]
    meta = page_metadata_batch(b.copy())
    assert list(meta.columns) == ["url", "title", "description",
                                  "canonical", "og_title"]
    robots = robots_directives_batch(b.copy())
    assert list(robots.columns) == ["url", "noindex", "nofollow"]
    from pdf_extract_ray.stages.links import extract_hreflang_batch
    hl = extract_hreflang_batch(b.copy())
    assert list(hl.columns) == ["src_url", "hreflang", "alt_url"]
    ld = ldjson_batch(b.copy())
    assert list(ld.columns) == ["url", "blob_no", "raw_json", "ld_type"]
    from pdf_extract_ray.stages.pagemeta import refresh_redirects_batch
    rr = refresh_redirects_batch(b.copy())
    assert list(rr.columns) == ["url", "delay_s", "target_url"]
    assert len(meta) == len(robots) == 1  # per-page outputs keep rows
