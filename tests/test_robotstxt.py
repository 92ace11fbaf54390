"""robots.txt (RFC 9309 subset): parse + most-specific-match decisions
(functions/robotstxt.py) and the host-cogrouped verdict/filter stages
(stages/robots.py)."""

import pandas as pd
import pytest

from pdf_extract_ray.functions.robotstxt import (
    parse_robots_txt,
    robots_allowed,
    url_path,
)

SIMPLE = """
User-agent: *
Disallow: /private/
Allow: /private/ok/
Disallow: /*.pdf$
"""


def dec(text, path, agent="*"):
    return robots_allowed(parse_robots_txt(text, agent), path)


def test_prefix_disallow_and_longer_allow_override():
    assert dec(SIMPLE, "/public/x")
    assert not dec(SIMPLE, "/private/x")
    assert dec(SIMPLE, "/private/ok/x")   # longer Allow wins (more octets)


def test_wildcard_and_anchor():
    assert not dec(SIMPLE, "/a/b.pdf")
    assert dec(SIMPLE, "/a/b.pdfx")       # $ anchors the end
    assert not dec("User-agent: *\nDisallow: /a/*/c", "/a/b/c")
    assert dec("User-agent: *\nDisallow: /a/*/c", "/a/b/d")


def test_agent_group_selection():
    t = ("User-agent: googlebot\nDisallow: /\n\n"
         "User-agent: *\nDisallow: /tmp/")
    assert not dec(t, "/anything", agent="googlebot")
    assert not dec(t, "/anything", agent="GoogleBot")  # case-insensitive
    assert dec(t, "/x") and not dec(t, "/tmp/x")


def test_stacked_user_agent_lines_share_a_block():
    t = ("User-agent: a\nUser-agent: b\nDisallow: /x/\n\n"
         "User-agent: *\nDisallow:\n")
    assert not dec(t, "/x/1", agent="a")
    assert not dec(t, "/x/1", agent="b")
    assert dec(t, "/x/1")                 # '*' group: empty Disallow


def test_tie_goes_to_allow():
    t = "User-agent: *\nDisallow: /a/b\nAllow: /a/c"
    # equal-length non-overlapping rules, sanity
    assert not dec(t, "/a/b") and dec(t, "/a/c")
    t2 = "User-agent: *\nDisallow: /p\nAllow: /p"
    assert dec(t2, "/p/x")                # exact-octet tie -> Allow


def test_garbage_and_edge_inputs_are_total():
    assert dec(None, "/x")
    assert dec("", "/x")
    assert dec("random noise\nno colons here", "/x")
    assert dec("Disallow: /x/", "/x/1")   # rule before any agent: ignored
    assert dec("User-agent: *\nCrawl-delay: 5\nSitemap: http://s", "/x")


def test_no_match_means_allowed():
    assert dec("User-agent: *\nDisallow: /only/", "/other/")


def test_url_path_extraction():
    assert url_path("http://a.example/p/1?x=1#f") == "/p/1?x=1#f"
    assert url_path("https://a.example") == "/"
    assert url_path("/bare/path") == "/bare/path"
    assert url_path("not a url") == "/"


def test_verdicts_cogroup_and_filter(ray_session):
    import ray.data as rd

    from pdf_extract_ray.stages.robots import (
        filter_by_robots_txt,
        robots_txt_verdicts,
    )

    pages = rd.from_pandas(pd.DataFrame({
        "url": ["http://A.example/private/1",     # host case-folds
                "http://a.example/private/ok/2",
                "http://a.example/p/3",
                "http://b.example/anything",      # no robots.txt -> allowed
                "http://c.example/x.pdf"],
        "body": [f"b{i}" for i in range(5)],
    })).repartition(3)
    robots = rd.from_items([
        {"host": "a.example", "robots_txt": SIMPLE},
        {"host": "c.example",
         "robots_txt": "User-agent: *\nDisallow: /*.pdf$"},
    ])
    v = robots_txt_verdicts(pages, robots).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    got = dict(zip(v["url"], v["allowed"]))
    assert got == {
        "http://A.example/private/1": False,
        "http://a.example/private/ok/2": True,
        "http://a.example/p/3": True,
        "http://b.example/anything": True,
        "http://c.example/x.pdf": False,
    }

    kept = filter_by_robots_txt(pages, robots).to_pandas()
    assert sorted(kept["url"]) == ["http://a.example/p/3",
                                   "http://a.example/private/ok/2",
                                   "http://b.example/anything"]
    assert set(kept.columns) == {"url", "body"}  # bodies survive intact


def test_sitemap_lines_extracted_anywhere():
    from pdf_extract_ray.functions.robotstxt import sitemap_urls

    t = ("Sitemap: http://a.example/sitemap.xml\n"
         "User-agent: *\nDisallow: /x/\n"
         "sitemap: http://a.example/s2.xml  # comment\n"
         "Sitemap:\n")  # empty value skipped
    assert sitemap_urls(t) == ["http://a.example/sitemap.xml",
                               "http://a.example/s2.xml"]
    assert sitemap_urls(None) == [] and sitemap_urls("no colons") == []
