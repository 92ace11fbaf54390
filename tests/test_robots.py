"""Robots-meta directives (stages/robots.py): parse rules, restrictive
union, quoting forms, the indexability filter, and the nofollow-aware
link graph (the `robots_indexable` driver query adds the SQL-oracle
check)."""

import pandas as pd

from pdf_extract_ray.stages.robots import (filter_indexable,
                                           robots_directives,
                                           robots_directives_batch)


def test_directive_parsing():
    assert robots_directives('<meta name="robots" content="noindex">') == (True, False)
    assert robots_directives("<meta name='robots' content='nofollow'>") == (False, True)
    assert robots_directives('<meta name=robots content=none>') == (True, True)
    assert robots_directives(
        '<meta content="NOINDEX, NoFollow" name="ROBOTS">') == (True, True)
    assert robots_directives(
        '<meta name="robots" content="index, follow">') == (False, False)
    assert robots_directives('<meta name="viewport" content="noindex">') == (False, False)
    assert robots_directives("no meta at all") == (False, False)
    # restrictive union across multiple tags
    assert robots_directives(
        '<meta name="robots" content="index">'
        '<meta name="robots" content="noindex">') == (True, False)
    # token trimming around commas
    assert robots_directives(
        '<meta name="robots" content=" noindex , nofollow ">') == (True, True)


def test_batch_and_bytes_and_null():
    b = pd.DataFrame({
        "url": ["u1", "u2", "u3"],
        "html": ['<meta name="robots" content="noindex">'.encode(),
                 None, "<p>ok</p>"],
    })
    out = robots_directives_batch(b)
    assert list(out.noindex) == [True, False, False]
    assert list(out.nofollow) == [False, False, False]


def test_filter_and_nofollow_graph(ray_session):
    import ray.data as rd

    from pdf_extract_ray.stages.robots import host_link_edges_respecting_robots

    pages = pd.DataFrame({
        "url": ["http://a.example/1", "http://a.example/2",
                "http://a.example/3"],
        "html": ['<meta name="robots" content="noindex,nofollow">'
                 '<a href="http://b.example/x">t</a>',
                 '<a href="http://b.example/y">t</a>',
                 '<meta name="robots" content="noindex">'
                 '<a href="http://b.example/z">t</a>'],
    })
    ds = rd.from_pandas(pages)
    kept = filter_indexable(ds).to_pandas()
    assert list(kept.url) == ["http://a.example/2"]
    edges = (host_link_edges_respecting_robots(ds).to_pandas()
             .sort_values("src_host").reset_index(drop=True))
    # page 1 is nofollow (no edges); page 3 is noindex but follow (edges kept)
    assert int(edges["n_links"].sum()) == 2
